package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Abc

/** Property-based invariants for the ABC classifier (SURVEY §5.3),
  * run with plain ScalaCheck under ScalaTest.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val factGen: Gen[List[(String, Double)]] =
    Gen.nonEmptyListOf(for {
      c <- Gen.choose(1, 12).map(i => s"c$i")
      v <- Gen.oneOf(Gen.choose(0.0, 10000.0), Gen.const(0.0))
    } yield (c, v))

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("ABC invariants hold for arbitrary fact lines") {
    run(Prop.forAll(factGen) { rows =>
      val fact = rows.toDF("cliente", "valor_orcado")
        .selectExpr("cliente", "cliente AS nome_cliente",
          "'X' AS uf", "'Y' AS cidade", "valor_orcado")
      val out = Abc.classify(fact)
        .select("cliente", "valor_total_orcado", "percentual",
          "percentual_acumulado", "abc", "ranking")
        .as[(String, Double, Double, Double, String, Int)].collect().toSeq

      val inClients = rows.map(_._1).toSet
      val total = rows.map(_._2).sum
      val eps = 1e-6

      val oneRowPerClient = out.map(_._1).toSet == inClients &&
        out.size == inClients.size
      val validClasses = out.forall(r => Set("A", "B", "C").contains(r._5))
      val pctSums = total == 0.0 || math.abs(out.map(_._3).sum - 100.0) < eps
      // cumulative percent is monotone in the window's own order
      val ordered = out.sortBy(r => (-r._2, r._1))
      val cumMonotone = ordered.zip(ordered.drop(1)).forall {
        case (a, b) => a._4 <= b._4 + eps
      }
      val boundaries = total == 0.0 || out.forall { r =>
        r._5 == (if (r._4 <= 80.0) "A" else if (r._4 <= 95.0) "B" else "C")
      }
      val zeroAllC = total != 0.0 || out.forall(_._5 == "C")
      // min-method rank: 1 + number of clients with strictly larger value
      val rankOk = out.forall { r =>
        r._6 == 1 + out.count(o => o._2 > r._2)
      }
      oneRowPerClient && validClasses && pctSums && cumMonotone &&
        boundaries && zeroAllC && rankOk
    })
  }

  test("union tagging preserves per-file filtered counts (AP:46-49)") {
    run(Prop.forAll(Gen.listOfN(3, Gen.listOf(Gen.oneOf("PENDENTE", "GANHO", "PERDIDO")))) {
      weeks =>
        val tagged = weeks.zipWithIndex.map { case (statuses, i) =>
          s"Semana $i" -> statuses.toDF("status_processo")
            .filter(org.apache.spark.sql.functions.col("status_processo") === "PENDENTE")
        }
        val expected = weeks.map(_.count(_ == "PENDENTE")).sum
        if (tagged.isEmpty) expected == 0
        else operators.Pendentes.unionSemanas(tagged).count() == expected
    })
  }

  // Dense key/time domains so collisions, exact-timestamp ties, and
  // boundary hits occur constantly across the 25 generated datasets.
  private val asofCaseGen = for {
    lefts <- Gen.listOf(for {
      k <- Gen.choose(1L, 4L); ts <- Gen.choose(0L, 30L)
    } yield (k, ts))
    rights <- Gen.listOf(for {
      k <- Gen.choose(1L, 4L); ts <- Gen.choose(0L, 30L)
    } yield (k, ts))
  } yield (lefts, rights.distinct) // right unique per (key, ts): the operator's precondition

  test("asofJoin matches the naive latest-at-or-before reference on random data") {
    run(Prop.forAll(asofCaseGen) { case (lefts, rights) =>
      val rightRows = rights.map { case (k, rts) => (k, rts, s"v${k}_$rts") }
      val expected = lefts.map { case (k, ts) =>
        val matches = rightRows.filter(r => r._1 == k && r._2 <= ts)
        (k, ts, if (matches.isEmpty) None else Some(matches.maxBy(_._2)._3))
      }.sorted
      val got =
        if (lefts.isEmpty) Seq.empty
        else graft.operators.Asof.asofJoin(
            lefts.toDF("k", "ts"), rightRows.toDF("k", "rts", "rv"),
            Seq("k"), "ts", "rts", Seq("rv"))
          .select("k", "ts", "rv").as[(Long, Long, Option[String])].collect().toSeq.sorted
      got == expected
    })
  }

  private val rangeCaseGen = for {
    pts <- Gen.listOf(Gen.choose(0L, 40L))
    ivs <- Gen.listOf(for {
      lo <- Gen.choose(0L, 40L); span <- Gen.choose(0L, 12L)
    } yield (lo, lo + span))
    w <- Gen.choose(1L, 7L) // bucket width varies vs interval width
  } yield (pts, ivs, w)

  test("pointInInterval matches the naive all-pairs reference for any bucket width") {
    run(Prop.forAll(rangeCaseGen) { case (pts, ivs, w) =>
      val ptRows = pts.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      val ivRows = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      val expected = (for {
        (pid, ts) <- ptRows; (iid, lo, hi) <- ivRows
        if lo <= ts && ts <= hi
      } yield (pid, iid)).toSet
      val gotSeq =
        if (ptRows.isEmpty || ivRows.isEmpty) Seq.empty
        else graft.operators.RangeJoin.pointInInterval(
            ptRows.toDF("pid", "ts"), "ts", ivRows.toDF("iid", "lo", "hi"), "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect().toSeq
      // pid/iid are unique, so the pair set is the full answer — and
      // bucketization must produce each pair exactly ONCE (a point has
      // one bucket), so duplicates are a bug, not a formatting detail.
      gotSeq.toSet == expected && gotSeq.size == gotSeq.distinct.size
    })
  }
}

/** Property invariants for the round-10 additions: the funnel fold vs
  * an independent min-cascade reference, the bloom prefilter vs the
  * plain anti-join, and the Column dHash vs a bit-for-bit JVM
  * reference.
  */
class Round10PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  private val eventsGen: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(1L, 30L)
      k <- Gen.oneOf("view", "click", "purchase", "other")
    } yield (u, t, k))

  test("funnel fold equals the min-cascade reference on arbitrary event sets") {
    val steps = Seq("view", "click", "purchase")
    run(Prop.forAll(eventsGen) { rows =>
      val df = rows.toDF("user_id", "ts_us", "event_type")
      val got = graft.operators.Funnel.stageTimes(df, steps)
        .select($"user_id", $"stage",
          transform($"step_us", c => coalesce(c, lit(-1L))))
        .as[(Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      // Independent reference: conditional minimums, not a fold.
      val want = rows.groupBy(_._1).map { case (u, es) =>
        def minAfter(tp: String, after: Long): Long = {
          val c = es.collect { case (_, t, k) if k == tp && t > after => t }
          if (c.isEmpty) -1L else c.min
        }
        val v = minAfter("view", Long.MinValue)
        val cl = if (v == -1L) -1L else minAfter("click", v)
        val p = if (cl == -1L) -1L else minAfter("purchase", cl)
        val stage = Seq(v, cl, p).takeWhile(_ != -1L).length.toLong
        u -> ((stage, Seq(v, cl, p)))
      }
      got == want
    })
  }

  private val corpusGen: Gen[(List[String], List[String])] = for {
    corpus <- Gen.listOf(Gen.choose(0, 40).map(i => s"doc $i"))
    batch <- Gen.nonEmptyListOf(Gen.choose(20, 60).map(i => s"doc $i"))
  } yield (corpus, batch)

  test("bloom prefilter result always equals the plain anti-join") {
    run(Prop.forAll(corpusGen) { case (corpus, batch) =>
      val c = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val b = batch.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select($"doc_id").as[Long].collect().toSet
      ids(graft.operators.Dedup.newAgainstCorpusBloom(c, b, "doc_id", "text", 64L)) ==
        ids(graft.operators.Dedup.newAgainstCorpus(c, b, "doc_id", "text"))
    })
  }

  private val upsertGen: Gen[List[(Long, Int, String)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 8L)
      ver <- Gen.choose(0, 1000000)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (k, ver, v)).map { rows =>
      // distinct (key, version) — ties between same-key same-version
      // rows across batches are resolved by batch PRIORITY, which a
      // batched union cannot see; the associativity contract assumes
      // versions advance (the ingest reality).
      rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList
    }

  test("upsertMerge is associative: folding batches equals merging their union") {
    run(Prop.forAll(upsertGen, upsertGen, upsertGen) { (b0, b1raw, b2raw) =>
      // The contract requires versions to ADVANCE across update
      // batches (distinct (k, version) corpus-wide): a same-version
      // row in two different batches is ordered by arrival in the
      // sequential fold but unordered in the union, so the property
      // holds exactly on the ingest-reality precondition.
      val b1 = b1raw
      val seen = b1.map(r => (r._1, r._2)).toSet
      val b2 = b2raw.filterNot(r => seen.contains((r._1, r._2)))
      def df(rows: List[(Long, Int, String)]) =
        rows.toDF("k", "version", "v")
      def snap(d: org.apache.spark.sql.DataFrame) =
        d.select($"k", $"version", $"v").as[(Long, Int, String)].collect().toSet
      val m = graft.operators.Pendentes.upsertMerge _
      val sequential = m(m(df(b0), df(b1), Seq("k"), "version"), df(b2), Seq("k"), "version")
      val batched = m(df(b0), df(b1).unionByName(df(b2)), Seq("k"), "version")
      b2.isEmpty || snap(sequential) == snap(batched)
    })
  }

  private val vecGen: Gen[List[Double]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(-1e6, 1e6).map(x => x / 1e3)))

  test("dotFast (codegen) equals the interpreted HOF dot bit-for-bit") {
    run(Prop.forAll(Gen.listOfN(8, Gen.zip(vecGen, vecGen))) { pairs =>
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("i", "a", "b")
      val rows = df.select($"i",
          graft.functions.VectorFunctions.dot($"a", $"b").as("slow"),
          graft.functions.VectorFunctions.dotFast($"a", $"b").as("fast"))
        .as[(Long, Option[Double], Option[Double])].collect()
      rows.forall { case (_, s2, f) =>
        (s2, f) match {
          case (Some(x), Some(y)) =>
            java.lang.Double.doubleToRawLongBits(x) ==
              java.lang.Double.doubleToRawLongBits(y)
          case (a2, b2) => a2 == b2
        }
      }
    })
  }

  test("cosineFastD (codegen'd-dot cosine) equals interpreted cosine bit-for-bit") {
    // Includes zero vectors (the when-guard path) and equal-length
    // pairs only when the generator happens to align — both cosines
    // must agree on EVERY input, ragged or not.
    run(Prop.forAll(Gen.listOfN(8, Gen.zip(vecGen, vecGen))) { pairs =>
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("i", "a", "b")
      val rows = df.select($"i",
          graft.functions.VectorFunctions.cosine($"a", $"b").as("slow"),
          graft.functions.VectorFunctions.cosineFastD($"a", $"b").as("fast"))
        .as[(Long, Option[Double], Option[Double])].collect()
      rows.forall { case (_, s2, f) =>
        (s2, f) match {
          case (Some(x), Some(y)) =>
            java.lang.Double.doubleToRawLongBits(x) ==
              java.lang.Double.doubleToRawLongBits(y)
          case (a2, b2) => a2 == b2
        }
      }
    })
  }

  private val payloadGen: Gen[Array[Byte]] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
      .map(_.toArray)

  test("Column dHash equals the JVM reference bit-for-bit, any payload length") {
    def ref(p: Array[Byte]): Long = {
      def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
      var h = 0L
      for (r <- 0 until 8; c <- 0 until 7) {
        val a = at(8 * r + c); val b = at(8 * r + c + 1)
        // Column semantics: a null (out-of-range) side makes the
        // comparison null -> bit 0.
        if (a >= 0 && b >= 0 && b > a) h |= 1L << (r * 7 + c)
      }
      h
    }
    run(Prop.forAll(Gen.listOfN(6, payloadGen)) { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
      val got = df.select($"id", graft.operators.Multimodal.dHash($"p"))
        .as[(Long, Long)].collect().toMap
      ps.zipWithIndex.forall { case (p, i) => got(i.toLong) == ref(p) }
    })
  }

  // ---- round-12 BPE + sampling invariants ----

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
  private val bpeCorpusGen: Gen[List[String]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, wordGen))

  test("BPE merge replay == training segmentation on fuzzed corpora (the induction, fuzzed)") {
    // BpeSpec pins the claim on hand corpora; this fuzzes it: for any
    // small 3-letter-alphabet corpus, replaying the trained merge
    // table over each word's char split must reproduce the training
    // fold's final word map exactly — including the adversarial
    // equal-symbol runs the generator produces constantly (aaa, abab).
    run(Prop.forAll(bpeCorpusGen, Gen.choose(1, 4)) { (words, merges) =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      try {
        val (mergeTable, wordMap) = graft.operators.Bpe.train(docs, "text", merges)
        val replayed = wordMap.select($"w")
          .crossJoin(org.apache.spark.sql.functions.broadcast(
            graft.operators.Bpe.mergesArray(mergeTable)))
          .select($"w", graft.operators.Bpe.applyMerges($"w", $"__merges").as("syms"))
          .as[(String, Seq[String])].collect().toMap
        val trained = wordMap.select($"w", $"syms")
          .as[(String, Seq[String])].collect().toMap
        replayed == trained
      } catch {
        // tiny corpora can exhaust the pair vocabulary before `merges`
        // rounds — train fails LOUDLY by contract; not a counterexample
        case e: IllegalArgumentException
          if e.getMessage.contains("pair vocabulary exhausted") => true
      }
    })
  }

  test("encodeIds and encodeCounts agree: ids-per-doc == n_bpe_tokens (two outputs, one truth)") {
    run(Prop.forAll(bpeCorpusGen) { words =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      try {
        val (mergeTable, wordMap) = graft.operators.Bpe.train(docs, "text", merges = 2)
        val vocab = graft.operators.Bpe.vocab(wordMap)
        val counts = graft.operators.Bpe.encodeCounts(docs, "doc_id", "text", mergeTable)
          .select($"doc_id", $"n_bpe_tokens").as[(Long, Long)].collect().toMap
        val ids = graft.operators.Bpe.encodeIds(docs, "doc_id", "text", mergeTable, vocab)
          .as[(Long, Long, String)].collect()
        ids.forall { case (id, n, seq) =>
          n == counts(id) &&
            (if (n == 0) seq.isEmpty
             else seq.split(',').length.toLong == n && !seq.split(',').contains("0"))
          // no UNK: train and encode share the corpus here
        }
      } catch {
        case e: IllegalArgumentException
          if e.getMessage.contains("pair vocabulary exhausted") => true
      }
    })
  }

  test("weightedSample is partitioning-invariant and exactly k (distributed-correctness pin)") {
    // The Efraimidis-Spirakis race must select the SAME rows however
    // the data is physically split — the md5-derived key makes the
    // lottery a pure function of the row, and TakeOrdered merges
    // per-partition heaps deterministically. A partitioning-dependent
    // sampler would be a silent distributed-correctness bug.
    val rowsGen = Gen.choose(12, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 1000000L)))
    run(Prop.forAll(rowsGen) { ws =>
      val base = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      def pick(parts: Int): Set[Long] = {
        val df = base.toDF("id", "w").repartition(parts)
        graft.operators.Sampling.weightedSample(df, "id", $"w", k = 7)
          .select($"id").as[Long].collect().toSet
      }
      val a = pick(1)
      val b = pick(5)
      a == b && a.size == math.min(7, base.size)
    })
  }

  // Scala reference for the depth-2 deletion neighborhood: {self} ∪
  // single deletions ∪ deletions of two distinct positions (equal, as
  // a SET, to single-deletions-of-single-deletions).
  private def delVariants2Ref(s: String): Set[String] = {
    val d1 = (0 until s.length).map(i => s.take(i) + s.drop(i + 1)).toSet
    val d2 = for { t <- d1; i <- 0 until t.length } yield t.take(i) + t.drop(i + 1)
    d1 ++ d2 + s
  }

  private val editedPairGen: Gen[(String, String)] = for {
    n <- Gen.choose(0, 8)
    base <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    nEdits <- Gen.choose(0, 2)
    edits <- Gen.listOfN(nEdits, Gen.zip(
      Gen.oneOf("sub", "ins", "del"), Gen.choose(0, 99), Gen.oneOf('a', 'b', 'c')))
  } yield {
    val mutated = edits.foldLeft(base) { case (s, (op, posRaw, ch)) =>
      op match {
        case "ins" => val p = posRaw % (s.length + 1); s.take(p) + ch + s.drop(p)
        case _ if s.isEmpty => s
        case "sub" => val p = posRaw % s.length; s.updated(p, ch)
        case "del" => val p = posRaw % s.length; s.take(p) + s.drop(p + 1)
      }
    }
    (base, mutated)
  }

  test("ivfAssign exactDouble path agrees with the float path on float-exact centroids") {
    // The round-13 exactDouble flag exists ONLY for trained centroids
    // whose 6-dp decimal means exceed float32 precision; on centroids
    // that ARE float-representable (every seed-centroid query) the two
    // paths must assign identically — this pins them against drifting
    // apart. Vectors are small integers (float-exact by construction).
    val vecGen = Gen.listOfN(8, Gen.choose(-50, 50).map(_.toFloat))
    val dataGen = for {
      n <- Gen.choose(6, 20)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    run(Prop.forAll(dataGen) { rows =>
      val df = rows.toDF("vec_id", "embedding")
      val cents = df.filter($"vec_id" < 4)
        .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
      def assign(exact: Boolean) =
        graft.operators.Similarity.ivfAssign(df, cents, "vec_id", "embedding", exact)
          .select($"id", $"cell").as[(Long, Long)].collect().toMap
      assign(false) == assign(true)
    })
  }

  test("fuzzy ed2 candidate completeness: <=2 edits always share a depth-2 deletion key") {
    // The claim j_fuzzy_names_ed2 stands on ([[Fuzzy.deletionVariants2]]
    // scaladoc's alignment argument), fuzzed: apply up to 2 arbitrary
    // edits (sub/ins/del at arbitrary positions, 3-letter alphabet to
    // force collisions and equal-character runs) — lev(a, b) <= 2 by
    // the metric property, so the depth-2 deletion sets MUST intersect
    // or the equi-join on variant keys would silently lose the pair.
    run(Prop.forAll(editedPairGen) { case (a, b) =>
      delVariants2Ref(a).intersect(delVariants2Ref(b)).nonEmpty
    })
  }

  test("lshTuningCurve: halving rows nests the candidate sets — n_cand/n_hit monotone (the S-curve invariant)") {
    // For ONE fixed signature, a pair sharing band j of an (b, r)
    // split shares signature entries jr..jr+r−1, hence both halves of
    // that band — i.e. bands 2j and 2j+1 of the (2b, r/2) split. So
    // candidate sets are NESTED down the curve (modulo the hot-bucket
    // cap, which this fixture never triggers), and n_cand, n_hit, and
    // recall must be non-decreasing in the band count while n_truth
    // stays constant. A band-slicing bug (off-by-one in the slice
    // bounds, wrong key hash) breaks the nesting immediately.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0 until 30).flatMap { i =>
      val base = Vector.fill(15)(vocab(rnd.nextInt(vocab.size)))
      val mutated = base.updated(rnd.nextInt(15), vocab(rnd.nextInt(vocab.size)))
      Seq((2L * i, base.mkString(" ")), (2L * i + 1, mutated.mkString(" ")))
    }.toDF("doc_id", "text")
    val rows = graft.operators.Dedup.lshTuningCurve(
        docs, "doc_id", "text", shingleK = 3, numHashes = 16, threshold = 0.3,
        configs = Seq((2, 8), (4, 4), (8, 2), (16, 1)))
      .orderBy($"bands")
      .as[(Int, Int, Long, Long, Long, Double, Option[Double])].collect()
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8, 16))
    assert(rows.map(_._4).distinct.size == 1, s"n_truth must be constant: ${rows.toSeq}")
    assert(rows.forall(r => r._5 <= r._3 && r._5 <= r._4),
      s"n_hit bounded by n_cand and n_truth: ${rows.toSeq}")
    val cands = rows.map(_._3).toSeq
    val hits = rows.map(_._5).toSeq
    assert(cands == cands.sorted, s"n_cand must be monotone in bands: $cands")
    assert(hits == hits.sorted, s"n_hit must be monotone in bands: $hits")
    // The fixture's near-dup pairs are real: something is found.
    assert(rows.last._5 > 0, s"the 16x1 split must catch the planted near-dups: ${rows.toSeq}")
  }

  test("prefixFilterPairs equals the brute-force jaccard join at every threshold") {
    // The pigeonhole completeness argument in the scaladoc,
    // machine-checked: for arbitrary small corpora and several
    // rational thresholds, the prefix-filtered join must produce
    // EXACTLY the all-pairs integer-jaccard result — a missing pair
    // falsifies completeness, an extra one falsifies the verify.
    val wordGen = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8")
    val docGen = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, wordGen))
    val caseGen = for {
      docs <- Gen.listOfN(10, docGen)
      t <- Gen.oneOf((1, 3), (2, 5), (1, 2), (3, 4))
    } yield (docs, t)
    run(Prop.forAll(caseGen) { case (docs, (tNum, tDen)) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .prefixFilterPairs(df, "doc_id", "text", shingleK = 3, tNum, tDen)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      def sh(ws: List[String]): Set[String] =
        if (ws.size < 3) Set.empty
        else ws.sliding(3).map(_.mkString(" ")).toSet
      val sets = docs.map(sh).zipWithIndex
      val want = (for {
        (sa, a) <- sets; (sb, b) <- sets
        if a < b && sa.nonEmpty && sb.nonEmpty
        i = (sa & sb).size.toLong
        u = (sa | sb).size.toLong
        if u > 0 && i * tDen >= u * tNum
      } yield (a.toLong, b.toLong)).toSet
      got == want
    })
  }

  test("deletionVariants2 Column matches the Scala reference set") {
    // The codegen'd nested-transform expression and the obvious
    // recursive definition must produce the same SET of keys — this is
    // what makes the completeness property above transfer to the plan.
    val strGen = Gen.choose(0, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    run(Prop.forAll(Gen.listOfN(8, strGen)) { ss =>
      val got = ss.distinct.toDF("s")
        .select($"s", graft.operators.Fuzzy.deletionVariants2($"s").as("v"))
        .as[(String, Seq[String])].collect().toMap
      ss.distinct.forall { s =>
        val g = got(s)
        g.toSet == delVariants2Ref(s) && g.size == g.toSet.size
      }
    })
  }

  /** Independent reference for [[graft.operators.Dedup.exactSubstrDedup]]:
    * brute-force over token lists — for every doc, flag position p iff
    * the n-gram at p equals some n-gram of a STRICTLY SMALLER doc_id
    * (the keep-minimum-doc rule), then interval-union and re-join.
    */
  private def exactSubstrRef(
      docs: List[(Long, String)], n: Int): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> Option(t).getOrElse("").trim.split("\\s+").filter(_.nonEmpty).toVector
    }.toMap
    def grams(id: Long): Set[Seq[String]] =
      toks(id).sliding(n).filter(_.size == n).map(_.toSeq).toSet
    docs.map { case (id, _) =>
      val earlier = docs.map(_._1).filter(_ < id).flatMap(grams).toSet
      val t = toks(id)
      val starts = (0 to t.size - n).filter(p => earlier.contains(t.slice(p, p + n)))
      val covered = starts.flatMap(p => p until p + n).toSet
      val kept = t.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      id -> ((t.size.toLong, (t.size - kept.size).toLong, kept.mkString(" ")))
    }.toMap
  }

  test("exactSubstrDedup matches the brute-force keep-first reference on random corpora") {
    import graft.operators.Dedup
    // Tiny alphabet + short docs force plenty of genuine cross-doc
    // n-gram collisions; n = 3 keeps the reference cheap.
    val docGen = Gen.listOfN(8,
      Gen.chooseNum(0, 11).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
    run(Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.exactSubstrDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      got == exactSubstrRef(docs, 3)
    })
  }
}
