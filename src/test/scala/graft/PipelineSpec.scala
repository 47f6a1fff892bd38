package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators._

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("languageId ties resolve with fixed precedence en > es > de > fr > zh") {
    // 'que' is both es and fr; 'en' is es ('en' list? no — es list has 'en').
    // One es-hit and one fr-hit => tie at 1; es wins over fr by precedence.
    val tie = Seq("que nada").toDF("text")
      .select(TextAnalysis.languageId(col("text"))).as[String].head()
    assert(tie == "es" || tie == "fr") // 'que' in both lists; precedence picks es
    assert(tie == "es")

    // en beats everything on a tie
    val enTie = Seq("the la").toDF("text")
      .select(TextAnalysis.languageId(col("text"))).as[String].head()
    assert(enTie == "en")

    // no hits => und
    val und = Seq("xyzzy plugh").toDF("text")
      .select(TextAnalysis.languageId(col("text"))).as[String].head()
    assert(und == "und")
  }

  test("chunkDocs: full windows, tail-aligned last window, short docs (T11)") {
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 4 exact windows
      (2L, "a b c"),                                   // shorter than one chunk
      (3L, "   "),                                     // no tokens → no rows
      (4L, (1 to 45).map(i => s"t$i").mkString(" ")))  // needs the tail window
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(df, "doc_id", "text", chunkTokens = 40, stride = 20)
      .select("doc_id", "chunk_id", "start_token", "n_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    val byDoc = out.groupBy(_._1)
    // 100 tokens: starts 1,21,41,61 — last window ends exactly at 100,
    // so no tail window is added.
    assert(byDoc(1L).map(_._3).toSeq == Seq(1, 21, 41, 61))
    assert(byDoc(1L).forall(_._4 == 40))
    // Whole doc fits in one chunk: the chunk IS the doc.
    assert(byDoc(2L).toSeq == Seq((2L, 1, 1, 3, "a b c")))
    // Whitespace-only doc emits nothing.
    assert(!byDoc.contains(3L))
    // 45 tokens: one full window [1..40], then the tail-aligned full
    // window [6..45] so tokens 41–45 are covered — never a short tail.
    assert(byDoc(4L).map(r => (r._3, r._4)).toSeq == Seq((1, 40), (6, 40)))
    assert(byDoc(4L).last._5.endsWith("t45"))
  }

  test("unigramLogProb: add-one smoothed mean logprob, exact micro-nat arithmetic (T13)") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // counts a:2 b:2 c:1, total 5, vocab 3 → p(a)=p(b)=3/8, p(c)=2/8.
    // Per-term micro-nats: round(ln(3/8)*1e6) = -980829,
    // round(ln(1/4)*1e6) = -1386294.
    assert(out(0)._2 == 3 && out(1)._2 == 2)
    assert(out(0)._3 == -980829.0 / 1e6)
    assert(out(1)._3 == ((-980829.0 - 1386294.0) / 2) / 1e6)
  }

  test("bigramLogProb: add-one smoothed conditional logprob, continuation counts (T13b)") {
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // bigrams: doc1 {(a,b)x2, (b,a)}, doc2 {(b,a)} -> c2(a,b)=2,
    // c2(b,a)=2, ctx(a)=2, ctx(b)=2, V=|{a,b}|=2.
    // p(b|a)=p(a|b)=(2+1)/(2+2)=0.75; round(ln(.75)*1e6) = -287682.
    assert(out.map(_._1).toSeq == Seq(1L, 2L))   // 1-token doc absent
    assert(out(0)._2 == 3 && out(1)._2 == 1)
    assert(out(0)._3 == -287682.0 / 1e6)
    assert(out(1)._3 == -287682.0 / 1e6)
  }

  test("lmHeldOutFilter: OOV backoff floors, tertile fences, held-out split (T13c)") {
    val train = Seq((0L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    // Model: c2(a,b)=2, c2(b,a)=2, ctx(a)=ctx(b)=2, V=|{a,b}|=2.
    val score = Seq((1L, "a b x"), (3L, "x y"), (5L, "b a b"), (7L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmHeldOutFilter(train, score, "doc_id", "text")
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 5L))   // 1-token doc absent
    // doc1: (a,b) seen p=3/4 → -287682; (b,x) unseen PAIR with seen
    // context p=1/4 → -1386294; one unseen bigram.
    assert(out(0)._2 == 2 && out(0)._3 == 1)
    assert(out(0)._4 == ((-287682.0 - 1386294.0) / 2) / 1e6)
    // doc3: (x,y) unseen CONTEXT → p = 1/V = 1/2 → -693147.
    assert(out(1)._2 == 1 && out(1)._3 == 1)
    assert(out(1)._4 == -693147.0 / 1e6)
    // doc5: fully in-vocab, p=3/4 twice, zero unseen.
    assert(out(2)._2 == 2 && out(2)._3 == 0)
    assert(out(2)._4 == -287682.0 / 1e6)
    // Fences over n=3 scored docs: t_low = rank-ceil(1) value (doc1),
    // t_high = rank-2 value (doc3) → tail / middle / head in id order.
    assert(out.map(_._5).toSeq == Seq("tail", "middle", "head"))
  }

  test("knBigramScore: hand-computed d=3/4 rationals, both backoff paths (T13d)") {
    // Same fixture as the T13c test. Model: c2(a,b)=c2(b,a)=2,
    // ctx(a)=ctx(b)=2, n1p(a)=n1p(b)=1, nc(a)=nc(b)=1, T=2, V=2,
    // T+V=4. Hand-derived (independent of the oracle, which replays
    // the same formula the operator computes):
    //   seen (a,b): [max(8-3,0)*4 + 3*1*2] / [4*2*4] = 26/32
    //     -> round(ln(0.8125)*1e6) = -207639
    //   unseen pair, seen ctx (b,x): [0 + 3*1*1]/32 = 3/32 -> -2367124
    //   unseen CONTEXT (x,y): 4*(0+1) / [4*4] = 1/4 -> -1386294
    val train = Seq((0L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val score = Seq((1L, "a b x"), (3L, "x y"), (5L, "b a b"), (7L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knBigramScore(train, score, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 5L))
    assert(out(0)._2 == 2 && out(0)._3 == 1)
    assert(out(0)._4 == ((-207639.0 - 2367124.0) / 2) / 1e6)
    assert(out(1)._2 == 1 && out(1)._3 == 1)
    assert(out(1)._4 == -1386294.0 / 1e6)
    assert(out(2)._2 == 2 && out(2)._3 == 0)
    assert(out(2)._4 == -207639.0 / 1e6)
  }

  test("mknBigramScore: hand-computed count-of-counts discounts, clamps, both backoffs (T13g)") {
    // Same fixture as the KN tests. Model: c2(a,b)=c2(b,a)=2 →
    // count-of-counts nn1=0, nn2=2, nn3=0, nn4=0; B = nn1+2·nn2 = 4.
    //   D1: nn1=0 → FALLBACK 750000 (unused: no band-1 successors)
    //   D2: 2 − 3·(0/4)·(0/2) = 2.0 → d2u = 2000000 (upper clamp edge)
    //   D3: nn3=0 → FALLBACK 750000 (unused)
    // ctx(a)=ctx(b)=2, bands (nb1,nb2,nb3)=(0,1,0) → γ·den: gnum=2e6.
    // T=2, V=2, T+V=4. Hand-derived per gram:
    //   (a,b) c=2: num = max(2e6−2e6,0)·4 + 2e6·(nc(b)+1=2) = 4e6,
    //              den = 1e6·2·4 = 8e6 → ln(1/2) → −693147
    //   (b,x) unseen gram, seen ctx: num = 2e6·1 = 2e6 → ln(1/4) → −1386294
    //   (x,y) unseen CONTEXT: num = 1e6, den = 4e6 → ln(1/4) → −1386294
    val train = Seq((0L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val score = Seq((1L, "a b x"), (3L, "x y"), (5L, "b a b"), (7L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.mknBigramScore(train, score, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 5L))
    assert(out(0)._2 == 2 && out(0)._3 == 1)
    assert(out(0)._4 == ((-693147.0 - 1386294.0) / 2) / 1e6)
    assert(out(1)._2 == 1 && out(1)._3 == 1)
    assert(out(1)._4 == -1386294.0 / 1e6)
    assert(out(2)._2 == 2 && out(2)._3 == 0)
    assert(out(2)._4 == -693147.0 / 1e6)
  }

  test("kn3TrigramScore: hand-computed two-level rationals, all three backoff paths (T13h)") {
    // Train "a b a b" → trigrams (a,b,a),(b,a,b) each c=1; continuation
    // tables all 1s; bigram bottom level: c2(a,b)=c2(b,a)=2, ncb=1
    // each, T2=2, V=2 → T2+V=4. Hand-derived per scored trigram:
    //   (a,b,a) seen: Ac = 1·4 + 3·1·2 = 10, Bc = 16 →
    //     num = 1·16 + 3·1·10 = 46, den = 4·1·16 = 64 → ln(46/64) → −330242
    //   (a,b,x) unseen trigram, SEEN (a,b) context: Ac = 0 + 3·1·1 = 3
    //     → num = 0 + 3·1·3 = 9, den = 64 → ln(9/64) → −1961659
    //   (x,a,b) unseen context, a IS a trigram middle: num = Ac = 10,
    //     den = Bc = 16 → ln(10/16) → −470004
    //   (x,y,z) y never a middle: num = 0+1, den = 4 → ln(1/4) → −1386294
    val train = Seq((0L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val score = Seq((1L, "a b a b"), (3L, "a b x"), (5L, "x a b"),
      (7L, "x y z"), (9L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.kn3TrigramScore(train, score, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 5L, 7L)) // 2-token doc drops
    assert(out(0)._2 == 2 && out(0)._3 == 0 && out(0)._4 == -330242.0 / 1e6)
    assert(out(1)._2 == 1 && out(1)._3 == 1 && out(1)._4 == -1961659.0 / 1e6)
    assert(out(2)._2 == 1 && out(2)._3 == 1 && out(2)._4 == -470004.0 / 1e6)
    assert(out(3)._2 == 1 && out(3)._3 == 1 && out(3)._4 == -1386294.0 / 1e6)
  }

  test("bm25TopK: hand-computed k1=6/5 b=3/4 rationals, idf sign, rank order (T20)") {
    // Corpus: d1 "a a b" (dl 3), d2 "a c" (dl 2), d3 "d d d d" (dl 4).
    // N=3, T=9. Query (a, b): df(a)=2 -> idf = ln(3/5) -> -510826
    // micro; df(b)=1 -> ln(5/3) -> +510826 (a term in MOST docs is
    // negative-evidence, the BM25 contract). Saturation 22*tf*T /
    // (10*tf*T + 3*T + 9*dl*N):
    //   d1,a: 396/288 = 1.375  -> round(-510826*1.375)  = -702386
    //   d1,b: 198/198 = 1.0    -> +510826
    //   d2,a: 198/171          -> round(-510826*198/171) = -591483
    // d1 score_u = -191560 ranks above d2 = -591483; d3 matches no
    // term and is absent.
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "d d d d")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("a", "b"), k = 3)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))   // rank order, d3 absent
    assert(out(0)._2 == 2 && out(0)._3 == -191560.0 / 1e6)
    assert(out(1)._2 == 1 && out(1)._3 == -591483.0 / 1e6)
  }

  test("bm25TopKBatch: single-query arm matches bm25TopK bit-for-bit; shared term fans out (T20b)") {
    // Same corpus as the bm25TopK test. Query 1 = (a, b): must equal
    // the scalar operator exactly. Query 2 = (a) shares term `a` —
    // its per-doc contributions are the hand-derived -702386 (d1) and
    // -591483 (d2), so q2 ranks d2 FIRST (less negative) where q1,
    // carrying b's positive idf on d1, ranks d1 first.
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "d d d d")).toDF("doc_id", "text")
    val q = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("query_id", "term")
    val out = TextAnalysis.bm25TopKBatch(docs, "doc_id", "text", q, k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, -r._4, r._2))
    val q1 = out.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)).toSeq
    val scalar = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("a", "b"), k = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(q1 == scalar)
    val q2 = out.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSeq
    assert(q2 == Seq((2L, 1L, -591483.0 / 1e6), (1L, 1L, -702386.0 / 1e6)))
    // SET semantics (ADVICE r14): a repeated (query_id, term) row must
    // NOT double-count — queries are term sets, so the duplicated
    // workload scores identically to the clean one.
    val qDup = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"))
      .toDF("query_id", "term")
    val outDup = TextAnalysis.bm25TopKBatch(docs, "doc_id", "text", qDup, k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, -r._4, r._2))
    assert(outDup.toSeq == out.toSeq,
      "duplicate (query_id, term) rows changed BM25 scores/ranks")
  }

  test("bm25 raw-layer fold = full rebuild (T20e): append tf/dl, re-score, never re-tokenize") {
    // Corpus includes a ZERO-token doc (4): it carries no postings but
    // counts in n_docs/avgdl, so the docLens layer must remember it —
    // losing it would shift every contribution after a fold.
    val corpus = Seq((1L, "a a b"), (2L, "a c"), (3L, "d d d d"), (4L, ""))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "a b e"), (11L, "e e")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("term"), col("doc_id"), col("tf"), col("contrib_u"))
        .as[(String, Long, Long, Long)].collect().toSet
    val folded = TextAnalysis.bm25ScoreIndex(
      TextAnalysis.bm25DocLens(corpus, "doc_id", "text")
        .unionByName(TextAnalysis.bm25DocLens(batch, "doc_id", "text")),
      TextAnalysis.bm25Tf(corpus, "doc_id", "text")
        .unionByName(TextAnalysis.bm25Tf(batch, "doc_id", "text")))
    val rebuilt = TextAnalysis.bm25Index(
      corpus.unionByName(batch), "doc_id", "text")
    assert(rows(folded) == rows(rebuilt), "fold must equal a from-scratch rebuild")
    // And scores are GLOBAL-statistics-dependent: the corpus-only index
    // gives ('b', doc 1) a different contribution than the grown one
    // (df(b) 1→2, n_docs 4→6, avgdl moves) — which is exactly why the
    // scored layer re-derives and only the raw layers fold
    // incrementally. (Term 'a' is deliberately NOT the probe: its idf
    // is ln(5/5) = 0 before AND ln(7/7) = 0 after — a fixture
    // coincidence that would vacuously pass.)
    val before = rows(TextAnalysis.bm25Index(corpus, "doc_id", "text"))
    def contribB1(s: Set[(String, Long, Long, Long)]) =
      s.find(r => r._1 == "b" && r._2 == 1L).get._4
    assert(contribB1(before) != contribB1(rows(folded)),
      "idf must move with the ingest — a frozen scored index would be stale")
  }

  test("dupNgramCoverage: hand-traced interval union, separator rule, short docs") {
    // "a b c a b c x" (13 chars normalized). Dup bigram starts:
    // {1,2,4,5} ("a b" and "b c" twice each). Covered tokens 1-6
    // (6 chars), covered separators {1,2,4,5} (4 chars) — the
    // separator after position 3 ("c a" occurs once) and the one
    // before x stay uncovered even though their endpoints are: spans
    // [0..4] and [6..10] of the string, union 10 of 13. Hand-traced
    // from the string, not from running the operator.
    val docs = Seq(
      (1L, "a b c a b c x"),
      (2L, "all distinct words here"), // no dup grams -> coverage 0
      (3L, "tiny"))                    // shorter than n -> no grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupNgramCoverage(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((7L, 13L, 10L)), out(1L).toString)
    assert(out(2L) == ((4L, 23L, 0L)))
    assert(out(3L) == ((1L, 4L, 0L)))
  }

  test("calibrationBins: sigmoid micro-units, bin edges, saturation clamps (T19d)") {
    // Hand-derived: σ(0)=0.5 → p_u 500000 → bin 5; σ(ln 3)=0.75 →
    // 750000 → bin 7; σ(-100) underflows → p_u 0 → bin 0; σ(100)
    // saturates → p_u 10⁶ → floor gives bin 10, LEAST clamps to 9.
    val scored = Seq(
      (0.0, true), (0.0, false), (math.log(3.0), true),
      (-100.0, false), (100.0, true)).toDF("log_odds", "label")
    val out = TextAnalysis.calibrationBins(scored, "log_odds", "label", bins = 10)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 5L, 7L, 9L))
    val b5 = out.find(_._1 == 5L).get
    assert(b5._2 == 2 && b5._3 == 1 && b5._4 == 0.5 && b5._5 == 0.5)
    val b7 = out.find(_._1 == 7L).get
    assert(b7._2 == 1 && b7._4 == 0.75)
    assert(out.find(_._1 == 0L).get._4 == 0.0) // underflow → exact floor
    assert(out.find(_._1 == 9L).get._4 == 1.0) // saturation → exact ceiling
  }

  test("calibrationSummary: hand-computed ECE and Brier on the bins fixture (T19e)") {
    // Same fixture as calibrationBins. p_u: 500000, 500000, 750000,
    // 0, 1000000; y: 1,0,1,0,1. ECE numerators per bin:
    // bin5 |1e6−1e6|=0, bin7 |750000−1e6|=250000, bins 0/9 exact →
    // ECE = 250000/(5·1e6) = 0.05. Brier squares: 2.5e11 + 2.5e11 +
    // 6.25e10 + 0 + 0 = 5.625e11 → /5/1e12 = 0.1125.
    val scored = Seq(
      (0.0, true), (0.0, false), (math.log(3.0), true),
      (-100.0, false), (100.0, true)).toDF("log_odds", "label")
    val out = TextAnalysis.calibrationSummary(scored, "log_odds", "label", bins = 10)
      .as[(Long, Double, Double)].head()
    assert(out == ((5L, 0.05, 0.1125)))
  }

  test("cusumShift: sustained small shift accumulates to the alarm; quiet series stays silent") {
    import graft.operators.Funnel
    def day(i: Int) = java.sql.Date.valueOf(f"2024-01-${i}%02d")
    // Baseline days 1-6 jitter ±2 around 100; days 7-12 sit at 115 —
    // a sustained shift. med = 102 (disc over 12 values), MAD = 4,
    // slack = 4, alarm at 5·4 = 20. Hand-traced S⁺: 0 through day 6,
    // then 9, 18, 27, 36, 45, 54 — the alarm fires day 9, two days
    // AFTER onset but days before any single day would clear a
    // pointwise gate at its own scale. S⁻ stays 0.
    val shifted = Seq(100L, 98L, 102L, 99L, 101L, 100L, 115L, 115L, 115L, 115L, 115L, 115L)
      .zipWithIndex.map { case (n, i) => (day(i + 1), n) }.toDF("d", "n")
    val out = Funnel.cusumShift(shifted, "d", "n", hMads = 5)
      .as[(java.sql.Date, Long, Long, Long, Boolean)].collect().sortBy(_._1.getTime)
    assert(out.map(_._3).toSeq == Seq(0L, 0L, 0L, 0L, 0L, 0L, 9L, 18L, 27L, 36L, 45L, 54L))
    assert(out.forall(_._4 == 0L))
    assert(out.map(_._5).toSeq == Seq.fill(8)(false) ++ Seq.fill(4)(true))
    // Quiet series: same jitter, no shift — nothing accumulates.
    val quiet = Seq(100L, 98L, 102L, 99L, 101L, 100L, 100L, 102L, 98L, 100L, 99L, 101L)
      .zipWithIndex.map { case (n, i) => (day(i + 1), n) }.toDF("d", "n")
    val q = Funnel.cusumShift(quiet, "d", "n", hMads = 5)
      .as[(java.sql.Date, Long, Long, Long, Boolean)].collect()
    assert(q.forall(!_._5))
  }

  test("winnowKernel matches the Column rollingHashes+winnow path") {
    val df = Seq((1L, "The quick brown fox jumps over the lazy dog again and again"),
      (2L, "short"), (3L, "tiny"), (4L, "abcdefgh"), (5L, "中文字符混合 text 测试串流"))
      .toDF("doc_id", "text")
    val columnar = df
      .select(col("doc_id"), TextAnalysis.rollingHashes(lower(col("text")), 5).as("hs"))
      .persist()
    columnar.count()
    val colFps = columnar
      .select(col("doc_id"), TextAnalysis.winnow(col("hs"), 8).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val kernel = TextAnalysis.winnowKernel(df, "doc_id", "text", 5, 8)
      .as[(Long, Seq[Long])].collect().toMap
    for (id <- 1L to 5L) assert(kernel(id) == colFps(id), s"doc $id")
    columnar.unpersist()
  }

  test("fingerprint is case/whitespace-insensitive (exact-dedup key)") {
    val fps = Seq("Hello  World", "hello world", "HELLO\tWORLD ").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).as[String].collect().toSet
    assert(fps.size == 1)
  }

  test("token counts: whitespace vs regex definitions") {
    val r = Seq("Hello, world! 42").toDF("text")
      .select(TextAnalysis.tokenCountWs(col("text")),
        TextAnalysis.tokenCountRegex(col("text")))
      .as[(Int, Int)].head()
    assert(r._1 == 3) // ["Hello,", "world!", "42"]
    assert(r._2 == 5) // ["hello", ",", "world", "!", "42"]
  }

  test("redactPii replaces email, IPv4, phone in order; word-boundary guards hold") {
    val r = Seq(
      "mail a.b+c@ex-1.co then 10.0.255.7 call +15550123 done",
      "x1.2.3.4 not an ip; 1.2.3.4b neither; +12345 too short",
      "plain text").toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).as[String].collect()
    assert(r(0) == "mail <EMAIL> then <IP> call <PHONE> done")
    // embedded in word chars -> \b fails -> untouched; 5-digit phone < 6 min
    assert(r(1) == "x1.2.3.4 not an ip; 1.2.3.4b neither; +12345 too short")
    assert(r(2) == "plain text")
  }

  test("repetitionStats: duplicated-word and top-bigram character fractions") {
    val r = TextAnalysis.repetitionStats(
      Seq((1L, "aa bb aa cc"), (2L, "solo"), (3L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    // doc 1: aa occurs 2x -> 4 of 8 token chars dup = 0.5;
    // bigrams "aa bb","bb aa","aa cc" all cnt 1, len 5 -> 5/15
    assert(r(0) == ((1L, 0.5, 0.333333)))
    // one token: no dup, no bigram; null text: total row of zeros
    assert(r(1) == ((2L, 0.0, 0.0)))
    assert(r(2) == ((3L, 0.0, 0.0)))
  }

  test("packSequences: next-fit per bucket in id order, oversized doc isolated") {
    val docs = Seq(
      (1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L), (4L, 0L, 300L), (5L, 0L, 50L),
      (10L, 1L, 256L), (11L, 1L, 1L)).toDF("doc_id", "bucket", "n_tok")
    val r = TextAnalysis.packSequences(docs, "doc_id", "n_tok", "bucket", 256L)
      .select(col("bucket"), col("doc_id"), col("seq"))
      .as[(Long, Long, Int)].collect().toSet
    // bucket 0: 100+100=200 fits, +100 overflows -> seq1; 300 overflows
    // (oversized, alone in seq2); 50 overflows the 300 bin -> seq3.
    // bucket 1: exactly-full 256 stays seq0; next doc overflows -> seq1.
    assert(r == Set(
      (0L, 1L, 0), (0L, 2L, 0), (0L, 3L, 1), (0L, 4L, 2), (0L, 5L, 3),
      (1L, 10L, 0), (1L, 11L, 1)))
  }
}

class EntropySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("charEntropy separates noise, floods, and prose; exact on uniform alphabets") {
    val df = Seq(
      (1L, "aaaaaaaaaa"),                        // flood: H = 0
      (2L, "abcdabcdabcdabcd"),                  // uniform 4-char: H = ln 4
      (3L, "the quick brown fox jumps over it"), // prose: mid-band
      (4L, "")).toDF("doc_id", "text")           // empty: absent
    val out = TextAnalysis.charEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 0.0)
    assert(math.abs(out(2L)._4 - math.log(4.0)) < 1e-5)
    assert(out(2L)._3 == 4L && out(2L)._2 == 16L)
    assert(out(3L)._4 > 2.0 && out(3L)._4 < 3.5)
    assert(!out.contains(4L))
  }

  test("charEntropyKernel bit-parity with the Column twin, incl. surrogates and ln rounding") {
    // The kernel contract: same (doc_id, n_chars, n_distinct_chars,
    // entropy) rows as the explode -> two-level aggregate twin, chars
    // counted by CODE POINT and ln rounded via the identical
    // BigDecimal-HALF_UP micro arithmetic. The fixture plants a
    // surrogate-pair emoji (one code point, two UTF-16 chars),
    // combining accents, a flood (count large enough to exercise the
    // rounding path beyond ln 1 = 0), empty and null.
    val df = Seq(
      (1L, "aaaaaaaaaabbbbbcc"),
      (2L, "café 🎉🎉 café"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "x" * 1000 + "yz")).toDF("doc_id", "text")
    val twin = TextAnalysis.charEntropyColumns(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    val kernel = TextAnalysis.charEntropyKernel(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(kernel == twin, s"kernel-only ${kernel.diff(twin)} vs twin-only ${twin.diff(kernel)}")
    // The surrogate pair must count as ONE character.
    val m = kernel.map(r => r._1 -> r).toMap
    assert(m(2L)._2 == 12L && m(2L)._3 == 6L)
  }
}

class PhraseSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("phraseSearch: consecutive positions only, multi-term, counts and first_pos") {
    val docs = Seq(
      (1L, "big red fox saw a big red fox den"),  // "big red fox" twice, pos 0 and 5
      (2L, "red big fox"),                        // words present, order wrong
      (3L, "big red herring"),                    // only the 2-prefix matches
      (4L, "nothing here")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text")
    val three = TextAnalysis.phraseSearch(idx, Seq("big", "red", "fox"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(three == Map(1L -> ((2L, 0))))
    val two = TextAnalysis.phraseSearch(idx, Seq("big", "red"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(two == Map(1L -> 2L, 3L -> 1L))
    assert(TextAnalysis.phraseSearch(idx, Seq("absent", "term")).count() == 0L)
  }

  test("phraseSearchBigram matches phraseSearch for a frame-borne phrase") {
    val docs = Seq((1L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text")
    val viaSeq = TextAnalysis.phraseSearch(idx, Seq("alpha", "beta"))
      .as[(Long, Long, Int)].collect().toSet
    val viaDf = TextAnalysis.phraseSearchBigram(idx,
        Seq(("alpha", "beta")).toDF("w1", "w2"))
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSeq == viaDf && viaSeq == Set((1L, 2L, 0)))
  }
}

class SentencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sentences: punctuation runs, trailing terminator, empties, no-punct docs") {
    val df = Seq(
      (1L, "First one. Second!! Third... ok?"),
      (2L, "No terminator here"),
      (3L, "Ends hard."),
      (4L, "  "),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.sentences(df, "doc_id", "text")
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 0, "First one"), (1L, 1, "Second"), (1L, 2, "Third"), (1L, 3, "ok"),
      (2L, 0, "No terminator here"),
      (3L, 0, "Ends hard")))
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hotBucketStats measures what capBuckets would cut (D16 observability)") {
    import graft.operators.Dedup
    val banded = Seq((1L, 0, "k1"), (2L, 0, "k1"), (3L, 0, "k1"), (4L, 0, "k2"))
      .toDF("id", "band", "key")
    assert(Dedup.hotBucketStats(banded, maxBucket = 2) == ((1L, 3L)))
    assert(Dedup.hotBucketStats(banded, maxBucket = 5) == ((0L, 3L)))
    assert(Dedup.hotBucketStats(banded.limit(0), maxBucket = 2) == ((0L, 0L)))
    // The opt-in log path runs without disturbing results.
    spark.conf.set("graft.lsh.logHotBuckets", "true")
    try {
      val docs = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
        .toDF("doc_id", "text")
      assert(Dedup.simhashPairs(docs, "doc_id", "text").count() == 1)
    } finally spark.conf.set("graft.lsh.logHotBuckets", "false")
  }

  test("lrTrain/lrScore: separable classes get correct signs; empty doc scores 0; deterministic") {
    import graft.operators.TextAnalysis
    val docs = (
      (1L to 8L).map(i => (i, "good good good", true)) ++
      (11L to 18L).map(i => (i, "bad bad bad", false)) :+
      ((99L, "", false))).toDF("doc_id", "text", "y")
    val model = TextAnalysis.lrTrain(docs, "doc_id", "text", "y",
      buckets = 64, iters = 3, etaDen = 32)
    val scored = TextAnalysis.lrScore(model, docs, "doc_id", "text", buckets = 64)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    // Positive docs: z > 0, pred true; negative: z < 0, pred false.
    scored.filter(r => r._1 <= 8L).foreach(r => assert(r._3 > 0 && r._4, r.toString))
    scored.filter(r => r._1 >= 11L && r._1 <= 18L)
      .foreach(r => assert(r._3 < 0 && !r._4, r.toString))
    // The tokenless doc has no feature evidence: z = 0, pred false.
    assert(scored.find(_._1 == 99L).get == ((99L, 0L, 0.0, false)))
    // Training is a pure function of its inputs: a second run is equal.
    val again = TextAnalysis.lrScore(
      TextAnalysis.lrTrain(docs, "doc_id", "text", "y", 64, 3, 32),
      docs, "doc_id", "text", 64)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(scored.toSeq == again.toSeq)
  }

  test("rrfFuse: two-system consensus beats a single #1; integer contributions; top-k cut") {
    import graft.operators.Similarity
    // System A ranks: d1=1, d2=2, d3=3.  System B ranks: d2=1, d3=2, d9=3.
    // d2 (ranks 2+1) must beat d1 (rank 1 in one system only):
    //   d2: 1e6 DIV 62 + 1e6 DIV 61 = 16129 + 16393 = 32522
    //   d1: 1e6 DIV 61             = 16393
    val votes = Seq(
      (7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3),
      (7L, 2L, 1), (7L, 3L, 2), (7L, 9L, 3)).toDF("q", "d", "rank")
    val out = Similarity.rrfFuse(votes, "q", "d", "rank", k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(-_._4)
    assert(out.length == 3)
    assert(out(0) == ((7L, 2L, 2L, 32522L)))
    assert(out(1) == ((7L, 3L, 2L, 32002L)))   // 15873 + 16129
    assert(out(2) == ((7L, 1L, 1L, 16393L)))   // d9 (15873) cut by k=3
  }

  test("textRank: two-node graph is the exact fixed point; star hub outranks leaves") {
    import graft.operators.TextAnalysis
    // x <-> y with unit weights: contribution (85*1e6*1) DIV (100*1)
    // = 850000, rank = 150000 + 850000 = 1e6 at EVERY iteration.
    val two = Seq((1L, "x y")).toDF("doc_id", "text")
    val r2 = TextAnalysis.textRank(two, "doc_id", "text", window = 2, iters = 5)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(r2.toSeq == Seq(("x", 1L, 1000000L), ("y", 1L, 1000000L)))
    // Star: h adjacent to a, b, c (window 1) -> h collects the mass.
    val star = Seq((1L, "h a h b h c")).toDF("doc_id", "text")
    val rs = TextAnalysis.textRank(star, "doc_id", "text", window = 1, iters = 5)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(rs("h") > rs("a") && rs("a") == rs("b") && rs("b") > rs("c"), rs.toString)
    // Mean-1 mass conservation up to the documented floor loss.
    val total = rs.values.sum
    assert(total <= 4000000L && total > 4000000L - 200L, total.toString)
  }

  test("exactSubstrDedup cuts cross-doc spans, keeps first doc, ignores within-doc repeats") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "a b c d e f g h tail one"),        // keeper: first doc wins
      (2L, "x y  a b c d z w q r"),            // shares "a b c d" (+ double space)
      (3L, "hello there"),                     // shorter than n: untouched
      (4L, null.asInstanceOf[String]),         // null text: empty out
      (5L, "a b c d e f g h tail one"),        // exact copy: fully excised
      (6L, "p q r s p q r s")                  // within-doc repeat only: kept
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(docs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 10L, 0L, "a b c d e f g h tail one")))
    // doc 2: the flagged window [3,6] is cut; whitespace normalized.
    assert(out(1) == ((2L, 10L, 4L, "x y z w q r")))
    assert(out(2) == ((3L, 2L, 0L, "hello there")))
    assert(out(3) == ((4L, 0L, 0L, "")))
    assert(out(4) == ((5L, 10L, 10L, "")))
    assert(out(5) == ((6L, 8L, 0L, "p q r s p q r s")))
  }

  test("kAnonymize: suppresses under-k tuples incl. null keys; residual class surfaces on re-audit") {
    import graft.operators.Cleaning
    val df = (
      (1 to 10).map(i => (i.toLong, "en", "web")) ++          // big class: kept
      Seq((20L, "de", "book"), (21L, "de", "book")) ++        // small: suppressed
      Seq((30L, null.asInstanceOf[String], "rare"))           // null QI: suppressed too
    ).toDF("id", "lang", "source")
    val fixed = Cleaning.kAnonymize(df, Seq("lang", "source"), k = 3)
    val byId = fixed.as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == (("en", "web")))
    assert(byId(20L) == (("*", "*")) && byId(30L) == (("*", "*")))
    // 3 suppressed rows meet k = 3: the re-audit certifies the fix.
    val audit = Cleaning.kAnonymityAudit(fixed, Seq("lang", "source"), k = 3)
      .as[(Long, Long, Long, Long)].head()
    assert(audit == ((2L, 0L, 0L, 3L)), audit.toString)
    // Residual case: at k = 5 the 3 suppressed rows are STILL a small
    // class — the re-audit must surface it, not mask it.
    val audit5 = Cleaning.kAnonymityAudit(
        Cleaning.kAnonymize(df, Seq("lang", "source"), k = 5),
        Seq("lang", "source"), k = 5)
      .as[(Long, Long, Long, Long)].head()
    assert(audit5 == ((2L, 1L, 3L, 3L)), audit5.toString)
  }

  test("foldSubstrIndex: fold equals rebuild; replaying the same batch is a no-op") {
    import graft.operators.Dedup
    val corpus = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val batch = Seq((2L, "k l m n o p q r s t")).toDF("doc_id", "text")
    val idx = Dedup.substrGramIndex(corpus, "doc_id", "text", n = 8)
    val folded = Dedup.foldSubstrIndex(idx, batch, "doc_id", "text", n = 8)
      .as[String].collect().sorted.toSeq
    val rebuilt = Dedup.substrGramIndex(
        corpus.unionByName(batch), "doc_id", "text", n = 8)
      .as[String].collect().sorted.toSeq
    assert(folded == rebuilt && folded.size == 6) // 3 windows per doc
    val replayed = Dedup.foldSubstrIndex(
        Dedup.foldSubstrIndex(idx, batch, "doc_id", "text", n = 8)
          .toDF("fp"), batch, "doc_id", "text", n = 8)
      .as[String].collect().sorted.toSeq
    assert(replayed == folded)
  }

  test("exactSubstrDedup overlapping flagged windows union into one maximal span") {
    import graft.operators.Dedup
    // doc 2 contains a 6-token run shared with doc 1 -> three
    // overlapping 4-windows flag; the union removes exactly 6 tokens.
    val docs = Seq(
      (1L, "m1 m2 m3 m4 m5 m6 u v"),
      (2L, "pre m1 m2 m3 m4 m5 m6 post")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(docs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(1) == ((2L, 8L, 6L, "pre post")))
  }

  test("duplicateSpans finds the shared window, skips doc-local repeats and short docs") {
    import graft.operators.TextAnalysis
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " tail one"),
      (2L, shared + " other ending here"),
      (3L, "completely different words " + (1 to 7).map(i => s"x$i").mkString(" ")),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpans(docs, "doc_id", "text",
      spanTokens = 10, stride = 5, minDocs = 2)
      .as[(String, Long, Long, Long)].collect()
    // Docs 1 and 2 share exactly the one 10-token window at position 1.
    assert(out.length == 1, out.toSeq.toString)
    assert(out.head._2 == 2L && out.head._3 == 2L && out.head._4 == 1L)
  }

  test("dupSpanFractions scores shared-span docs 1.0, unique-span docs 0.0, drops short docs") {
    import graft.operators.TextAnalysis
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " tail one"),
      (2L, shared + " other ending here"),
      (3L, "completely different words " + (1 to 7).map(i => s"x$i").mkString(" ")),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanFractions(docs, "doc_id", "text",
      spanTokens = 10, stride = 5, minDocs = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, 1.0)), 2L -> ((1L, 1L, 1.0)), 3L -> ((1L, 0L, 0.0))), out.toString)
  }

  test("LSH bucket cap SPLITS hot buckets (not drop): subset of uncapped, every member stays paired") {
    // Six identical docs land in the same band buckets (bucket size
    // 6). With maxBucket=3 each bucket rank-chunks into {1,2,3} and
    // {4,5,6} (id order) → within-chunk pairs only: 3+3 = 6 of the 15
    // uncapped pairs. The round-15 DROP posture emitted ZERO pairs
    // here — the anti-drop pin is that every doc still appears in at
    // least one pair.
    val docs = (1L to 6L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashPairsKernel(docs, "doc_id", "text",
      mode = "word", k = 3, numHashes = 16, bands = 4, threshold = 0.4, maxBucket = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)),
      "over-cap buckets must split into id-ordered rank chunks of maxBucket")
    val uncapped = Dedup.minhashPairsKernel(docs, "doc_id", "text",
      mode = "word", k = 3, numHashes = 16, bands = 4, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15, "default cap must leave small buckets untouched")
    assert(capped.subsetOf(uncapped), "split pairs must be a subset of uncapped pairs")
    val pairedDocs = capped.flatMap(p => Seq(p._1, p._2))
    assert(pairedDocs == (1L to 6L).toSet,
      "split-not-drop: every hot-bucket member must remain eligible (drop forfeited all)")
  }

  test("charShingles builds real n-grams of the text (round-1 bug regression)") {
    val sh = Seq("abcdef").toDF("t")
      .select(Dedup.charShingles(col("t"), 3)).as[Seq[String]].head()
    assert(sh == Seq("abc", "bcd", "cde", "def"))
  }

  test("wordShingles: k-grams, distinct, empty when short") {
    val df = Seq((Seq("a", "b", "c", "a", "b", "c"), 1), (Seq("a"), 2)).toDF("toks", "id")
    val sh = df.orderBy("id").select(Dedup.wordShingles(col("toks"), 2)).as[Seq[String]].collect()
    assert(sh(0).toSet == Set("a b", "b c", "c a"))
    assert(sh(1).isEmpty)
  }

  test("jaccard of identical sets is 1, disjoint 0, empty-vs-empty 0") {
    val df = Seq((Seq("x", "y"), Seq("x", "y")), (Seq("x"), Seq("y")), (Seq.empty[String], Seq.empty[String]))
      .toDF("a", "b")
    val j = df.select(Dedup.jaccard(col("a"), col("b"))).as[Double].collect().toSeq
    assert(j == Seq(1.0, 0.0, 0.0))
  }

  test("withSimhash: identical token sets get identical hashes; disjoint differ") {
    val df = Seq((1L, Seq("spark", "scala", "data")), (2L, Seq("spark", "scala", "data")),
      (3L, Seq("completely", "different", "words"))).toDF("id", "toks")
    val sims = Dedup.withSimhash(df, "toks", "sim")
      .select("id", "sim").as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    assert(sims(1L) != sims(3L))
    assert(sims.values.forall(_ >= 0L)) // 60-bit => positive in signed 64
  }

  test("JVM signature kernel is bit-identical to the Column expressions") {
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  Mixed CASE   with   spaces  "), (3L, "ab"), (4L, "短 文 本 测 试"),
      (5L, "trailing newline text here\n"), // Java split(limit 0) would drop the "" token
      (6L, "emoji 😀 body with more words"), // non-BMP: codepoint vs UTF-16 slicing
      (7L, null.asInstanceOf[String])) // null text: both paths must yield []
    val df = texts.toDF("doc_id", "text")

    for (mode <- Seq("word", "char")) {
      val k = if (mode == "word") 3 else 5
      val shCol = if (mode == "word")
        Dedup.wordShingles(TextAnalysis.tokens(lower(col("text"))), k)
      else Dedup.charShingles(lower(col("text")), k)
      // Kernel `sh` is the DISTINCT md5 hash set (DocShingles contract);
      // the columnar twin is array_distinct over shingleHashes.
      val columnar = df.select(col("doc_id"), shCol.as("sh"))
        .select(col("doc_id"),
          array_distinct(Dedup.shingleHashes(col("sh"))).as("hv"),
          Dedup.minhashFromHashes(Dedup.shingleHashes(col("sh")), 16).as("sg"))
        .as[(Long, Seq[Option[Long]], Seq[Option[Long]])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val kernel = Dedup.shingleSignatures(df, "doc_id", "text", mode, k, 16)
        .as[(Long, Seq[Long], Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      for (id <- texts.map(_._1)) {
        assert(kernel(id)._1 == columnar(id)._1.flatten, s"$mode hashed shingles for doc $id")
        // Column path yields [null x 16] for empty shingles, kernel [].
        if (kernel(id)._1.nonEmpty)
          assert(kernel(id)._2 == columnar(id)._2.flatten, s"$mode signature for doc $id")
        else assert(kernel(id)._2.isEmpty)
      }
    }
  }

  test("dedupClusters: min-label propagation finds connected components") {
    // chain 1-2-3, pair 10-11, transitive 20-21, 21-22, 20-22
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedup_embed composition: identical/perturbed vectors cluster, negated vector doesn't") {
    // Identical vectors share every LSH band key (cos 1.0); a tiny
    // perturbation that flips no coordinate sign shares them too; the
    // negated vector flips every band bit AND sits at cos -1 — it must
    // survive as a non-member (no row, not a singleton row).
    val dim = 64
    val base = (0 until dim).map(i => (i % 7 - 3).toFloat + 0.5f)
    val df = Seq(
      (1L, base), (2L, base), (3L, base.map(x => -x)),
      (4L, base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }))
      .toDF("vec_id", "embedding")
    val out = Dedup.dedupClusters(
      Similarity.bucketedPairs(df, "vec_id", "embedding",
        dim = dim, nBands = 6, bitsPerBand = 12, minCosine = 0.2))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 4L -> 1L), out.toString)
  }

  test("semDedup: within-cell groups, keep-the-outlier rule, non-members absent") {
    // Two centroids on axes e1/e2; cell 0 holds a 3-member dup group
    // {1,2,3} plus doc 4 (assigned to cell 0 but under θ with every
    // member — must appear in NO row, not as a singleton); cell 1
    // holds the pair {5,6}. Keep rule: the member with the LOWEST
    // centroid similarity survives — v3 (0.9578) over v1 (0.9950) /
    // v2 (0.9929), and v6 over v5 — hand-traced from the exact
    // geometry, not from running the operator.
    val docs = Seq(
      (1L, Seq(1f, 0f, 0.1f, 0f)),
      (2L, Seq(1f, 0f, 0.12f, 0f)),
      (3L, Seq(1f, 0f, 0.3f, 0f)),
      (4L, Seq(1f, 0f, -1f, 0f)),
      (5L, Seq(0f, 1f, 0.1f, 0f)),
      (6L, Seq(0f, 1f, 0.3f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("c_id", "c_vec")
    val out = Dedup.semDedup(docs, "vec_id", "embedding", cents, minCosine = 0.9)
      .select(col("id"), col("cell"), col("cluster_rep"), col("keep"))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(out == Set(
      (1L, 0L, 1L, 0), (2L, 0L, 1L, 0), (3L, 0L, 1L, 1),
      (5L, 1L, 5L, 0), (6L, 1L, 5L, 1)), out.toString)
  }

  test("semDedup hot-cell cap: one degenerate cell, bounded candidates, split-not-drop") {
    // Adversarial SemDeDup degeneracy (r14 verdict ask #3): EVERY
    // vector lands in ONE cell — k ∝ √N cannot help, the cell's own
    // |cell|² term quadratizes. 30 near-identical vectors
    // (1, 0, i/1000, 0), single centroid on e1; every pair's cosine
    // > 0.999, so uncapped candidates are exactly C(30,2).
    val docs = (1L to 30L).map(i => (i, Seq(1f, 0f, i.toFloat / 1000f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("c_id", "c_vec")
    val members = Dedup.semDedupMembers(docs, "vec_id", "embedding", cents)
    // Observability: one cell over cap, occupancy 30.
    assert(Dedup.hotCellStats(members, maxCell = 10) == (1L, 30L))
    val uncapped = Dedup.semDedupScoredPairs(members, minCosine = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.size == 30 * 29 / 2, s"uncapped ${uncapped.size}")
    // Capped at 10: rank chunks of 10 → 3 sub-cells → 3·C(10,2)
    // candidates, LINEAR in |cell| at fixed cap (vs quadratic 435).
    val capped = Dedup.semDedupScoredPairs(members, minCosine = 0.9, maxCell = 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.size == 3 * (10 * 9 / 2), s"capped ${capped.size}")
    assert(capped.subsetOf(uncapped), "split must only REMOVE candidates")
    // Split-not-drop: every member stays eligible in its chunk — the
    // full semDedup still sweeps all 30 vectors into (now 3) groups
    // with one keeper each; nothing silently vanishes the way a
    // capBuckets-style DROP would.
    val out = Dedup.semDedup(docs, "vec_id", "embedding", cents,
      minCosine = 0.9, maxCell = 10)
      .select(col("id"), col("cluster_rep"), col("keep"))
      .as[(Long, Long, Int)].collect()
    assert(out.length == 30)
    assert(out.map(_._2).distinct.length == 3, "3 rank-chunk groups")
    assert(out.count(_._3 == 1) == 3, "one keeper per group")
    // maxCell = 0 stays byte-identical to the uncapped contract.
    val off = Dedup.semDedupScoredPairs(members, minCosine = 0.9, maxCell = 0)
      .as[(Long, Long, Double)].collect().toSet
    assert(off == uncapped)
  }

  test("semDedupFoldBatch: fold = full rebuild; D20 upsert loop idempotent (D25f)") {
    // The semDedup/semDedupStream fixture: corpus 1-6 (cell 0 group
    // {1,2,3} + outlier 4, cell 1 pair {5,6}); arrivals 100 and 102
    // duplicate standing members (rejected), 101 routes to cell 0 but
    // stays under θ against every member (admitted).
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0.1f, 0f)), (2L, Seq(1f, 0f, 0.12f, 0f)),
      (3L, Seq(1f, 0f, 0.3f, 0f)), (4L, Seq(1f, 0f, -1f, 0f)),
      (5L, Seq(0f, 1f, 0.1f, 0f)), (6L, Seq(0f, 1f, 0.3f, 0f)))
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("c_id", "c_vec")
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val members = Dedup.semDedupMembers(corpusDf, "vec_id", "embedding", cents)
    val arrivals = Seq(
      (100L, Seq(1f, 0f, 0.11f, 0f)),
      (101L, Seq(1f, 0f, -1f, 3f)),
      (102L, Seq(0f, 1f, 0.2f, 0f)))
      .toDF("vec_id", "embedding")
    val admitted = Dedup.semDedupAdmit(
      arrivals, "vec_id", "embedding", cents, members, minCosine = 0.9)
    assert(admitted.select(col("id")).as[Long].collect().toSet == Set(101L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("cell"), col("sim_c"), col("vec"))
        .as[(Long, Long, Double, Seq[Double])].collect().toSet
    // Fold ≡ rebuild: frozen centroids make assignment per-row, so the
    // incremental fold equals re-assigning the grown corpus from scratch.
    val folded = Dedup.semDedupFoldBatch(
      arrivals, "vec_id", "embedding", cents, members, minCosine = 0.9)
    val rebuilt = Dedup.semDedupMembers(
      corpusDf.unionByName(arrivals.filter(col("vec_id") === 101L)),
      "vec_id", "embedding", cents)
    assert(rows(folded) == rows(rebuilt))
    // The D20 persistence loop: land the standing frame, fold the
    // admitted rows via the write-then-swap upsert, re-load — and a
    // replayed batch (foreachBatch at-least-once) changes nothing.
    import graft.streaming.StreamingOps
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup_fold")
      .toString + "/members"
    StreamingOps.upsertBatch(members, dir, Seq("id"), "sim_c")
    StreamingOps.upsertBatch(admitted, dir, Seq("id"), "sim_c")
    assert(rows(spark.read.parquet(dir)) == rows(rebuilt))
    StreamingOps.upsertBatch(admitted, dir, Seq("id"), "sim_c")
    assert(rows(spark.read.parquet(dir)) == rows(rebuilt),
      "replaying the same batch must be a no-op")
  }

  test("assignToClusters matches a full recompute on a non-bridging batch") {
    // Corpus ids 1-6: clusters {1,2}, {3,4}; 5, 6 singletons. Batch ids
    // 10-15 (arrival order: all > any standing rep). Batch pairs:
    //   10—2        -> adopts rep 1
    //   11—12, 12—3 -> component {11,12} adopts rep 3 (transitively:
    //                  11 never touched the corpus itself)
    //   13—14       -> unmatched component, keeps min batch id 13
    //   15—5        -> adopts the SINGLETON corpus doc's rep (5) —
    //                  exercises the existing-covers-singletons contract
    val corpusPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val corpusIds = (1L to 6L).toDF("id")
    val existing = corpusIds
      .join(Dedup.dedupClusters(corpusPairs), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_rep"), col("id")).as("cluster_rep"))
    val batchPairs = Seq(
      (10L, 2L), (11L, 12L), (12L, 3L), (13L, 14L), (15L, 5L))
      .toDF("id_a", "id_b")
    val incr = Dedup.assignToClusters(batchPairs, existing)
      .as[(Long, Long)].collect().toMap
    // Ground truth: global CC over ALL pairs, restricted to batch ids.
    val full = Dedup.dedupClusters(corpusPairs.union(batchPairs))
      .as[(Long, Long)].collect().toMap
      .filter { case (id, _) => id >= 10L }
    assert(incr == full, s"incremental $incr != full recompute $full")
    assert(incr == Map(10L -> 1L, 11L -> 3L, 12L -> 3L, 13L -> 13L,
      14L -> 13L, 15L -> 5L))
  }

  test("assignToClusters: a bridging doc adopts the min rep without merging") {
    // Doc 20 matches both standing clusters (reps 1 and 3): it adopts
    // min(1, 3) = 1; the standing assignment itself is immutable here —
    // the documented divergence from a full recompute (which would
    // merge 1 and 3). Corpus-×-corpus pairs in the input are ignored.
    val existing = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "cluster_rep")
    val pairs = Seq((20L, 2L), (20L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.assignToClusters(pairs, existing)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(20L -> 1L), out.toString)
  }

  test("incremental ingest loop: standing clusters persist, fold a batch, re-persist") {
    // The operational loop the incremental operators exist for:
    // standing assignment on disk -> load -> assign a new batch
    // against it -> union the result back -> persist. Round-trips
    // through parquet so the loop crosses session boundaries.
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val standing0 = (1L to 6L).toDF("id")
      .join(Dedup.dedupClusters(Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_rep"), col("id")).as("cluster_rep"))
    graft.sources.Sink.save(standing0, s"$dir/clusters")
    val loaded = spark.read.parquet(s"$dir/clusters")
    // Batch: 10 matched corpus doc 2 (cluster rep 1); 11 only touches
    // 10 via a batch edge — transitive adoption through the component.
    val assigned = Dedup.assignToClusters(
      Seq((10L, 2L), (11L, 10L)).toDF("id_a", "id_b"), loaded)
    graft.sources.Sink.save(loaded.union(assigned), s"$dir/clusters_v2")
    val reread = spark.read.parquet(s"$dir/clusters_v2")
      .as[(Long, Long)].collect().toMap
    assert(reread == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L,
      6L -> 6L, 10L -> 1L, 11L -> 1L))
  }

  test("exactGroups: one group per normalized text with min id and count") {
    val df = Seq((1L, "A  b"), (2L, "a b"), (3L, "other")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "text", "doc_id")
      .select("keep_id", "n_docs").as[(Long, Long)].collect().toSet
    assert(g == Set((1L, 2L), (3L, 1L)))
  }

  test("newAgainstCorpus keeps only batch rows whose fingerprint is unseen") {
    val corpus = Seq((1L, "shared text"), (2L, "corpus only")).toDF("doc_id", "text")
    // 11 matches corpus doc 1 up to case/whitespace; 12 is genuinely new.
    val batch = Seq((11L, "  Shared   TEXT "), (12L, "brand new doc")).toDF("doc_id", "text")
    val kept = Dedup.newAgainstCorpus(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(12L))
  }

  test("nearDupsAgainstCorpus pairs batch docs with corpus near-matches only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((1L, base), (2L, "totally unrelated corpus material here")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, base + " ok"), // near-dup of corpus doc 1 (tiny token delta)
      (12L, "completely different new content with other words entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.nearDupsAgainstCorpus(corpus, batch, "doc_id", "text")
    try {
      val hits = pairs.select("id_b", "id_c").as[(Long, Long)].collect().toSet
      assert(hits.contains((11L, 1L)), s"expected (11,1) in $hits")
      assert(!hits.exists(_._1 == 12L), s"doc 12 must have no corpus match: $hits")
    } finally pairs.unpersist()
  }

  test("decontaminate counts distinct shared word k-grams against the eval set") {
    val evalSet = Seq((100L, "a b c d e f")).toDF("doc_id", "text") // grams: abc bcd cde def
    val corpus = Seq(
      (1L, "a b c d e f"),          // all 4 grams shared
      (2L, "z z a b c z z"),        // only "a b c"
      (3L, "nothing in common here"),
      (4L, "a b c d a b c d")       // grams abc,bcd,cda,dab,... distinct-set ∩ = abc,bcd
    ).toDF("doc_id", "text")
    val r = Dedup.decontaminate(corpus, evalSet, "doc_id", "text",
      shingleK = 3, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    // doc 2 shares exactly 1 gram (< 2) and doc 3 none — both absent;
    // doc 4's repeats count ONCE (distinct shingles, so n_shared = 2).
    assert(r == Set((1L, 100L, 4L), (4L, 100L, 2L)))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: orthogonal 0, parallel 1, zero-vector 0 (not NaN)") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(2f, 4f)),
      (Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    val c = df.select(round(VectorFunctions.cosine(col("a"), col("b")), 9)).as[Double].collect().toSeq
    assert(c == Seq(0.0, 1.0, 0.0))
  }

  test("signBucket: deterministic bit per sign of leading coords") {
    val df = Seq(Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f, 99f)).toDF("v")
    // bits 0,2,4,6 set => 0b01010101 = 85
    assert(df.select(VectorFunctions.signBucket(col("v"), 8)).as[Long].head() == 85L)
  }

  test("bandSignKeys: all-positive=all bits set, all-negative=0, planes in range") {
    val dim = 8; val bands = 3; val bits = 5
    for (b <- 0 until bands) {
      val idxs = VectorFunctions.planeIndices(b, bits, dim)
      assert(idxs.forall(i => i >= 1 && i <= dim))
      assert(idxs.distinct.size == bits, s"band $b sampled with replacement: $idxs")
      assert(idxs.size == bits)
    }
    val df = Seq(
      (1L, Seq.fill(dim)(0.5f)),
      (2L, Seq.fill(dim)(-0.5f))).toDF("id", "v")
    val keys = df.select(col("id"),
        explode(VectorFunctions.bandSignKeys(col("v"), dim, bands, bits)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key")).as[(Long, Int, Long)].collect()
    assert(keys.count(_._1 == 1L) == bands)
    assert(keys.filter(_._1 == 1L).forall(_._3 == (1L << bits) - 1)) // every sign bit set
    assert(keys.filter(_._1 == 2L).forall(_._3 == 0L))
    assert(keys.map(_._2).distinct.sorted.toSeq == (0 until bands))
  }

  test("bucketedPairs observes short-vector drops (no silent caps) and still pairs the rest") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("graft.bucketedPairs").foreach(r => seen = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val corpus = Seq(
        (1L, Seq(1f, 1f, 1f, 1f)),
        (2L, Seq(1f, 1f, 1f, 0.9f)),
        (3L, Seq(1f, 1f)), // too short for dim=4 -> dropped, observed
        (4L, null.asInstanceOf[Seq[Float]])) // null -> dropped, observed
        .toDF("vec_id", "embedding")
      val pairs = Similarity.bucketedPairs(corpus, "vec_id", "embedding",
        dim = 4, nBands = 2, bitsPerBand = 2, minCosine = 0.5)
      val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)))
      // bucketedPairs is eager, so the metric fired during the call;
      // the listener bus is async -> poll briefly.
      val deadline = System.nanoTime() + 10e9.toLong
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.isDefined, "graft.bucketedPairs metrics never arrived")
      val m = seen.get
      assert(m.getAs[Long]("n_dropped_short") == 2L, m.toString)
      assert(m.getAs[Long]("n_keyed") == 2L, m.toString)
      pairs.unpersist()
    } finally spark.listenerManager.unregister(listener)
  }

  test("recallVsTruth survives shared-lineage inputs and scores hits/misses") {
    // gt and approx deliberately derive from the SAME frame — the
    // registered ann_recall query does too (both top-k runs read one
    // embeddings table), and a naive join formulation fails analysis
    // as an ambiguous self-join only at that point. Spec-level repro
    // so `sbt test` catches it, not just the driver's Verify run.
    val base = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 13L), (3L, 14L))
      .toDF("q_id", "n_id")
    val gt = base                                  // truth: all 6 pairs
    val approx = base.filter(col("n_id") =!= 12L)  // missed (2,12)
    val got = Similarity.recallVsTruth(gt, approx)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1.0), (2L, 1L, 0.5), (3L, 2L, 1.0),
      (-1L, 5L, 0.8333))) // mean over 6 truth rows, rounded to 4 dp
  }

  test("kmeansFit converges to exact cluster means with deterministic rounding") {
    // Two well-separated direction clusters; one seed in each. After
    // one Lloyd step the centroids are the (exactly computed) cluster
    // means; the second iteration reassigns identically, so iters=2
    // must reproduce the same centroids — a fixed point.
    val corpus = Seq(
      (10L, Seq(1f, 0.1f)), (11L, Seq(1f, -0.1f)), (12L, Seq(0.9f, 0f)),
      (20L, Seq(0.1f, 1f)), (21L, Seq(-0.1f, 1f)), (22L, Seq(0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val init = corpus.filter(col("vec_id").isin(10L, 20L))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val fit = Similarity.kmeansFit(corpus, init, "vec_id", "embedding", iters = 2)
      .select("c_id", "c_vec", "n_members")
      .as[(Long, Seq[Double], Long)].collect().sortBy(_._1)
    assert(fit.map(_._1).toSeq == Seq(10L, 20L))
    assert(fit.forall(_._3 == 3L))
    // mean x of cluster A: (1 + 1 + 0.9)/3 -> 0.966667 at 6 dp; y: 0.0
    assert(fit(0)._2 == Seq(0.966667, 0.0), fit(0)._2.toString)
    assert(fit(1)._2 == Seq(0.0, 0.966667), fit(1)._2.toString)
  }

  test("kmeansFit keeps plan size iteration-independent and rejects bad inputs") {
    // Round-4 review: each Lloyd iteration nested the full prior plan,
    // so iters=i re-executed all i-1 assignments (O(iters²) corpus
    // passes). The per-iteration localCheckpoint cuts that: the
    // returned plan must be the same (small) size at iters=1 and
    // iters=5, and the fixed point must still hold.
    val corpus = Seq(
      (10L, Seq(1f, 0.1f)), (11L, Seq(1f, -0.1f)), (12L, Seq(0.9f, 0f)),
      (20L, Seq(0.1f, 1f)), (21L, Seq(-0.1f, 1f)), (22L, Seq(0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val init = corpus.filter(col("vec_id").isin(10L, 20L))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    def planLen(iters: Int) = {
      val fit = Similarity.kmeansFit(corpus, init, "vec_id", "embedding", iters)
      (fit.queryExecution.analyzed.treeString.length,
        fit.select("c_id", "c_vec").as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq)
    }
    val (len1, r1) = planLen(1)
    val (len5, r5) = planLen(5)
    assert(r1 == r5, "iterating past the fixed point changed the centroids")
    assert(len5 <= len1 * 2,
      s"plan grew with iteration count: iters=1 -> $len1 chars, iters=5 -> $len5")

    // Contract errors are loud, not unresolved-column mysteries:
    val badInit = init.withColumnRenamed("c_vec", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansFit(corpus, badInit, "vec_id", "embedding", 1)
    }
    assert(e.getMessage.contains("c_vec"), e.getMessage)

    // Ragged vector lengths fail fast instead of producing wrong means.
    val ragged = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      Similarity.kmeansFit(ragged, Seq((5L, Seq(1f, 0.01f))).toDF("c_id", "c_vec"),
        "vec_id", "embedding", 1).collect()
    }
    assert(err.getMessage.contains("ragged"), err.getMessage)
  }

  test("kmeansFit drops seeds that attract no members") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0.02f)))
      .toDF("vec_id", "embedding")
    // Seed 7 is the opposite direction of everything -> empty cell.
    val init = Seq(
      (5L, Seq(1f, 0.01f)), (7L, Seq(-1f, 0f)))
      .toDF("c_id", "c_vec")
    val fit = Similarity.kmeansFit(corpus, init, "vec_id", "embedding", iters = 1)
    assert(fit.select("c_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("ann_recall registered query runs end-to-end at sf0.001") {
    val df = graft.SparkEntry.queries("ann_recall")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect()
    val summary = df.filter(_._1 == -1L)
    assert(summary.length == 1, s"missing q_id=-1 summary row: ${df.mkString(",")}")
    assert(df.forall { case (_, hits, rec) => hits >= 0 && rec >= 0.0 && rec <= 1.0 })
    assert(df.length > 1, "no per-query rows")
  }

  test("bruteForceTopK returns k nearest by rounded cosine with id tie-break") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0.01f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0.1f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 2)
      .select("n_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L))
  }

  test("nswGraph bounds out-degree and keeps the best edges symmetric-sourced") {
    // 6 vectors in two direction clusters, 4-dim so tiny band keys
    // still collide within clusters. degree=2 must cut each node to
    // its two best neighbors by (cos desc, dst asc).
    val vecs = Seq(
      (1L, Seq(1f, 0.01f, 0f, 0f)), (2L, Seq(1f, 0.02f, 0f, 0f)),
      (3L, Seq(1f, 0.03f, 0f, 0f)), (4L, Seq(0f, 0f, 1f, 0.01f)),
      (5L, Seq(0f, 0f, 1f, 0.02f)), (6L, Seq(0f, 0f, 1f, 0.03f)))
      .toDF("vec_id", "embedding")
    val g = Similarity.nswGraph(vecs, "vec_id", "embedding",
      dim = 4, nBands = 2, bitsPerBand = 2, degree = 2)
      .as[(Long, Long, Double)].collect()
    val bySrc = g.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 2),
      s"out-degree above bound: ${g.mkString(",")}")
    assert(g.forall { case (s, d, _) => s != d }, "self-edge in graph")
    // Every edge that exists must connect same-cluster nodes here:
    // the two clusters are orthogonal (cos 0), so any candidate pair
    // crossing clusters would rank below within-cluster ones.
    g.foreach { case (s, d, cos) =>
      if ((s <= 3) == (d <= 3)) assert(cos > 0.99, s"weak within-cluster edge ($s,$d,$cos)")
    }
  }

  test("nswSearch walks the graph to neighbors the entry points miss") {
    // A chain graph 1-2-3-4-5-...-8 over one direction cluster with a
    // slowly rotating angle: entry point is id 1 only; the true
    // nearest of the query (placed at the far end) is reachable only
    // by hopping — one hop per round, so rounds=7 must find id 8
    // (and the greedy beam keeps walking toward the query every
    // round because cos increases monotonically along the chain).
    import scala.math.{cos => mcos, sin => msin}
    val n = 8
    val vecs = (1 to n).map { i =>
      val a = (i - 1) * 0.15
      (i.toLong, Seq(mcos(a).toFloat, msin(a).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    // Hand-built chain graph (both directions), bypassing LSH so the
    // test isolates the SEARCH contract from candidate generation.
    val graph = (1 until n).flatMap { i =>
      Seq((i.toLong, (i + 1).toLong, 0.99), ((i + 1).toLong, i.toLong, 0.99))
    }.toDF("src", "dst", "cos")
    val query = Seq((100L, Seq(mcos(7 * 0.15).toFloat, msin(7 * 0.15).toFloat, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.nswSearch(query, vecs, graph, "vec_id", "embedding",
      k = 1, beamWidth = 4, rounds = 7, nEntries = 1)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._2 == 8L,
      s"beam search failed to reach the far end: ${got.mkString(",")}")

    // Trace parity (round 17): one shared chain's arm at round r is
    // byte-identical to a separate rounds=r search — the contract the
    // rounds-curve registration rides on.
    val arms = Similarity.nswSearchTrace(query, vecs, graph, "vec_id", "embedding",
      k = 1, beamWidth = 4, roundsWanted = Seq(2, 7), nEntries = 1)
    val sep = Seq(2, 7).map(r =>
      Similarity.nswSearch(query, vecs, graph, "vec_id", "embedding",
        k = 1, beamWidth = 4, rounds = r, nEntries = 1)
        .as[(Long, Long, Double)].collect().toSet)
    val traced = arms.map(_.as[(Long, Long, Double)].collect().toSet)
    assert(traced == sep, s"trace arms $traced != separate searches $sep")
  }

  test("nswAutoBits: smallest bits with N>>bits <= 3*degree, clamped to [4,24]") {
    // The documented sizing rule, integer-only so DuckDB replays it:
    // the three fixture points the r16 bench measured, the clamps,
    // and monotonicity (more data never narrows the bands).
    assert(Similarity.nswAutoBits(500L, 12) == 4)
    assert(Similarity.nswAutoBits(2000L, 12) == 6)   // = the sf0.1 tuning point
    assert(Similarity.nswAutoBits(20000L, 12) == 10) // = NswScaleBench's 6x-cheaper point
    assert(Similarity.nswAutoBits(0L, 12) == 4)
    assert(Similarity.nswAutoBits(1000000000L, 12) == 24) // clamp; hot-bucket split guards past here
    val seq = (1 to 30).map(i => Similarity.nswAutoBits(1L << i, 12))
    assert(seq == seq.sorted, s"not monotone in n: $seq")
    // Exact boundary: n >> 4 == 36 stays at 4; one more row crosses.
    assert(Similarity.nswAutoBits(36L << 4, 12) == 4)
    assert(Similarity.nswAutoBits((36L << 4) + 16, 12) == 5)
  }

  test("nswGraph default banding equals an explicit nswAutoBits(n) build") {
    val vecs = (1L to 40L).map { i =>
      (i, (0 until 64).map(d => if (((i + d) % 3) == 0) 1f else -1f))
    }.toDF("vec_id", "embedding")
    val auto = Similarity.nswGraph(vecs, "vec_id", "embedding", degree = 6)
      .as[(Long, Long, Double)].collect().toSet
    val pinned = Similarity.nswGraph(vecs, "vec_id", "embedding",
      bitsPerBand = Similarity.nswAutoBits(40L, 6), degree = 6)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == pinned, "auto-sized build differs from the rule's explicit build")
  }

  test("nswGraph reserves two long-range (weakest) links when candidates exceed degree") {
    // 8 vectors fanning 0..1.4 rad in one plane, all coordinates
    // positive so a 1-band/1-bit key puts EVERY pair in one bucket:
    // node 1 sees 7 candidates, degree 6 must keep the 4 nearest
    // (ids 2..5) plus the 2 FARTHEST (ids 7, 8 — the navigable-small-
    // world long-range links), and drop the middle (id 6).
    import scala.math.{cos => mcos, sin => msin}
    val vecs = (1 to 8).map { i =>
      val a = (i - 1) * 0.2
      (i.toLong, Seq(mcos(a).toFloat, msin(a).toFloat + 0.001f, 0.1f, 0.1f))
    }.toDF("vec_id", "embedding")
    val g = Similarity.nswGraph(vecs, "vec_id", "embedding",
      dim = 4, nBands = 1, bitsPerBand = 1, degree = 6)
      .as[(Long, Long, Double)].collect()
    val n1 = g.filter(_._1 == 1L).map(_._2).toSet
    assert(n1 == Set(2L, 3L, 4L, 5L, 7L, 8L),
      s"expected 4 near + 2 far links for node 1, got $n1")
  }

  test("nswInsert equals a full rebuild when no bucket is hot (fold = rebuild)") {
    // Two direction clusters; corpus = 6 nodes, batch = 2 arrivals
    // (one per cluster). With every bucket under the cap the routed
    // incremental candidates are exactly the joint build's, so the
    // updated graph must EQUAL nswGraph over corpus ∪ batch — the
    // index-fold identity the incremental dedup family pins.
    val mk = (id: Long, a: Float, b: Float, c: Float, d: Float) =>
      (id, Seq(a, b, c, d))
    val corpus = Seq(
      mk(1L, 1f, 0.01f, 0f, 0f), mk(2L, 1f, 0.02f, 0f, 0f), mk(3L, 1f, 0.03f, 0f, 0f),
      mk(4L, 0f, 0f, 1f, 0.01f), mk(5L, 0f, 0f, 1f, 0.02f), mk(6L, 0f, 0f, 1f, 0.03f))
      .toDF("vec_id", "embedding")
    val batch = Seq(mk(10L, 1f, 0.015f, 0f, 0f), mk(11L, 0f, 0f, 1f, 0.015f))
      .toDF("vec_id", "embedding")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    val standing = Similarity.nswGraph(corpus, "vec_id", "embedding",
      dim = 4, nBands = 2, bitsPerBand = 2, degree = 3)
    val folded = Similarity.nswInsert(standing, corpus, batch, "vec_id", "embedding",
      dim = 4, nBands = 2, bitsPerBand = 2, degree = 3)
    val rebuilt = Similarity.nswGraph(corpus.unionByName(batch), "vec_id", "embedding",
      dim = 4, nBands = 2, bitsPerBand = 2, degree = 3)
    assert(edges(folded) == edges(rebuilt),
      s"fold != rebuild:\n folded=${edges(folded)}\n rebuilt=${edges(rebuilt)}")
  }

  test("ann_nsw_recall_manifold registered query runs end-to-end at sf0.001") {
    val df = graft.SparkEntry.queries("ann_nsw_recall_manifold")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect()
    val summary = df.filter(_._1 == -1L)
    assert(summary.length == 1, s"missing q_id=-1 summary row: ${df.mkString(",")}")
    assert(df.forall { case (_, hits, rec) => hits >= 0 && rec >= 0.0 && rec <= 1.0 })
    assert(df.length > 1, "no per-query rows")
  }
}

class RerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Deterministic non-trivial vectors: 8-dim, mixed signs/magnitudes.
  private def vecs(n: Int) = (0 until n).map { i =>
    (i.toLong, (0 until 8).map(d =>
      (math.sin(i * 31 + d * 7) * (1 + (d % 3))).toFloat))
  }.toDF("vec_id", "embedding")

  test("int8RerankTopK with corpus-covering shortlist IS the exact top-k") {
    val corpus = vecs(30)
    val queries = corpus.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect().toSet
    // factor 6 -> shortlist 30 = whole corpus: stage 2 must reproduce
    // the exact ranking bit-for-bit (same rounded cosine + tie-break).
    val rr = Similarity.int8RerankTopK(queries, corpus, "vec_id", "embedding", 5,
        shortlistFactor = 6)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect().toSet
    assert(rr == exact)
  }

  test("rerank recall >= one-stage int8 recall on the same fixture") {
    val corpus = vecs(60)
    val queries = corpus.filter($"vec_id" < 5)
    val gt = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallVsTruth(gt, df).filter($"q_id" === -1L)
        .select($"recall").as[Double].head()
    val one = mean(Similarity.int8TopK(queries, corpus, "vec_id", "embedding", 5))
    val two = mean(Similarity.int8RerankTopK(queries, corpus, "vec_id", "embedding", 5, 3))
    assert(two >= one, s"rerank $two < one-stage $one")
  }
}

class BloomPrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("newAgainstCorpusBloom result is identical to the plain anti-join") {
    val corpus = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha  TEXT "),  // normalizes to a corpus dup
      (11L, "delta fresh"),
      (12L, "gamma"),          // exact corpus dup
      (13L, "epsilon new")).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().toSet
    val plain = ids(Dedup.newAgainstCorpus(corpus, batch, "doc_id", "text"))
    val bloomed = ids(Dedup.newAgainstCorpusBloom(corpus, batch, "doc_id", "text", 1000L))
    assert(plain == Set(11L, 13L))
    assert(bloomed == plain)
  }

  test("empty corpus: every batch row is definitely new (null-bloom edge)") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Dedup.newAgainstCorpusBloom(corpus, batch, "doc_id", "text", 10L)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("undersized bloom (high FP rate) still yields the exact result") {
    // expectedItems=1 for a 500-key corpus: most batch rows become
    // maybe-present and route through the verify join — the result
    // must not change.
    val corpus = (0 until 500).map(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    val batch = (450 until 520).map(i => (1000L + i, s"doc body $i")).toDF("doc_id", "text")
    val out = Dedup.newAgainstCorpusBloom(corpus, batch, "doc_id", "text", 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == (500 until 520).map(i => 1000L + i).toSet)
  }
}

class PhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dHash: monotone payload sets all 56 bits, reversed sets none") {
    val up = (0 until 64).map(_.toByte).toArray
    val down = up.reverse
    val df = Seq((1L, up), (2L, down)).toDF("id", "p")
    val out = df.select($"id", Multimodal.dHash($"p").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == (1L << 56) - 1)
    assert(out(2L) == 0L)
  }

  test("dHash ignores bytes beyond the 8x8 grid; short payloads are deterministic") {
    val base = (0 until 64).map(i => ((i * 37) % 251).toByte).toArray
    val longer = base ++ Array[Byte](9, 9, 9)
    val df = Seq((1L, base), (2L, longer)).toDF("id", "p")
    val out = df.select($"id", Multimodal.dHash($"p").as("h")).as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    // 63-byte payload: the missing byte 64 reads null -> bit (7,6) = 0
    val short = base.take(63)
    val h = Seq((3L, short)).toDF("id", "p")
      .select(Multimodal.dHash($"p")).as[Long].head()
    assert((h & (1L << 55)) == 0L)
  }

  test("phashPairs: re-encode pairs at hamming<=1, unrelated payloads never pair") {
    val a = (0 until 64).map(i => ((i * 31 + 7) % 256).toByte).toArray
    val aFlip = a.clone(); aFlip(63) = 0x00.toByte
    val b = (0 until 64).map(i => ((i * 131 + 17) % 256).toByte).toArray
    val df = Seq((1L, a), (2L, aFlip), (3L, b)).toDF("media_id", "payload")
    val pairs = Multimodal.phashPairs(df, "media_id", "payload")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(pairs.forall(_._3 <= 1))
  }
}

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pqTopK is exact when the corpus IS the codebook (lossless encode)") {
    // 16 rows, all distinct in both subspace halves: kmeansInit picks
    // all of them as seeds, every vector encodes to itself at d=0, and
    // ADC distance collapses to the exact squared L2 — so PQ ranking
    // must equal the exact cosine ranking (monotone on unit vectors).
    val vecs = (0 until 16).map { i =>
      (i.toLong, (0 until 8).map(d => (math.cos(i * 13 + d * 5) * (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val exact = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(queries, vecs, "vec_id", "embedding",
        dim = 8, k = 5, m = 2, ks = 16)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(pq == exact)
  }

  test("pqTopK: approximate distances are plausible and self is excluded") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(d => (math.sin(i * 17 + d * 3) + 0.1 * d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs.filter($"vec_id" < 3), vecs, "vec_id", "embedding",
        dim = 8, k = 5, m = 2, ks = 8)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 15)                       // 3 queries x k
    assert(out.forall(r => r._1 != r._2))          // no self-match
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 4.000001)) // unit-sphere L2^2 range
  }
}

class IncrEmbedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nearDupsAgainstCorpusEmbed finds a planted corpus twin, never corpus x corpus") {
    val dim = 64
    def vec(seed: Int) = (0 until dim).map(d => (math.sin(seed * 31 + d * 7)).toFloat)
    val corpus = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    // batch: one exact twin of corpus row 5, plus unrelated vectors
    val batch = (Seq((100L, vec(5))) ++ (101 until 110).map(i => (i.toLong, vec(i * 997))))
      .toDF("vec_id", "embedding")
    val pairs = graft.operators.Similarity.nearDupsAgainstCorpusEmbed(
        corpus, batch, "vec_id", "embedding", dim, nBands = 6, bitsPerBand = 12,
        minCosine = 0.9)
      .select($"id_b", $"id_c", $"cos").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 100L && p._2 == 5L && p._3 > 0.999),
      s"twin must be found: ${pairs.toSeq}")
    // every pair is batch x corpus: batch ids >= 100, corpus ids < 40
    assert(pairs.forall(p => p._1 >= 100L && p._2 < 40L))
  }
}

class LoadSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("load infers format from extension; csv honors the header flag (S1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_load").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.csv(s"$dir/t.csv")
    Seq((3, "c")).toDF("id", "v").write.parquet(s"$dir/t.parquet")
    assert(sources.Load.load(spark, s"$dir/t.parquet").count() == 1)
    assert(sources.Load.load(spark, s"$dir/t.csv", headerRow = false).count() == 2)
    // Round 11: .xls dispatches to the native BIFF8 reader (XlsSpec
    // covers real content; here the missing FILE is the failure,
    // proving the extension reaches the reader instead of the old
    // guided error).
    val e = intercept[IllegalArgumentException](sources.Load.load(spark, s"$dir/t.xls"))
    assert(e.getMessage.contains("no such file"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](sources.Load.load(spark, s"$dir/t.txt"))
    assert(e2.getMessage.contains("unsupported extension"), e2.getMessage)
  }

  test("ANN index round-trips through saveIndex/loadIndex bit-identically") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val init = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val fitted = Similarity.kmeansFit(emb.filter(col("embedding").isNotNull),
      init, "vec_id", "embedding", iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_index").toString + "/ivf"
    val params = Map("metric" -> "cosine", "trained_iters" -> "2",
      "note" -> "escape \"check\" \\ here")
    graft.sources.Sink.saveIndex(fitted, dir, params)
    val (loaded, gotParams) = graft.sources.Load.loadIndex(spark, dir)
    assert(gotParams == params, gotParams.toString)
    // Search with the loaded centroids must be bit-identical to
    // searching with the in-session ones (the restartability contract).
    def search(cents: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKProbed(
        emb.filter(col("vec_id") >= 10 && col("vec_id") < 15), emb,
        cents.select(col("c_id"), col("c_vec")),
        "vec_id", "embedding", k = 3, nprobe = 2)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(search(fitted) == search(loaded))
  }

  test("loadEvolved reconciles drifted part-file schemas; plain read drops the late column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = sources.Load.loadEvolved(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    // The pre-drift file surfaces the late column as null, not an error.
    assert(rows == Map(1L -> None, 2L -> Some(9.5)))
  }

  test("explicit-schema load runs NO inference job and types the columns (S1 at scale)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_load_schema").toString
    Seq((1, "a", 2.5), (2, "b", 3.5)).toDF("id", "v", "x")
      .write.option("header", "true").csv(s"$dir/t.csv")
    Seq((1, "a")).toDF("id", "v").write.json(s"$dir/t.json")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("x", DoubleType)))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // With a schema: constructing the frame is pure planning — the
      // inference pre-pass (a real Spark job for CSV and JSON) is gone.
      val csv = sources.Load.load(spark, s"$dir/t.csv", schema)
      val json = sources.Load.load(spark, s"$dir/t.json",
        StructType(schema.fields.take(2)))
      // The listener bus is async (and private); give stray events a
      // beat to land before asserting none arrived.
      Thread.sleep(1000)
      assert(jobs.get() == 0, s"schema-supplied load still ran ${jobs.get()} inference job(s)")
      assert(csv.schema == schema)
      // ...and the data actually reads with the declared types.
      assert(csv.as[(Long, String, Double)].collect().toSet ==
        Set((1L, "a", 2.5), (2L, "b", 3.5)))
      assert(json.as[(Long, String)].collect().toSet == Set((1L, "a")))
      // Control: the inference path DOES run pre-pass jobs. (collect()
      // above already bumped the counter; snapshot around the load.)
      val before = jobs.get()
      sources.Load.load(spark, s"$dir/t.csv")
      val deadline = System.nanoTime() + 10e9.toLong
      while (jobs.get() == before && System.nanoTime() < deadline) Thread.sleep(50)
      assert(jobs.get() > before, "expected the inferSchema default to run an inference job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("requireColumns passes valid frames and names the missing ones") {
    val df = Seq((1, "x")).toDF("a", "b")
    assert(sources.Load.requireColumns(df, Seq("a", "b")) eq df)
    val e = intercept[IllegalArgumentException](
      sources.Load.requireColumns(df, Seq("a", "zz", "ww")))
    assert(e.getMessage.contains("zz") && e.getMessage.contains("ww"))
  }

  test("describe lists name/type/nullability per column (S3/S4)") {
    val out = sources.Load.describe(spark, Seq((1L, "x")).toDF("id", "v"))
      .as[(String, String, Boolean)].collect().toSeq
    assert(out == Seq(("id", "bigint", false), ("v", "string", true)))
  }

  test("saltedJoin equals the plain join for inner, left, right, and full") {
    val large = (1 to 100).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0, "zero"), (1, "one"), (99, "unmatched")).toDF("k", "name")
    for (how <- Seq("inner", "left", "right", "full")) {
      val plain = large.join(small, Seq("k"), how)
        .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
      val salted = operators.Skew.saltedJoin(large, small, Seq("k"), salts = 4, how)
        .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
      assert(salted == plain, how)
    }
  }

  test("keyHistogram ranks hot keys first") {
    val df = (Seq.fill(10)(1) ++ Seq.fill(3)(2) ++ Seq(3)).map(k => (k, "x")).toDF("k", "v")
    val top = operators.Skew.keyHistogram(df, Seq("k")).as[(Int, Long)].collect().toSeq
    assert(top == Seq((1, 10L), (2, 3L), (3, 1L)))
  }

  test("trainTestSplit is deterministic, exhaustive, and ~testPct sized") {
    val df = (1L to 1000L).toDF("id")
    val s1 = operators.Sampling.trainTestSplit(df, "id", 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val s2 = operators.Sampling.trainTestSplit(df, "id", 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(s1 == s2)                          // rerun-stable
    assert(s1.values.sum == 1000)             // exhaustive partition
    assert(s1("test") > 50 && s1("test") < 200) // ~10% of 1000
    // sample == the test half of the split
    assert(operators.Sampling.deterministicSample(df, "id", 10).count() == s1("test"))
  }

  test("stratifiedSample applies per-stratum rates with nested membership") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "big" else "small"))
      .toDF("id", "stratum")
    val keep20 = operators.Sampling
      .stratifiedSample(df, "id", "stratum", Map("big" -> 20), defaultPct = 100)
    val keep10 = operators.Sampling
      .stratifiedSample(df, "id", "stratum", Map("big" -> 10), defaultPct = 100)
    val by20 = keep20.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(by20("small") == 1000)                      // default 100% untouched
    assert(by20("big") > 120 && by20("big") < 280)     // ~20% of 1000
    // Lowering a rate drops a SUBSET — membership is nested, never
    // reshuffled (the property that makes rate changes resumable).
    val ids20 = keep20.filter($"stratum" === "big").select("id").as[Long].collect().toSet
    val ids10 = keep10.filter($"stratum" === "big").select("id").as[Long].collect().toSet
    assert(ids10.subsetOf(ids20) && ids10.size < ids20.size)
  }

  test("iqrFilter trims outliers per group and keeps null-keyed groups") {
    val rows = (1L to 100L).map(v => (Some("a"), v.toDouble)) ++
      Seq((Some("a"), 10000.0)) ++                      // the outlier
      (1L to 50L).map(v => (None: Option[String], v.toDouble))
    val df = rows.toDF("grp", "v")
    val out = operators.Cleaning.iqrFilter(df, "v", Seq("grp"))
    val byGrp = out.groupBy("grp").count().as[(Option[String], Long)].collect().toMap
    assert(byGrp(Some("a")) == 100, "inliers kept, the 10000.0 outlier fenced out")
    // The null key is a real group: a null-unsafe fence join would
    // silently drop all 50 of these inliers.
    assert(byGrp(None) == 50)
    // The winsorize twin keeps every row and clamps the outlier to the
    // upper fence instead of dropping it.
    val withNull = df.union(Seq((Some("a"), Option.empty[Double])).toDF("grp", "v"))
    val clamped = operators.Cleaning.iqrClamp(withNull, "v", Seq("grp"))
    assert(clamped.count() == withNull.count())
    val maxA = clamped.filter($"grp" === "a").agg(max($"v")).as[Double].head()
    assert(maxA < 10000.0 && maxA > 100.0, s"outlier should clamp to the fence, got $maxA")
    // Null values STAY null (greatest/least skip nulls — without the
    // guard the null row would exit holding the lower fence).
    assert(clamped.filter($"v".isNull).count() == 1)
    // The column keeps its declared type (fence arithmetic is double).
    assert(clamped.schema("v").dataType == withNull.schema("v").dataType)
  }

  test("madFilter keeps |v-med| <= k*MAD per group; MAD=0 group keeps only the median (C16)") {
    // group a: median 50, deviations 0..49 -> MAD ~ 25; k=1 keeps |v-50| <= 25.
    val rows = (1L to 99L).map(v => (Some("a"), v.toDouble)) ++
      Seq((Some("a"), 100000.0)) ++                 // far outlier
      Seq.fill(8)((Some("b"), 7.0)) ++ Seq((Some("b"), 1.0), (Some("b"), 99.0)) ++
      (1L to 50L).map(v => (None: Option[String], v.toDouble))
    val df = rows.toDF("grp", "v")
    val out = operators.Cleaning.madFilter(df, "v", Seq("grp"), k = 1.0)
    val byGrp = out.groupBy("grp").count().as[(Option[String], Long)].collect().toMap
    // a: med=50 (100 values, disc takes 50th), MAD=med(|v-50|)=25 over
    // devs {0..50, 99950}: keep 25..75 => 51 rows.
    assert(byGrp(Some("a")) == 51)
    // b: >50% of values identical (7.0) => MAD=0 => only exact-median rows.
    assert(byGrp(Some("b")) == 8)
    assert(out.filter($"grp" === "b").select("v").as[Double].collect().forall(_ == 7.0))
    // null group key is a real group, survives the null-safe stat
    // joins: med=25, MAD=12 -> keep 13..37 = 25 rows.
    assert(byGrp(None) == 25)
    // the outlier is gone
    assert(out.agg(max($"v")).as[Double].head() < 100000.0)
    // Sketch twin: same shape, far outlier still trimmed (sketch
    // medians land near the exact ones at this scale), row count
    // bounded by the input.
    val ap = operators.Cleaning.madFilter(df, "v", Seq("grp"), k = 1.0, approx = true)
    assert(ap.count() <= df.count() && ap.count() > 0)
    assert(ap.agg(max($"v")).as[Double].head() < 100000.0)
  }

  test("balancedDownsample cuts every stratum to ~the smallest") {
    val df = ((1L to 1600L).map(i => (i, "en")) ++ (2001L to 2200L).map(i => (i, "pt")))
      .toDF("id", "lang")
    val out = operators.Sampling.balancedDownsample(df, "id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // Smallest stratum keeps everything (its rate is n_min/n = 1:
    // bucket * 200 < 200 * 1e6 holds for every bucket).
    assert(out("pt") == 200)
    assert(out("en") > 120 && out("en") < 280)      // ~200 of 1600
    // Deterministic: rerun identical.
    val again = operators.Sampling.balancedDownsample(df, "id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(out == again)
  }

  test("mixtureSample hits the target ratio at the binding stratum; off-spec strata drop (SA3)") {
    val df = ((1L to 1000L).map(i => (i, "en")) ++
      (5001L to 5300L).map(i => (i, "zh")) ++
      (9001L to 9100L).map(i => (i, "pt")))
      .toDF("id", "lang")
    val out = operators.Sampling
      .mixtureSample(df, "id", "lang", Map("en" -> 3, "zh" -> 1))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // zh is binding (300/1 < 1000/3): it keeps everything; en is cut
    // to ~3× zh = ~900; pt is not in the mixture spec → dropped.
    assert(out("zh") == 300)
    assert(out("en") > 840 && out("en") < 960)
    assert(!out.contains("pt"))
    // Deterministic: rerun identical.
    val again = operators.Sampling
      .mixtureSample(df, "id", "lang", Map("en" -> 3, "zh" -> 1))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(out == again)
    // All weights equal degenerates to balancedDownsample's contract.
    val eq = operators.Sampling
      .mixtureSample(df, "id", "lang", Map("en" -> 1, "zh" -> 1))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(eq("zh") == 300 && eq("en") > 240 && eq("en") < 360)
  }

  test("temperatureSample: α=1/2 targets, rarest stratum kept whole, null strata drop (SA3b)") {
    val df = ((1L to 1600L).map(i => (i, "en")) ++
      (5001L to 5400L).map(i => (i, "zh")) ++
      (9001L to 9100L).map(i => (i, "pt")) ++
      Seq((9999L, null.asInstanceOf[String])))
      .toDF("id", "lang")
    val out = operators.Sampling.temperatureSample(df, "id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // n_m = 100 (pt). Targets: pt √(100·100)=100 (kept WHOLE — the
    // α-mixing property), zh ⌊√(100·400)⌋=200, en ⌊√(100·1600)⌋=400.
    // The md5 keep test realizes take/n in expectation; pt is exact
    // (take = n ⇒ bucket·n < n·B always holds).
    assert(out("pt") == 100)
    assert(out("zh") > 160 && out("zh") < 240)
    assert(out("en") > 340 && out("en") < 460)
    assert(out.keySet == Set("en", "zh", "pt"))     // null stratum dropped
    // Deterministic: rerun identical.
    val again = operators.Sampling.temperatureSample(df, "id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(out == again)
  }

  test("quantizeInt8: ±127 extremes, bounded reconstruction error, zero vectors dropped (N10)") {
    val df = Seq(
      (1L, Array(0.6f, -0.8f, 0.0f)),
      (2L, Array(0.1f, 0.1f, 0.1f)),
      (3L, Array(0.0f, 0.0f, 0.0f)))         // zero vector → dropped
      .toDF("vec_id", "embedding")
    val out = operators.Similarity.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    // Largest-|coordinate| always lands on ±127; all codes within range.
    assert(out.forall(r => r._2.map(math.abs).max == 127))
    assert(out.forall(r => r._2.forall(q => q >= -127 && q <= 127)))
    // Reconstruction (q_i * scale) is within half a step of the unit
    // vector everywhere — the quantizer's defining error bound.
    for ((_, qv, scale) <- out) {
      val unitNorm = qv.map(q => q * scale)
      assert(math.abs(unitNorm.map(x => x * x).sum - 1.0) < 0.02)
    }
    // Unit-vector direction survives: doc1's unit vec is (0.6, -0.8, 0).
    val d1 = out.head._2.map(_ * out.head._3)
    assert(math.abs(d1(0) - 0.6) <= out.head._3 / 2 + 1e-12)
    assert(math.abs(d1(1) + 0.8) <= out.head._3 / 2 + 1e-12)
    // int8TopK ranks the quantized cosine: with these vectors doc2 is
    // equidistant-ish, just assert the search returns k rows per query
    // and is deterministic.
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 3)
    val r1 = operators.Similarity.int8TopK(q, emb, "vec_id", "embedding", k = 5)
    assert(r1.groupBy("q_id").count().as[(Long, Long)].collect().forall(_._2 == 5))
    val r2 = operators.Similarity.int8TopK(q, emb, "vec_id", "embedding", k = 5)
    assert(r1.collect().toSet == r2.collect().toSet)
  }

  test("kmeansInit picks k deterministic seeds that feed kmeansFit directly") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("embedding").isNotNull)
    val s1 = operators.Similarity.kmeansInit(emb, "vec_id", "embedding", k = 4)
    val s2 = operators.Similarity.kmeansInit(emb, "vec_id", "embedding", k = 4)
    val ids1 = s1.select("c_id").as[Long].collect().toSeq
    assert(ids1.length == 4 && ids1 == s2.select("c_id").as[Long].collect().toSeq)
    // TakeOrdered, not a global sort of the corpus.
    assert(s1.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // The schema contract chains straight into a fit.
    val fitted = operators.Similarity.kmeansFit(emb, s1, "vec_id", "embedding", iters = 1)
    assert(fitted.count() >= 1)
  }

  test("ivfAssign picks the nearest centroid with id tie-break") {
    val corpus = Seq(
      (10L, Seq(1f, 0f)), (11L, Seq(0f, 1f)), (12L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val centroids = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("c_id", "c_vec")
    val cells = operators.Similarity.ivfAssign(corpus, centroids, "vec_id", "embedding")
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }
}

class PendentesApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unioned = operators.Pendentes.unionSemanas(Seq(
    "Semana -1" -> Seq(("PENDENTE", 10.0), ("GANHO", 5.0)).toDF("status_processo", "valor_proposta"),
    "Semana Atual" -> Seq(("PENDENTE", 20.0), ("PENDENTE", 30.0)).toDF("status_processo", "valor_proposta")))

  test("metrics: one-pass count / distinct weeks / total (A4-A6)") {
    val r = operators.Pendentes.metrics(unioned).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getDouble(2) == 60.0)
  }

  test("semanas lists distinct weeks sorted; filterSemana restricts (A12/F2)") {
    assert(operators.Pendentes.semanas(unioned).as[String].collect().toSeq ==
      Seq("Semana -1", "Semana Atual"))
    assert(operators.Pendentes.filterSemana(unioned, "Semana Atual").count() == 2)
  }

  test("dedupeByKey keeps exactly the first row per key by explicit order (J3)") {
    val df = Seq(("k1", 2, "late"), ("k1", 1, "early"), ("k2", 5, "only"))
      .toDF("cliente", "ord", "v")
    val out = operators.Enrich.dedupeByKey(df, Seq("cliente"), Seq("ord"))
      .select("cliente", "v").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "early", "k2" -> "only"))
  }

  test("formatCurrency/formatPercent render like the reference (C7/C8)") {
    val r = Seq((1234.5, 0.1234), (Double.NaN, Double.NaN)).toDF("v", "p")
      .select(Views.formatCurrency(when(isnan(col("v")), lit(null)).otherwise(col("v"))),
        Views.formatPercent(when(isnan(col("p")), lit(null)).otherwise(col("p") * 100)))
      .as[(String, String)].collect()
    assert(r(0) == (("R$ 1,234.50", "12.34%")))
    assert(r(1) == (("", "")))
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stubDecoder: L1-normalized 16-bin byte histogram") {
    val f = Multimodal.stubDecoder(Array[Byte](0, 1, 15, 16, -1)) // bins 0,0,0,1,15
    assert(f.length == 16)
    assert(f(0) == 0.6f && f(1) == 0.2f && f(15) == 0.2f)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("decodeFeatures preserves ids and byte counts through batching") {
    val media = Multimodal.syntheticMedia(
      Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", blocks = 2)
    val items = media.as[MediaItem]
    val out = Multimodal.decodeFeatures(items, batchSize = 2).collect()
    assert(out.length == 3)
    assert(out.forall(_.n_bytes == 32)) // 2 md5 blocks = 32 bytes
    assert(out.map(_.media_id).toSet == Set(0L, 1L, 2L))
    assert(out.forall(f => math.abs(f.features.sum - 1.0f) < 1e-5))
    // determinism: same payload -> same features
    val again = Multimodal.decodeFeatures(items, batchSize = 1).collect()
    assert(out.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("frameSample slices every k-th frame of the payload") {
    val df = Seq((Array.range(0, 12).map(_.toByte), 6)).toDF("payload", "n_frames")
    val frames = df.select(Multimodal.frameSample(col("payload"), col("n_frames"),
      frameBytes = 2, everyK = 2)).as[Seq[Array[Byte]]].head()
    assert(frames.length == 3) // frames 0, 2, 4
    assert(frames(0).toSeq == Seq[Byte](0, 1))
    assert(frames(1).toSeq == Seq[Byte](4, 5))
    assert(frames(2).toSeq == Seq[Byte](8, 9))
  }

  test("resizeStub shrinks metadata to maxSide, flags resized") {
    val df = Seq((800, 600), (320, 240)).toDF("width", "height")
    val out = Multimodal.resizeStub(df, maxSide = 400)
      .select("width", "height", "resized").as[(Int, Int, Boolean)].collect().toSeq
    assert(out.contains((400, 300, true)))
    assert(out.contains((320, 240, false)))
  }
}

class SinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saveFactByYear writes year partitions and round-trips (S6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val fact = Seq(("1995-03-01", 10.0), ("1996-07-01", 20.0), ("1996-08-01", 30.0))
      .toDF("dt_entrada", "valor").withColumn("dt_entrada", to_date(col("dt_entrada")))
    sources.Sink.saveFactByYear(fact, s"$dir/fact")
    val back = spark.read.parquet(s"$dir/fact")
    assert(back.count() == 3)
    assert(back.select("ano").distinct().as[Int].collect().toSet == Set(1995, 1996))
    val dirs = new java.io.File(s"$dir/fact").listFiles().map(_.getName).filter(_.startsWith("ano="))
    assert(dirs.toSet == Set("ano=1995", "ano=1996"))
  }

  test("saveTimestamped uses the injected clock in the path (S6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val p = sources.Sink.saveTimestamped(Seq(1, 2).toDF("x"), dir, "export",
      clock = () => "20260101_000000")
    assert(p == s"$dir/export_20260101_000000")
    assert(spark.read.parquet(p).count() == 2)
  }

  test("shardAssign + saveSharded: deterministic shards, physically ordered files (round-trip)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString
    val df = (0L until 200L).map(i => (i, s"payload_$i")).toDF("id", "payload")
    val sharded = operators.Sampling.shardAssign(df, "id", nShards = 4)
    // Partitioning-invariance: the assignment is a pure function of id.
    val a = sharded.select($"id", $"shard", $"shard_pos")
      .as[(Long, Int, Long)].collect().toSet
    val b = operators.Sampling.shardAssign(df.repartition(7), "id", nShards = 4)
      .select($"id", $"shard", $"shard_pos").as[(Long, Int, Long)].collect().toSet
    assert(a == b, "shard assignment depends on physical partitioning")
    // Exhaustive, disjoint, dense 0-based positions per shard.
    assert(a.size == 200 && a.map(_._1).size == 200)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (0L until rows.size).toSet, "shard_pos not dense")
    }
    sources.Sink.saveSharded(sharded, s"$dir/shards")
    // Hive layout: one directory per shard.
    val dirs = new java.io.File(s"$dir/shards").listFiles()
      .map(_.getName).filter(_.startsWith("shard=")).toSet
    assert(dirs == Set("shard=0", "shard=1", "shard=2", "shard=3"))
    // Round-trip equality of the full assignment.
    val back = spark.read.parquet(s"$dir/shards")
      .select($"id", $"shard".cast("int"), $"shard_pos").as[(Long, Int, Long)]
      .collect().toSet
    assert(back == a)
    // PHYSICAL order: reading one shard's files with no sort must
    // yield shard_pos ascending — the sequential-reader contract.
    dirs.foreach { d =>
      val pos = spark.read.parquet(s"$dir/shards/$d").select($"shard_pos")
        .as[Long].collect().toSeq
      assert(pos == pos.sorted, s"$d rows not physically ordered: $pos")
    }
    // Epoch salt: a different salt is a genuinely different (but still
    // deterministic) permutation — the per-epoch reshuffle contract.
    def epoch(salt: String) = operators.Sampling
      .shardAssign(df, "id", nShards = 4, salt = salt)
      .select($"id", $"shard", $"shard_pos").as[(Long, Int, Long)].collect().toSet
    val e1a = epoch("epoch1")
    assert(e1a == epoch("epoch1"), "same salt must reproduce exactly")
    assert(e1a != a && e1a != epoch("epoch2"), "salt must actually reshuffle")
  }
}

class ViewsPaginationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("paginar returns the requested page of the explicit order (O4)") {
    val df = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    val page3 = Views.paginar(df, page = 3, perPage = 10, order = Seq(col("id").asc))
      .select("id").as[Long].collect().toSeq
    assert(page3 == (21L to 30L))
  }

  test("paginar past the end returns empty") {
    val df = (1 to 5).map(i => (i, s"r$i")).toDF("id", "v")
    assert(Views.paginar(df, page = 3, perPage = 5, order = Seq(col("id"))).count() == 0)
  }

  test("compatibilityReport reports a missing join key instead of crashing") {
    val fact = Seq((1, "x")).toDF("a", "b") // no codigo_produto
    val dim = Seq(("p1", "n")).toDF("codigo_produto", "negocio")
    val r = operators.Enrich.compatibilityReport(fact, dim).collect()(0)
    assert(r.getBoolean(0) == false) // key_present_both
    assert(r.getLong(2) == 0L && r.getLong(4) == 0L)
    assert(r.isNullAt(5)) // pct_missing undefined
  }

  test("normalizeKeys trims the reference's dirty-key hazard; stripAccents folds pt-BR") {
    val df = Seq(("CEBD01035-00 ", "Ação José Àqüela")).toDF("k", "n")
    val out = operators.Cleaning.normalizeKeys(df, Seq("k"))
      .select(col("k"), operators.Cleaning.stripAccents(col("n")))
      .as[(String, String)].head()
    assert(out == ("CEBD01035-00", "Acao Jose Aquela"))
  }

  test("sqlOn registers the frame and runs SQL against it (exec() replacement)") {
    val out = Views.sqlOn(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"),
      "t_sqlon", "SELECT count(*) AS n FROM t_sqlon WHERE id > 1")
    assert(out.as[Long].head() == 1L)
  }

  test("tuplaDados omits empty motivo (C9: 3- vs 4-slot)") {
    val df = Seq(("1996-01-02", 0.5, "Ana", "lost"), ("1996-01-03", 0.25, "Bob", ""))
      .toDF("dt", "prob", "cons", "motivo")
      .withColumn("dt", to_date(col("dt")))
    val t = df.select(History.tuplaDados(col("dt"), col("prob"), col("cons"), col("motivo")))
      .as[Seq[String]].collect().toSeq
    assert(t(0) == Seq("02/01/1996", "0.5", "Ana", "lost"))
    assert(t(1) == Seq("03/01/1996", "0.25", "Bob"))
  }
}

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts_us", "event_type")

  test("stageTimes: min-cascade semantics, strict ordering, out-of-order steps") {
    val df = ev(
      // u1: full funnel, with an earlier click (ts=5) BEFORE the first
      // view (ts=10) that must NOT count; the qualifying click is 20.
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: view only
      (2L, 10L, "view"), (2L, 5L, "error"),
      // u3: purchase before any view → stage 0 path beyond view
      (3L, 1L, "purchase"), (3L, 10L, "view"),
      // u4: no funnel event types at all
      (4L, 7L, "signup"),
      // u5: click at the SAME microsecond as view — strict > excludes it
      (5L, 10L, "view"), (5L, 10L, "click"), (5L, 11L, "click"))
    val out = Funnel.stageTimes(df, Seq("view", "click", "purchase"))
      .select($"user_id", $"stage",
        element_at($"step_us", 1), element_at($"step_us", 2), element_at($"step_us", 3))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, Some(10L), Some(20L), Some(30L))))
    assert(out(2L) == ((2L, 1L, Some(10L), None, None)))
    assert(out(3L) == ((3L, 1L, Some(10L), None, None)))
    assert(out(4L) == ((4L, 0L, None, None, None)))
    assert(out(5L) == ((5L, 2L, Some(10L), Some(11L), None)))
  }

  test("summary: at-least-stage counts are a non-increasing suffix sum") {
    val df = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 1L, "view"),
      (4L, 1L, "error"))
    val st = Funnel.stageTimes(df, Seq("view", "click", "purchase"))
    val sm = Funnel.summary(st).as[(Long, Long)].collect().toMap
    assert(sm == Map(3L -> 1L, 2L -> 2L, 1L -> 3L, 0L -> 4L))
  }
}

class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("events_retention semantics on a hand-built two-cohort timeline") {
    // Build an events-shaped frame through the query's own arithmetic:
    // week = epoch_us div 604800000000. Use small week numbers directly.
    val wkUs = 604800000000L
    def at(wk: Long) = wk * wkUs + 1L
    val rows = Seq(
      // u1: cohort wk 0, returns wks 1 and 3 (twice in wk1 — distinct folds it)
      (1L, at(0)), (1L, at(1)), (1L, at(1) + 5L), (1L, at(3)),
      // u2: cohort wk 0, never returns
      (2L, at(0)),
      // u3: cohort wk 1, returns wk 2
      (3L, at(1)), (3L, at(2)))
      .toDF("user_id", "ts_us")
    val wk = rows.select($"user_id", expr(s"ts_us div $wkUs").as("wk")).distinct()
    val cohorts = wk.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    val out = wk.join(cohorts, "user_id")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}

/** Legacy `.xls` reader ([[graft.sources.Xls]]) against hand-built
  * BIFF8-in-CFB fixtures — the binary-format sibling of XlsxSpec's
  * hand-built workbook test. The builders below write the two public
  * specs (MS-CFB, MS-XLS) byte-for-byte, covering both CFB storage
  * paths (regular FAT for streams ≥ 4096 bytes; mini-FAT ministream
  * below) and the BIFF record forms that carry data: SST with a
  * string SPLIT ACROSS A CONTINUE BOUNDARY (the classic corruption
  * spot — the continued run restarts with its own compression flag),
  * wide (UTF-16) strings, LABELSST/NUMBER/RK/MULRK/BOOLERR, and
  * FORMULA with a cached STRING result.
  */
class XlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(payload.length) ++ payload
  private def bof(dt: Int): Array[Byte] =
    rec(0x809, le16(0x600) ++ le16(dt) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
  private def cell(row: Int, col: Int): Array[Byte] =
    le16(row) ++ le16(col) ++ le16(0) // + xf

  /** Workbook stream: globals (BOUNDSHEET + SST incl. a CONTINUE
    * split and a wide string) + one sheet with every cell form.
    * `padBytes` sizes an inert 0x5C filler record exactly (None =
    * no filler) so tests can pin the stream length to a byte — the
    * mini-FAT↔FAT cutover tests need 4095 vs 4096 precisely.
    */
  private def workbookBytes(padBytes: Option[Int]): Array[Byte] = {
    // SST strings: 0="id", 1="café" (wide), 2="valor",
    // 3="abcdefghij" split 4+6 across a CONTINUE.
    val sstHead = le32(4) ++ le32(4) ++
      (le16(2) ++ Array(0.toByte) ++ "id".getBytes("ASCII")) ++
      (le16(4) ++ Array(1.toByte) ++ "café".getBytes("UTF-16LE")) ++
      (le16(5) ++ Array(0.toByte) ++ "valor".getBytes("ASCII")) ++
      (le16(10) ++ Array(0.toByte) ++ "abcd".getBytes("ASCII")) // 6 chars continue
    val sst = rec(0xFC, sstHead) ++
      rec(0x3C, Array(0.toByte) ++ "efghij".getBytes("ASCII"))
    val rkInt = (12345L << 2) | 2L // int form
    val rkFloat = // float form: top 30 bits of the double 2.5
      java.lang.Double.doubleToLongBits(2.5) >>> 32 & 0xFFFFFFFCL
    val sheet = bof(0x10) ++
      rec(0xFD, cell(0, 0) ++ le32(0)) ++ // header: id
      rec(0xFD, cell(0, 1) ++ le32(2)) ++ // header: valor
      rec(0xFD, cell(0, 2) ++ le32(1)) ++ // header: café (wide)
      rec(0xFD, cell(1, 0) ++ le32(3)) ++ // continued SST string
      rec(0x203, cell(1, 1) ++ {
        val b = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(7.25); b.array()
      }) ++
      rec(0x27E, cell(2, 0) ++ le32(rkInt)) ++
      rec(0x27E, cell(2, 1) ++ le32(rkFloat)) ++
      rec(0xBD, le16(3) ++ le16(0) ++ // MULRK row 3, cols 0-1
        (le16(0) ++ le32((7L << 2) | 2L)) ++
        (le16(0) ++ le32((401L << 2) | 3L)) ++ // int + div-100 -> 4.01
        le16(1)) ++
      rec(0x205, cell(4, 0) ++ Array(1.toByte, 0.toByte)) ++ // TRUE
      rec(0x06, cell(4, 1) ++
        Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++ // cached string marker
        le16(0) ++ le32(0) ++ le16(0)) ++
      rec(0x207, le16(4) ++ Array(0.toByte) ++ "soma".getBytes("ASCII")) ++
      rec(0x0A, Array.empty[Byte])
    // globals with the boundsheet offset patched in after assembly
    def globals(sheetOffset: Int): Array[Byte] = {
      val name = "Plan1".getBytes("ASCII")
      val bs = rec(0x85, le32(sheetOffset) ++ le16(0) ++
        Array(name.length.toByte, 0.toByte) ++ name)
      val padRec = padBytes match {
        case Some(n) => rec(0x5C, new Array[Byte](n))
        case None => Array.empty[Byte]
      }
      bof(0x05) ++ bs ++ sst ++ padRec ++ rec(0x0A, Array.empty[Byte])
    }
    val gLen = globals(0).length
    globals(gLen) ++ sheet
  }

  /** Minimal spec-correct CFB container around one Workbook stream —
    * regular FAT when the stream is >= 4096 bytes, ministream+miniFAT
    * below that (both paths exercised by the two tests).
    */
  private def cfb(stream: Array[Byte]): Array[Byte] = {
    val mini = stream.length < 4096
    def dirEntry(name: String, objType: Int, start: Long, size: Long,
                 child: Long = 0xFFFFFFFFL): Array[Byte] = {
      val e = new Array[Byte](128)
      val n = name.getBytes("UTF-16LE")
      System.arraycopy(n, 0, e, 0, n.length)
      System.arraycopy(le16(n.length + 2), 0, e, 64, 2)
      e(66) = objType.toByte; e(67) = 1
      System.arraycopy(le32(0xFFFFFFFFL), 0, e, 68, 4)
      System.arraycopy(le32(0xFFFFFFFFL), 0, e, 72, 4)
      System.arraycopy(le32(child), 0, e, 76, 4)
      System.arraycopy(le32(start), 0, e, 116, 4)
      System.arraycopy(le32(size), 0, e, 120, 4)
      e
    }
    def pad512(b: Array[Byte]): Array[Byte] = {
      val n = (b.length + 511) / 512 * 512
      java.util.Arrays.copyOf(b, math.max(n, 512))
    }
    val FREE = 0xFFFFFFFFL; val END = 0xFFFFFFFEL; val FATSECT = 0xFFFFFFFDL
    if (!mini) {
      // sector 0 = FAT, 1 = dir, 2.. = stream
      val streamSectors = (stream.length + 511) / 512
      val fat = Array.fill[Long](128)(FREE)
      fat(0) = FATSECT; fat(1) = END
      for (i <- 0 until streamSectors)
        fat(2 + i) = if (i == streamSectors - 1) END else 3L + i
      val dir = pad512(
        dirEntry("Root Entry", 5, END, 0, child = 1) ++
        dirEntry("Workbook", 2, 2, stream.length))
      val header = new Array[Byte](512)
      val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
      System.arraycopy(magic, 0, header, 0, 8)
      System.arraycopy(le16(0x3E), 0, header, 24, 2)
      System.arraycopy(le16(3), 0, header, 26, 2)
      System.arraycopy(le16(0xFFFE), 0, header, 28, 2)
      System.arraycopy(le16(9), 0, header, 30, 2)
      System.arraycopy(le16(6), 0, header, 32, 2)
      System.arraycopy(le32(1), 0, header, 44, 4)  // nFat
      System.arraycopy(le32(1), 0, header, 48, 4)  // firstDir
      System.arraycopy(le32(4096), 0, header, 56, 4)
      System.arraycopy(le32(END), 0, header, 60, 4)
      System.arraycopy(le32(END), 0, header, 68, 4)
      System.arraycopy(le32(0), 0, header, 76, 4) // DIFAT[0] = FAT at sector 0
      for (i <- 1 until 109) System.arraycopy(le32(FREE), 0, header, 76 + i * 4, 4)
      header ++ (fat.flatMap(le32) : Array[Byte]) ++ dir ++ pad512(stream)
    } else {
      // sector 0 = FAT, 1 = dir, 2 = miniFAT, 3.. = ministream (root)
      val miniData = {
        val n = (stream.length + 63) / 64 * 64
        java.util.Arrays.copyOf(stream, n)
      }
      val miniSectors = miniData.length / 64
      val rootSectors = (miniData.length + 511) / 512
      val fat = Array.fill[Long](128)(FREE)
      fat(0) = FATSECT; fat(1) = END; fat(2) = END
      for (i <- 0 until rootSectors)
        fat(3 + i) = if (i == rootSectors - 1) END else 4L + i
      val miniFat = Array.fill[Long](128)(FREE)
      for (i <- 0 until miniSectors)
        miniFat(i) = if (i == miniSectors - 1) END else i + 1L
      val dir = pad512(
        dirEntry("Root Entry", 5, 3, miniData.length, child = 1) ++
        dirEntry("Workbook", 2, 0, stream.length))
      val header = new Array[Byte](512)
      val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
      System.arraycopy(magic, 0, header, 0, 8)
      System.arraycopy(le16(0x3E), 0, header, 24, 2)
      System.arraycopy(le16(3), 0, header, 26, 2)
      System.arraycopy(le16(0xFFFE), 0, header, 28, 2)
      System.arraycopy(le16(9), 0, header, 30, 2)
      System.arraycopy(le16(6), 0, header, 32, 2)
      System.arraycopy(le32(1), 0, header, 44, 4)
      System.arraycopy(le32(1), 0, header, 48, 4)
      System.arraycopy(le32(4096), 0, header, 56, 4)
      System.arraycopy(le32(2), 0, header, 60, 4)  // first miniFAT sector
      System.arraycopy(le32(1), 0, header, 64, 4)  // n miniFAT
      System.arraycopy(le32(END), 0, header, 68, 4)
      System.arraycopy(le32(0), 0, header, 76, 4)
      for (i <- 1 until 109) System.arraycopy(le32(FREE), 0, header, 76 + i * 4, 4)
      header ++ (fat.flatMap(le32) : Array[Byte]) ++ dir ++
        (miniFat.flatMap(le32) : Array[Byte]) ++ pad512(miniData)
    }
  }

  private def writeXlsBytes(wb: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_xls").toString
    val p = s"$dir/legacy.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), cfb(wb))
    p
  }

  private def writeXls(pad: Boolean): String =
    writeXlsBytes(workbookBytes(if (pad) Some(4200) else None))

  /** The standard workbook padded so the stream is EXACTLY `total`
    * bytes — the mini-FAT↔FAT cutover pin (filler record header costs
    * 4 bytes on top of its payload).
    */
  private def writeXlsExact(total: Int): String = {
    val base = workbookBytes(None).length
    require(total >= base + 4, s"target $total below minimum ${base + 4}")
    val wb = workbookBytes(Some(total - base - 4))
    assert(wb.length == total, s"padding math drifted: ${wb.length} != $total")
    writeXlsBytes(wb)
  }

  test("BIFF8 regular-FAT workbook: every cell form, SST continue split, wide strings") {
    val p = writeXls(pad = true)
    assert(graft.sources.Xls.sheetNames(p) == Seq("Plan1"))
    val df = graft.sources.Xls.read(spark, p)
    assert(df.columns.toSeq == Seq("id", "valor", "café"))
    val rows = df.collect().map(_.toSeq).toSeq
    assert(rows == Seq(
      Seq("abcdefghij", "7.25", null),      // continued SST + NUMBER
      Seq("12345", "2.5", null),            // RK int + RK float
      Seq("7", "4.01", null),               // MULRK int + div-100
      Seq("true", "soma", null)))           // BOOLERR + FORMULA/STRING
  }

  test("ministream workbook (stream < 4096 bytes) reads through the mini-FAT path") {
    val p = writeXls(pad = false)
    val df = graft.sources.Xls.read(spark, p)
    assert(df.columns.toSeq == Seq("id", "valor", "café"))
    assert(df.count() == 4)
  }

  test("Load.load dispatches .xls and applies an explicit schema by name") {
    val p = writeXls(pad = true)
    val df = graft.sources.Load.load(spark, p)
    assert(df.columns.toSeq == Seq("id", "valor", "café"))
    assert(df.count() == 4)
  }

  // ---- round-12 adversarial fixtures (verdict ask #7): the two spots
  // where real-world BIFF8 historically breaks readers.

  /** Workbook whose SST monster string spans TWO CONTINUE records with
    * ALTERNATING compression flags (head compressed → wide CONTINUE →
    * compressed CONTINUE; each run fills its record exactly, so the
    * flag MUST be re-read at both boundaries), plus a FORMULA whose
    * promised STRING never arrives before another cell record (the
    * stray STRING later must not attach to the stale cell), plus a
    * NUMBER in Double.toString's scientific range (12345678.5) pinning
    * the plain rendering.
    */
  private def adversarialWorkbookBytes: Array[Byte] = {
    val sst = rec(0xFC, le32(3) ++ le32(3) ++
        (le16(1) ++ Array(0.toByte) ++ "a".getBytes("ASCII")) ++
        (le16(1) ++ Array(0.toByte) ++ "b".getBytes("ASCII")) ++
        (le16(20) ++ Array(0.toByte) ++ "012345".getBytes("ASCII"))) ++
      rec(0x3C, Array(1.toByte) ++ "6789ABC".getBytes("UTF-16LE")) ++
      rec(0x3C, Array(0.toByte) ++ "DEFGHIJ".getBytes("ASCII"))
    val numSci = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(12345678.5); b.array()
    }
    val sheet = bof(0x10) ++
      rec(0xFD, cell(0, 0) ++ le32(0)) ++ // header a
      rec(0xFD, cell(0, 1) ++ le32(1)) ++ // header b
      rec(0xFD, cell(1, 0) ++ le32(2)) ++ // the two-CONTINUE monster
      rec(0x203, cell(1, 1) ++ numSci) ++
      rec(0x06, cell(2, 0) ++ // FORMULA promising a STRING...
        Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++
        le16(0) ++ le32(0) ++ le16(0)) ++
      rec(0x27E, cell(2, 1) ++ le32((42L << 2) | 2L)) ++ // ...but a cell lands first
      rec(0x207, le16(5) ++ Array(0.toByte) ++ "stray".getBytes("ASCII")) ++
      rec(0x0A, Array.empty[Byte])
    def globals(off: Int): Array[Byte] = {
      val name = "S".getBytes("ASCII")
      bof(0x05) ++
        rec(0x85, le32(off) ++ le16(0) ++ Array(name.length.toByte, 0.toByte) ++ name) ++
        sst ++ rec(0x0A, Array.empty[Byte])
    }
    val g = globals(0).length
    globals(g) ++ sheet
  }

  test("SST string across TWO CONTINUEs with alternating flags; stale FORMULA->STRING; plain numerics") {
    val df = graft.sources.Load.load(spark, writeXlsBytes(adversarialWorkbookBytes))
    assert(df.columns.toSeq == Seq("a", "b"))
    val rows = df.collect().map(_.toSeq).toSeq
    assert(rows == Seq(
      // flag alternation: compressed head + wide CONTINUE + compressed CONTINUE
      Seq("0123456789ABCDEFGHIJ", "12345678.5"),
      // the formula cell stays null; "stray" must NOT attach to it
      Seq(null, "42")))
  }

  test("mini-FAT/FAT cutover: 4095-byte stream via ministream, 4096 via regular FAT") {
    // MS-CFB puts streams < 4096 bytes in the ministream; at exactly
    // 4096 they move to the regular FAT. One byte apart, two entirely
    // different sector paths — the classic off-by-one in CFB readers
    // (a 4095-byte ministream also spans 64 mini sectors = 8 root
    // sectors, exercising the multi-sector root chain).
    for (sz <- Seq(4095, 4096)) {
      val df = graft.sources.Xls.read(spark, writeXlsExact(sz))
      assert(df.columns.toSeq == Seq("id", "valor", "café"), s"stream size $sz")
      assert(df.count() == 4, s"stream size $sz")
    }
  }
}

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fold(syms: Seq[String], l: String, r: String): Seq[String] = {
    val df = Seq(Tuple1(syms)).toDF("syms")
    df.select(graft.operators.Bpe.mergeFold($"syms", lit(l), lit(r)).as("out"))
      .as[Seq[String]].collect().head
  }

  test("mergeFold: greedy left-to-right non-overlap on the adversarial cases") {
    // run of equal symbols — greedy must take even offsets of the run
    assert(fold(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    assert(fold(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    // back-to-back disjoint pairs all merge
    assert(fold(Seq("l", "r", "l", "r"), "l", "r") == Seq("lr", "lr"))
    // merged output does not cascade within the same round
    assert(fold(Seq("l", "l", "r"), "l", "r") == Seq("l", "lr"))
    // no match / single symbol pass through
    assert(fold(Seq("x", "y"), "l", "r") == Seq("x", "y"))
    assert(fold(Seq("x"), "l", "r") == Seq("x"))
    // multi-char symbols must not false-match by concatenation
    assert(fold(Seq("ab", "c"), "a", "bc") == Seq("ab", "c"))
  }

  test("train: Sennrich-style hand corpus learns the expected first merges") {
    // freq: low x5, lower x2, newest x6, widest x3 (the classic
    // example family). Pair counts round 1: e+s = 6+3 = 9 (newest,
    // widest), s+t = 9, w+e = 2+6+3 = 11, ... hand-check the top.
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val (mergesDf, wordMap) = graft.operators.Bpe.train(docs, "text", merges = 3)
    val merges = mergesDf.orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    // w+e appears in lower(2), newest(6 via 'we'? no — n,e,w,e,s,t has
    // w+e), widest: w,i,d,e,s,t has no we. So we = 2 + 6 = 8.
    // e+s: newest 6 + widest 3 = 9; s+t: 9; e+w: 6; l+o: 7; o+w: 7.
    // Top is e+s vs s+t tie at 9 -> lex: (e,s) < (s,t) -> es first.
    assert(merges.head == ((1, "e", "s", 9L)), s"got ${merges.head}")
    // After es: s+t is gone (widest/newest now ...es,t) -> es+t = 9 wins round 2.
    assert(merges(1) == ((2, "es", "t", 9L)), s"got ${merges(1)}")
    // Round 3: l+o = 7 and o+w = 7 tie -> (l,o) lex-first.
    assert(merges(2) == ((3, "l", "o", 7L)), s"got ${merges(2)}")
    val m = wordMap.select($"w", $"syms").as[(String, Seq[String])].collect().toMap
    assert(m("newest") == Seq("n", "e", "w", "est"))
    assert(m("low") == Seq("lo", "w"))
    assert(m("lower") == Seq("lo", "w", "e", "r"))
  }

  test("encodeCounts: per-doc word and token counts; OOV words encode; empty docs report zeros") {
    val docs = Seq(
      (1L, "low low newest"),
      (2L, "??? !!!"), // nothing survives the ascii gate
      (3L, null.asInstanceOf[String]),
      (4L, "lowest")). // NOT in the training corpus — must encode, not drop
      toDF("doc_id", "text")
    val (mergeTable, _) = graft.operators.Bpe.train(
      Seq((9L, "low low low low low lower lower newest newest newest newest newest newest widest widest widest"))
        .toDF("doc_id", "text"), "text", merges = 3)
    val out = graft.operators.Bpe.encodeCounts(docs, "doc_id", "text", mergeTable)
      .as[(Long, Long, Long)].collect().map { case (k, v, t) => k -> ((v, t)) }.toMap
    // low -> [lo, w] = 2 tokens; newest -> [n, e, w, est] = 4
    assert(out(1L) == ((3L, 2L + 2L + 4L)))
    assert(out(2L) == ((0L, 0L)))
    assert(out(3L) == ((0L, 0L)))
    // OOV "lowest": l,o,w,e,s,t --es--> l,o,w,es,t --est--> l,o,w,est
    // --lo--> lo,w,est = 3 tokens (round-11 shape dropped the word).
    assert(out(4L) == ((1L, 3L)))
  }

  test("encodeIds: in-order token-id sequences; unseen symbols map to UNK 0") {
    // Train "aa aa bb": round-1 pair counts (a,a)=2 > (b,b)=1 -> merge
    // (a,a). Word map: aa -> [aa], bb -> [b, b]. Vocab occurrences:
    // aa=2, b=2 -> tie breaks on token asc: aa id 1, b id 2.
    val train = Seq((1L, "aa aa bb")).toDF("doc_id", "text")
    val (mergeTable, wordMap) = graft.operators.Bpe.train(train, "text", merges = 1)
    val vocab = graft.operators.Bpe.vocab(wordMap)
    assert(vocab.select($"token", $"token_id").as[(String, Int)].collect().toMap
      == Map("aa" -> 1, "b" -> 2))
    // Encode a DISJOINT doc: "cc" is OOV and its replayed segmentation
    // [c, c] contains a symbol the vocabulary never shipped -> UNK 0;
    // "aa" and "bb" resolve normally; order is word-major.
    val docs = Seq((7L, "cc aa bb"), (8L, "???")).toDF("doc_id", "text")
    val out = graft.operators.Bpe.encodeIds(docs, "doc_id", "text", mergeTable, vocab)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(7L) == ((5L, "0,0,1,2,2")), s"got ${out(7L)}")
    assert(out(8L) == ((0L, "")))
  }

  test("tokenizer artifacts round-trip through saveIndex/loadIndex: identical sequences") {
    // The merge table and vocabulary ARE frame-shaped index artifacts
    // (Sink.saveIndex's contract) — a serving session loads them from
    // parquet and must produce bit-identical token-id sequences to
    // the training session. Ranks are ints, tokens ASCII, ids ints:
    // exact through parquet by construction; this pins the wiring
    // (column names, rank order survives the shuffle-free read).
    val train = Seq((9L, "low low low lower lower newest newest newest widest"))
      .toDF("doc_id", "text")
    val (mergeTable, wordMap) = graft.operators.Bpe.train(train, "text", merges = 3)
    val vocab = graft.operators.Bpe.vocab(wordMap)
    val dir = java.nio.file.Files.createTempDirectory("graft_tok").toString
    graft.sources.Sink.saveIndex(mergeTable, s"$dir/merges", Map("merges" -> "3"))
    graft.sources.Sink.saveIndex(vocab, s"$dir/vocab", Map("merges" -> "3"))
    val (m2, mp) = graft.sources.Load.loadIndex(spark, s"$dir/merges")
    val (v2, vp) = graft.sources.Load.loadIndex(spark, s"$dir/vocab")
    assert(mp("merges") == "3" && vp("merges") == "3")
    val docs = Seq((1L, "low lowest newest"), (2L, "widest")).toDF("doc_id", "text")
    val direct = graft.operators.Bpe.encodeIds(docs, "doc_id", "text", mergeTable, vocab)
      .as[(Long, Long, String)].collect().toSet
    val loaded = graft.operators.Bpe.encodeIds(docs, "doc_id", "text", m2, v2)
      .as[(Long, Long, String)].collect().toSet
    assert(direct == loaded, s"$direct != $loaded")
    assert(direct.exists(_._3.nonEmpty))
  }

  test("applyMerges reproduces the trained segmentation for in-corpus words") {
    // The induction claim in the scaladoc, pinned: replaying the merge
    // table over a char split equals the training fold's final state
    // for EVERY corpus word — including the adversarial equal-symbol
    // runs (aaaa) where greedy non-overlap semantics bite.
    val docs = Seq((9L,
      "low low low low low lower lower newest newest newest newest newest newest " +
        "widest widest widest aaaa aaaa aaa banana"))
      .toDF("doc_id", "text")
    val (mergeTable, wordMap) = graft.operators.Bpe.train(docs, "text", merges = 6)
    val replayed = wordMap.select($"w")
      .crossJoin(broadcast(graft.operators.Bpe.mergesArray(mergeTable)))
      .select($"w", graft.operators.Bpe.applyMerges($"w", $"__merges").as("syms"))
      .as[(String, Seq[String])].collect().toMap
    val trained = wordMap.select($"w", $"syms").as[(String, Seq[String])].collect().toMap
    assert(replayed == trained,
      s"merge replay diverges from training fold: ${replayed.toSet.diff(trained.toSet)}")
  }

  test("encodeIdsBytes: byte fallback decomposes vanished intermediate tokens, never emits UNK") {
    // Train "abc abc": round 1 merges (a,b) (count tie with (b,c),
    // lexicographic tie-break), round 2 merges (ab,c) — so the
    // intermediate token "ab" is CONSUMED and absent from the final
    // vocabulary {abc}. Serving vocab: abc -> 1, then the full byte
    // floor '0'..'9' -> 2..11, 'a' -> 12 .. 'z' -> 37.
    val train = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val (mergeTable, wordMap) = graft.operators.Bpe.train(train, "text", merges = 2)
    val vocab = graft.operators.Bpe.vocab(wordMap)
    val svoc = graft.operators.Bpe.servingVocabWithBytes(vocab)
      .as[(String, Int)].collect().toMap
    assert(svoc("abc") == 1 && svoc("0") == 2 && svoc("9") == 11
      && svoc("a") == 12 && svoc("b") == 13 && svoc("z") == 37, s"svoc layout: $svoc")
    assert(svoc.size == 37) // 1 trained token + all 36 gate characters
    // "abz": replay gives [ab, z]; "ab" vanished from the vocabulary,
    // so it DECOMPOSES to bytes a,b = 12,13; z resolves whole via the
    // floor = 37. encodeIds would have emitted UNK 0 for "ab".
    val docs = Seq((7L, "abc abz"), (8L, "zz"), (9L, "???")).toDF("doc_id", "text")
    val out = graft.operators.Bpe.encodeIdsBytes(docs, "doc_id", "text", mergeTable, vocab)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(7L) == ((4L, "1,12,13,37")), s"got ${out(7L)}")
    assert(out(8L) == ((2L, "37,37")))
    assert(out(9L) == ((0L, "")))
    // Where no fallback fires the two serving outputs agree exactly.
    val noOov = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val a = graft.operators.Bpe.encodeIds(noOov, "doc_id", "text", mergeTable, vocab)
      .as[(Long, Long, String)].collect().toSet
    val b = graft.operators.Bpe.encodeIdsBytes(noOov, "doc_id", "text", mergeTable, vocab)
      .as[(Long, Long, String)].collect().toSet
    assert(a == b, s"$a != $b")
  }

  test("text_bpe_token_ids_bytes at sf0.001: zero UNK; parity with encodeIds away from fallback") {
    // The registered query trains on even doc_ids and serves the
    // disjoint odd half. Contract pinned here, honest at any corpus
    // scale (whether or not this particular vocabulary leaves
    // fallback-triggering symbols): (1) no token id 0 anywhere;
    // (2) for every document the plain UNK serving encodes without
    // UNKs, the byte variant emits the IDENTICAL sequence; (3) for
    // every document where the plain serving DOES emit UNKs, the byte
    // variant replaces them with >= as many byte tokens (a c-char
    // symbol becomes c pieces) — the decomposition itself is pinned
    // exactly by the hand fixture above.
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("text_bpe_token_ids_bytes")(spark, sf)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.nonEmpty && rows.values.exists(_._1 > 0))
    assert(!rows.values.iterator.filter(_._2.nonEmpty)
        .flatMap(_._2.split(',')).contains("0"),
      "UNK id 0 leaked through the byte floor")
    val docs = graft.sources.Tables.documents(spark, sf)
    val (mergeTable, wordMap) = graft.operators.Bpe.train(
      docs.filter($"doc_id" % 2 === 0), "text", merges = 20)
    val plain = graft.operators.Bpe.encodeIds(
        docs.filter($"doc_id" % 2 === 1), "doc_id", "text", mergeTable,
        graft.operators.Bpe.vocab(wordMap))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(plain.keySet == rows.keySet)
    plain.foreach { case (id, (nTok, seq)) =>
      val hasUnk = seq.nonEmpty && seq.split(',').contains("0")
      if (!hasUnk) assert(rows(id) == ((nTok, seq)), s"doc $id diverged without fallback")
      else assert(rows(id)._1 >= nTok, s"doc $id lost tokens in fallback")
    }
  }
}

class XlsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // The JVM in this container runs without a UTF-8 locale
  // (sun.jnu.encoding=ASCII), so java.io cannot address the
  // reference's accented path AT ALL — stage the workbook (same
  // bytes) to an ASCII path with a shell glob once per suite.
  private lazy val refBook: String = {
    val dst = "target/ref_dim.xlsx"
    import scala.sys.process._
    val rc = Seq("bash", "-c",
      s"cp /root/reference/*/Classifica*.xlsx $dst").!
    assert(rc == 0, "staging the reference workbook failed")
    dst
  }

  test("reads the reference's ACTUAL dimension workbook (the pd.read_excel parity proof)") {
    val df = graft.sources.Xlsx.read(spark, refBook)
    // the EXACT header row the reference's dim pipeline consumes
    // (SURVEY 1.2) — including the accented names and the analyst's
    // sign-off column
    assert(df.columns.toSeq == Seq(
      "C\u00f3digo Produto", "Descri\u00e7\u00e3o", "Tipo de Mercadoria",
      "Subgrupo", "Utiliza\u00e7\u00e3o", "Local", "Grupo",
      "Neg\u00f3cio", "Fabricante", "Valida\u00e7\u00e3o Andr\u00e9"),
      df.columns.toSeq.toString)
    val n = df.count()
    assert(n > 10000, s"expected the ~10k-row dimension, got $n")
    // and the REAL dimension flows through the actual pipeline: rename
    // to the dim contract (what the reference's merge does), normalize
    // the keys (SURVEY 7.5 - the real file carries trailing-space
    // keys), and run the compatibility report against the synthetic
    // fact - the first thing a switching user would execute.
    val dim = graft.operators.Cleaning.normalizeKeys(
      df.select(
        org.apache.spark.sql.functions.col("C\u00f3digo Produto").as("codigo_produto"),
        org.apache.spark.sql.functions.col("Descri\u00e7\u00e3o").as("descricao"),
        org.apache.spark.sql.functions.col("Neg\u00f3cio").as("negocio"),
        org.apache.spark.sql.functions.col("Grupo").as("grupo"),
        org.apache.spark.sql.functions.col("Subgrupo").as("subgrupo"),
        org.apache.spark.sql.functions.col("Fabricante").as("fabricante")),
      Seq("codigo_produto"))
    assert(dim.select("codigo_produto").distinct().count() > 10000)
    val fact = graft.sources.Tables.analiseComercial(spark, "/root/testdata/sf0.001")
    val report = graft.operators.Enrich.compatibilityReport(fact, dim)
    assert(report.count() >= 1) // executes end-to-end on the real file
    // the same sheet is discoverable by name (SURVEY S2)
    assert(graft.sources.Xlsx.sheetNames(refBook) == Seq("Base"))
    val byName = graft.sources.Xlsx.read(spark, refBook, sheet = Some("Base"))
    assert(byName.count() == n)
    // and the whole pipeline entry point accepts the raw file now
    assert(graft.sources.Load.load(spark, refBook).count() == n)
  }

  test("hand-built workbook: numerics, shared/inline strings, gaps, booleans, header dedup") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val p = s"$dir/mini.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(p))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://x" xmlns:r="http://r">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>id</t></si><si><t>nome</t></si>
        |<si><t>ol\u00e1 </t><t>mundo</t></si></sst>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c><c r="D2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3"><v>8.5</v></c><c r="C3" t="inlineStr"><is><t>inline</t></is></c></row>
        |<row><c><v>9</v></c><c t="s"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()

    val df = graft.sources.Xlsx.read(spark, p)
    // duplicate header 'nome' deduped positionally; col D had no header
    assert(df.columns.toSeq == Seq("id", "nome", "nome_1", "col_3"))
    val rows = df.orderBy("id").collect().map(_.toSeq).toSeq
    assert(rows == Seq(
      Seq("7", "ol\u00e1 mundo", null, "true"),
      Seq("8.5", null, "inline", null),
      // row/cells without r attributes fall back to positional order
      Seq("9", "ol\u00e1 mundo", null, null)))
  }

  test("xlsx write -> read round-trips values, nulls, accents, and markup chars") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_w").toString
    val p = s"$dir/out.xlsx"
    val df = Seq(
      ("CEBD01035-00", "A\u00e7\u00e3o & <Teste>", Some(12.5)),
      ("YSI480075Y", "tail space ", None),
      ("P3", null, Some(-7.0)))
      .toDF("codigo", "descricao", "valor")
      .select($"codigo", $"descricao", $"valor".cast("string"))
    graft.sources.Xlsx.write(df, p, sheetName = "Pendentes")
    assert(graft.sources.Xlsx.sheetNames(p) == Seq("Pendentes"))
    val back = graft.sources.Xlsx.read(spark, p)
    assert(back.columns.toSeq == Seq("codigo", "descricao", "valor"))
    val want = df.collect().map(_.toSeq).toSet
    val got = back.collect().map(_.toSeq).toSet
    assert(got == want, s"got $got\nwant $want")
    // and the reference's timestamped-export shape composes
    val named = graft.sources.Sink.saveTimestampedXlsx(
      df, dir, "propostas_pendentes", clock = () => "20240101_120000")
    assert(named.endsWith("propostas_pendentes_20240101_120000.xlsx"))
    assert(graft.sources.Load.load(spark, named).count() == 3)
  }

  test("oversized workbooks and missing sheets fail with guidance") {
    val e = intercept[IllegalArgumentException](
      graft.sources.Xlsx.read(spark, refBook, sheet = Some("Nope")))
    assert(e.getMessage.contains("Base"), e.getMessage)
  }

  test("banner row above headerRow does not inject phantom columns (pd.read_excel(header=n) parity)") {
    // A 5-cell title/banner row over a 2-column table: the schema must
    // come from the header+data rows only (round-10 ADVICE fix).
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_banner").toString
    val p = s"$dir/banner.xlsx"
    val wide = Seq(
      ("Relatório", "Comercial", "Q1", "2024", "interno"),
      ("id", "nome", null, null, null),
      ("1", "ana", null, null, null))
      .toDF("a", "b", "c", "d", "e")
    graft.sources.Xlsx.write(wide, p)
    // header=2 in the written sheet is the banner fixture's row 2...
    // but write() emits its own header row first, so the banner sits
    // at sheet row 2 and the real header at row 3.
    val df = graft.sources.Xlsx.read(spark, p, headerRow = 3)
    assert(df.columns.toSeq == Seq("id", "nome"),
      s"banner width leaked into the schema: ${df.columns.toSeq}")
    assert(df.collect().map(_.toSeq).toSeq == Seq(Seq("1", "ana")))
  }

  test("write escapes quotes in sheet names and strips XML-invalid control chars") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_esc").toString
    val p = s"$dir/esc.xlsx"
    val df = Seq(("a\u0000b\u0007c", "keep\ttab and \"quotes\"")).toDF("k", "v")
    graft.sources.Xlsx.write(df, p, sheetName = "Aba \"Base\" & <1>")
    // the quoted sheet name survives the attribute context intact
    assert(graft.sources.Xlsx.sheetNames(p) == Seq("Aba \"Base\" & <1>"))
    val back = graft.sources.Xlsx.read(spark, p).collect().map(_.toSeq).toSeq
    // NUL/BEL are illegal in XML 1.0 even escaped -> stripped; TAB kept
    assert(back == Seq(Seq("abc", "keep\ttab and \"quotes\"")))
  }

  test("write fails loudly past the xlsx row capacity instead of truncating") {
    // Cheap check of the guard wiring: a tiny cap via reflection isn't
    // possible, so exercise the happy path boundary logic indirectly —
    // the guard collects limit+1 rows and requires <= 1048575. A full
    // 2^20-row materialization is too slow for a unit test; pin the
    // message contract on the constant instead.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/sources/Xlsx.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(src.contains("MaxDataRows = 1048575"),
      "data-row cap must leave room for the header inside Excel's 2^20 limit")
    assert(src.contains("limit(MaxDataRows + 1)"),
      "over-limit detection must collect one past the cap, not silently truncate")
  }
}

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.Unigram

  private def seg(w: String, vocab: Seq[(String, Long)]): Seq[String] = {
    val vm = vocab.toDF("piece", "score_u")
    Seq(Tuple1(w)).toDF("w")
      .crossJoin(broadcast(Unigram.vocabMap(vm)))
      .select(Unigram.viterbiSeg($"w", $"__vmap", Unigram.MaxPieceLen).as("seg"))
      .as[Seq[String]].collect().head
  }

  test("viterbiSeg: max-score path wins; ties break to the smallest j (longest last piece)") {
    // 'ab'+'c' = -5 ties 'abc' = -5: smallest j at the last position
    // means the WHOLE word wins the tie.
    val v = Seq("a" -> -1L, "b" -> -2L, "ab" -> -2L, "abc" -> -5L, "c" -> -3L)
    assert(seg("abc", v) == Seq("abc"))
    // strictly better split beats the whole piece
    assert(seg("abc", Seq("a" -> -1L, "b" -> -1L, "c" -> -1L, "abc" -> -4L))
      == Seq("a", "b", "c"))
    // chars only -> char segmentation
    assert(seg("ba", Seq("a" -> -1L, "b" -> -2L)) == Seq("b", "a"))
  }

  test("viterbiSeg: UNK fallback emits the raw character; in-vocab neighbors unaffected") {
    val v = Seq("a" -> -1L, "x" -> -2L)
    assert(seg("axa", v) == Seq("a", "x", "a"))
    assert(seg("aqa", v) == Seq("a", "q", "a")) // q not in vocab -> fallback char
    assert(seg("q", v) == Seq("q"))
  }

  test("viterbiSeg: pieces longer than MaxPieceLen are out of reach") {
    // 'abcdefg' (7 chars) in the map must NOT be usable: window is 6.
    val v = Seq("abcdefg" -> 0L, "a" -> -1L, "b" -> -1L, "c" -> -1L,
      "d" -> -1L, "e" -> -1L, "f" -> -1L, "g" -> -1L)
    assert(seg("abcdefg", v) == Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("train: coverage floor keeps every corpus char; prune respects the budget; ids contiguous") {
    val docs = Seq(
      (1L, Seq.fill(8)("banana").mkString(" ")),
      (2L, Seq.fill(4)("bandana").mkString(" ")),
      (3L, "zq")).toDF("doc_id", "text")
    val voc = Unigram.train(docs, "text", seedMulti = 10, emIters = 2, vocabSize = 12)
      .collect()
    val tokens = voc.map(_.getString(0)).toSet
    // every corpus character survives, even rare z/q
    assert(Set("a", "b", "n", "d", "z", "q").subsetOf(tokens))
    assert(voc.length <= 12)
    assert(voc.map(_.getInt(3)).sorted.toSeq == (1 to voc.length))
    // id order = (cnt desc, token asc)
    val byRank = voc.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getString(0)))
    assert(byRank.sliding(2).forall { case Array((c1, t1), (c2, t2)) =>
      c1 > c2 || (c1 == c2 && t1 < t2) })
  }

  test("encodeIds: OOV chars map to id 0; empty docs emit empty sequences") {
    val docs = Seq((1L, "banana banana"), (2L, ""), (3L, "qqq")).toDF("doc_id", "text")
    val voc = Unigram.train(docs.filter($"doc_id" === 1L), "text",
      seedMulti = 5, emIters = 1, vocabSize = 8)
    val out = Unigram.encodeIds(docs, "doc_id", "text", voc)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(1).getLong(1) == 0L && out(1).getString(2) == "")
    // 'qqq' tokens: q is not in the banana vocab -> every piece id 0
    assert(out(2).getString(2).split(",").forall(_ == "0"))
  }
}

class LangIdTrainedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("charNgrams: normalized trigram occurrences; short/empty text empty") {
    val df = Seq("The  quick", "ab", "", null.asInstanceOf[String]).toDF("t")
    val out = df.select(TextAnalysis.charNgrams($"t", 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("the", "he ", "e q", " qu", "qui", "uic", "ick"))
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
  }

  test("charNgramCountsKernel bit-parity with the Column twin, incl. code points beyond ASCII") {
    // The kernel posture's contract: same distinct (key, gram, count)
    // frame as explode(charNgrams) -> groupBy, with grams sliced by
    // CODE POINT. The fixture plants a surrogate-pair emoji, combining
    // text, the \s+ collapse, and an empty/short tail.
    val df = Seq(
      (1L, "The  quick\tbrown"), (2L, "ab"), (3L, ""), (4L, null.asInstanceOf[String]),
      (5L, "café 🎉x café")).toDF("doc_id", "t")
    val twin = df
      .select(col("doc_id"), explode(TextAnalysis.charNgrams(col("t"), 3)).as("g"))
      .groupBy("doc_id", "g").count()
      .as[(Long, String, Long)].collect().toSet
    val kernel = TextAnalysis.charNgramCountsKernel(df, col("doc_id"), col("t"), 3)
      .select(col("__k").cast("long"), col("__g"), col("__cg"))
      .as[(Long, String, Long)].collect().toSet
    assert(kernel == twin, s"kernel ${kernel.diff(twin)} vs twin ${twin.diff(kernel)}")
  }

  test("langIdModel + langIdScore: separable two-class fixture classifies perfectly; ties break lang-asc") {
    val train = Seq(
      (1L, "aaa aaa aaa", "aa"), (2L, "aaa aaa", "aa"),
      (3L, "zzz zzz zzz", "zz"), (4L, "zzz zzz", "zz")).toDF("doc_id", "text", "lang")
    val model = TextAnalysis.langIdModel(train, "text", "lang")
    val priors = TextAnalysis.langIdPriors(train, "lang")
    val eval = Seq((10L, "aaa aaa"), (11L, "zzz"), (12L, "qqq")).toDF("doc_id", "text")
    val preds = TextAnalysis.langIdScore(model, priors, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(10L) == "aa")
    assert(preds(11L) == "zz")
    // 'qqq' has zero evidence for either class: identical smoothed
    // likelihoods and identical priors -> tie -> lang ascending = "aa"
    assert(preds(12L) == "aa")
  }
}

class PretrainFullSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E2E-11 attrition table is monotone and structurally sound at sf0.001") {
    val rows = graft.SparkEntry.queries("pipeline_pretrain_prep_full")(
        spark, "/root/testdata/sf0.001")
      .select("stage_no", "stage", "n_units", "n_tokens", "id_sum")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 to 12), s"missing stages: ${rows.mkString(",")}")
    val byName = rows.map(r => r._2 -> r).toMap
    // Document stages (0-9): doc counts never increase, and the
    // id_sum of a subset can never exceed its superset's.
    val docStages = rows.filter(_._1 <= 9)
    docStages.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"doc count grew ${a._2} -> ${b._2}")
      assert(b._5 <= a._5, s"id_sum grew ${a._2} -> ${b._2}")
    }
    // Line boiler keeps every doc but only removes tokens.
    assert(byName("line_boiler")._3 == byName("raw")._3)
    assert(byName("line_boiler")._4 <= byName("raw")._4)
    // Substr scrub keeps the doc set (same id_sum) while cutting tokens.
    assert(byName("substr_scrub")._5 == byName("gopher")._5)
    assert(byName("substr_scrub")._4 <= byName("gopher")._4)
    // Pack conserves the surviving token mass exactly; shard and
    // curriculum re-describe the same sequences.
    assert(byName("pack")._4 == byName("lm_gate")._4)
    assert(byName("shard")._4 == byName("pack")._4)
    assert(byName("curriculum")._3 == byName("pack")._3)
    assert(byName("shard")._3 <= 8)
  }
}

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.functions.Sketches

  private def summarize(words: Seq[String], k: Int, parts: Int): Map[String, Long] =
    words.toDF("word").repartition(parts)
      .agg(Sketches.misraGries(col("word"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.word"), col("e.est"))
      .as[(String, Long)].collect().toMap

  test("misraGries is exact when distinct values fit the counter budget") {
    val words = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val got = summarize(scala.util.Random.shuffle(words), k = 8, parts = 4)
    assert(got == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
  }

  test("misraGries guarantees heavy hitters present and estimates within N/(k+1), across partitions and merges") {
    // Skewed stream: two heavy values over a long noise tail, far more
    // distinct values than counters, spread over many partitions so
    // both the update eviction AND the merge collapse fire.
    val heavy = Seq.fill(400)("hh1") ++ Seq.fill(250)("hh2")
    val noise = (1 to 300).flatMap(i => Seq.fill(1 + i % 3)(s"w$i"))
    val words = scala.util.Random.shuffle(heavy ++ noise)
    val n = words.size.toLong
    val k = 8
    val exact = words.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val got = summarize(words, k, parts = 16)
    assert(got.size <= k, s"summary exceeded k: ${got.size}")
    val bound = n / (k + 1)
    // Presence: every true heavy hitter (count > N/(k+1)) has a counter.
    exact.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { w =>
      assert(got.contains(w), s"guaranteed heavy hitter $w missing (bound $bound)")
    }
    // Bounds: est <= true <= est + N/(k+1), for every kept counter.
    got.foreach { case (w, est) =>
      val t = exact(w)
      assert(est <= t, s"$w overestimated: est $est > true $t")
      assert(t <= est + bound, s"$w under bound: true $t > est $est + $bound")
    }
  }

  test("misraGries grouped: per-group budgets and bounds hold independently") {
    val rows = (Seq.fill(50)(("g1", "x")) ++ (1 to 40).map(i => ("g1", s"a$i")) ++
      Seq.fill(30)(("g2", "y")) ++ (1 to 20).map(i => ("g2", s"b$i")))
    val got = scala.util.Random.shuffle(rows).toDF("g", "word").repartition(8)
      .groupBy("g").agg(Sketches.misraGries(col("word"), 4).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.word"), col("e.est"))
      .as[(String, String, Long)].collect()
    val byG = got.groupBy(_._1)
    assert(byG.values.forall(_.length <= 4))
    // g1: N=90, bound 18; x has true 50 > 18 -> present, est in [32, 50].
    val x = byG("g1").find(_._2 == "x")
    assert(x.isDefined, "heavy hitter x missing from g1 summary")
    assert(x.get._3 <= 50L && x.get._3 >= 50L - 90L / 5)
    // g2: N=50, bound 10; y true 30 -> present, est in [20, 30].
    val y = byG("g2").find(_._2 == "y")
    assert(y.isDefined, "heavy hitter y missing from g2 summary")
    assert(y.get._3 <= 30L && y.get._3 >= 30L - 50L / 5)
  }

  test("theta KMV daily-sketch merge == direct rebuild of the range sketch (A26c fold=rebuild)") {
    // The events_theta_reuse contract: bottom-k arrays are order-ideal
    // under union, so merging persisted per-day sketches over a range
    // must be BIT-IDENTICAL to building one sketch from the range's
    // raw distinct elements. Pinned per segment at the registered
    // range and k, on real sf0.001 data.
    import graft.queries.PipelineQueries
    val dir = "/root/testdata/sf0.001"
    val (d1, d2, k) = (19727L, 19737L, 64)
    val merged = PipelineQueries.thetaMergeRange(
        PipelineQueries.thetaDaily(spark, dir, k), d1, d2, k)
      .as[(String, Seq[Long])].collect().toMap
    val direct = PipelineQueries.thetaDaily(spark, dir, k)
      .filter(col("day").between(d1, d2))
      .select(col("t"), explode(col("ks")).as("h")).distinct()
      .groupBy("t").agg(graft.functions.TopK.smallestK(col("h"), k).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    // `direct` here rebuilds from the union of daily sketch CONTENTS;
    // the stronger rebuild-from-raw-elements identity:
    val raw = graft.sources.Tables.events(spark, dir).select(
        expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS LONG)").as("day"),
        col("event_type").as("t"),
        graft.functions.Hashing.md5Bits60(concat(lit("kmv"),
          col("user_id").cast("string"), lit("_"),
          expr("CAST(CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS LONG) AS STRING)"))).as("h"))
      .filter(col("day").between(d1, d2))
      .select("t", "h").distinct()
      .groupBy("t").agg(graft.functions.TopK.smallestK(col("h"), k).as("ks"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged.keySet == raw.keySet, s"segment sets differ: ${merged.keySet} vs ${raw.keySet}")
    merged.keySet.foreach { t =>
      assert(merged(t) == raw(t), s"merged != raw rebuild for segment $t")
      assert(merged(t) == direct(t), s"merged != sketch-content rebuild for segment $t")
      assert(merged(t) == merged(t).sorted && merged(t).distinct == merged(t),
        s"merged sketch not a sorted distinct bottom-k for $t")
    }
  }
}
