package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every method here avoids the O(n²) all-pairs trap —
  * exact dedup is a hash groupBy; MinHash/SimHash reduce candidate
  * generation to an equi-join on band/bucket keys, which Spark
  * executes as a shuffle join on the (small) candidate space rather
  * than a cross join. Only candidates get the exact verification.
  *
  * Hashing is md5-based (not Spark's murmur/xxhash) so signatures are
  * engine-portable — any system with md5 reproduces the same buckets,
  * which is what lets the DuckDB oracle (and any future backfill
  * engine) agree bit-for-bit.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact dedup groups: one row per distinct normalized text, with
    * the representative (minimum) id and the member count. Keep the
    * representative by joining back on `fingerprint`.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  // ---------------------------------------------------------- shingles

  /** Distinct k-word shingles. Empty array when fewer than k tokens. */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(expr("array()").cast("array<string>"))

  /** Distinct character n-grams. Empty array for short strings. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(expr("array()").cast("array<string>"))

  /** Jaccard similarity of two pre-distinct shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a).cast("double") + size(b).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  // ----------------------------------------------------------- minhash

  /** One strong hash per shingle: md5 → 60-bit int → mod 2^31.
    * EXPENSIVE relative to the per-seed arithmetic — materialize this
    * as a column before fanning out seeds (inlining it under a
    * higher-order function re-evaluates the md5 pass per seed).
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("bigint") % lit(2147483648L))

  /** MinHash signature from precomputed shingle hashes: seed i takes
    * the minimum of the universal-hash family
    * `(h·(2i+1) + i·1000003 + 12345) mod 2^31` — the classic
    * one-strong-hash + affine-rehash construction, so the md5 pass
    * happens once per shingle, not once per (shingle × seed). All
    * intermediates stay < 2^36: safe under ANSI overflow checking.
    */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(hashes,
        h => pmod(h * (i * 2 + 1) + i * lit(1000003L) + lit(12345L), lit(2147483648L)))))

  /** Convenience composition of [[shingleHashes]] + [[minhashFromHashes]].
    * Prefer the split form with the hash column materialized when the
    * signature feeds more than one consumer.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    minhashFromHashes(shingleHashes(shingles), numHashes)

  /** LSH band keys: the signature split into `bands` contiguous bands
    * of `rows` entries, each hashed to one key. Docs sharing ANY band
    * key become candidate pairs.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        md5(concat_ws("|",
          transform(slice(sig, b * rows + 1, lit(rows)), x => x.cast("string")))).as("key")))

  /** Candidate near-duplicate pairs via MinHash+LSH, verified with
    * word-shingle Jaccard >= `threshold`. Returns (id_a, id_b, jac)
    * with id_a < id_b.
    *
    * Plan shape: per-doc signature (narrow) → explode bands (×bands) →
    * self equi-join on the band key (shuffle on key, no cross join) →
    * distinct pairs → exact verify. At 100 TB the join input is
    * |docs|×bands rows of (key, id) — the heavy text/shingle columns
    * are re-attached only for the surviving candidates.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.4): DataFrame =
    pairsFromShingles(
      docs.select(
        col(idCol).as("id"),
        wordShingles(TextAnalysis.tokens(lower(col(textCol))), shingleK).as("sh")),
      numHashes, bands, threshold)

  /** The shingle-agnostic MinHash+LSH pairing pipeline: takes any
    * `(id, sh: array<string>)` frame (word shingles, char n-grams, …)
    * and returns verified near-dup pairs. See [[minhashPairs]] for the
    * plan-shape notes.
    */
  def pairsFromShingles(
      withShingles: DataFrame,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val rows = numHashes / bands
    // Materialize shingles and band keys ONCE: both frames are read
    // 2×+ below (self-join sides, verify re-attach), and Spark
    // re-executes uncached subplans per reference — recomputing the
    // md5 signature pipeline 4-8× dominates runtime (higher-order
    // functions run interpreted, outside whole-stage codegen). This is
    // the "write signatures, then join them" step every production
    // MinHash pipeline has; MEMORY_AND_DISK spills at the 100 TB tier.
    // The md5 shingle-hash pass is materialized INSIDE the cached
    // frame: a plain projection would be collapsed back into the
    // per-seed lambda by CollapseProject and re-run once per seed; the
    // InMemoryRelation boundary is what guarantees one md5 pass per row.
    val withSh = withShingles
      .select(col("id"), col("sh"), shingleHashes(col("sh")).as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = withSh
      .select(col("id"), explode(lshBandKeys(minhashFromHashes(col("hs"), numHashes), bands, rows)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val cand = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  // ----------------------------------------------------------- simhash

  /** 60-bit SimHash over the token multiset: per-bit majority vote of
    * md5-derived token hashes (15 hex chars = 60 bits keeps the value
    * positive in a signed 64-bit integer). Near-duplicates differ in
    * few bits; pair candidates come from exact-matching any of the
    * `bands` bit-slices (each 60/bands bits), hamming-verified after.
    */
  /** 60-bit token hashes: first 15 hex chars of md5 parsed as a bigint
    * (60 bits keeps the value positive in a signed 64-bit integer, and
    * md5 keeps it portable across engines — DuckDB reproduces it with
    * the same substring+from-hex pipeline).
    */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => conv(substring(md5(t), 1, 15), 16, 10).cast("bigint"))

  /** Adds `outCol` = 60-bit SimHash of the token-array column
    * `toksCol`. One SQL higher-order-function expression over a
    * precomputed token-hash array: hashes are computed once (one array
    * pass), then the per-bit majority vote folds over them per bit.
    * Everything stays a codegen'd Column expression — no UDF, no
    * shuffle; SimHash is embarrassingly parallel per row.
    */
  def withSimhash(df: DataFrame, toksCol: String, outCol: String): DataFrame = {
    val hs = outCol + "__hs"
    df.withColumn(hs, tokenHashes(col(toksCol)))
      .withColumn(outCol, expr(
        s"""aggregate(
           |  transform(sequence(0, 59), j ->
           |    CASE WHEN aggregate(`$hs`, cast(0 as bigint),
           |                        (acc, h) -> acc + CASE WHEN (shiftright(h, j) % 2) = 1
           |                                             THEN 1 ELSE -1 END) > 0
           |         THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END),
           |  cast(0 as bigint), (a, x) -> a + x)""".stripMargin))
      .drop(hs)
  }

  /** Bit-slice keys for SimHash banding: `bands` keys of `bitsPerBand`
    * bits each; docs sharing any key are candidate pairs. Unrolled on
    * the Scala side so each shift amount is a literal.
    */
  def simhashBandKeys(sim: Column, bands: Int = 4, bitsPerBand: Int = 15): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        (shiftright(sim, b * bitsPerBand) % lit(1L << bitsPerBand)).as("key"))
    }: _*)

  /** SimHash near-dup pairs: per-doc 60-bit SimHash → explode bit-slice
    * band keys → self equi-join on (band, key) → Hamming-distance
    * verify. Same no-cross-join plan shape as [[pairsFromShingles]],
    * with an integer signature instead of a shingle set — the cheapest
    * of the near-dup families (one bigint per doc survives the shuffle).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 6,
      bands: Int = 4,
      bitsPerBand: Int = 15): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
    // Two bigints per doc; persisted because the self-join reads it
    // twice and the 60-bit majority vote (interpreted HOF) is the
    // expensive part — compute once, join the tiny signature frame.
    val withSim = withSimhash(base, "toks", "sim").select("id", "sim")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = withSim
      .select(col("id"), col("sim"),
        explode(simhashBandKeys(col("sim"), bands, bitsPerBand)).as("bk"))
      .select(col("id"), col("sim"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
