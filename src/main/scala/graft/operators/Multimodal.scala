package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A media item: opaque payload bytes + typed metadata. The engine
  * treats image/audio/video as `binary` columns and never interprets
  * them except through a pluggable decoder.
  */
final case class MediaItem(
    media_id: Long,
    kind: String,
    payload: Array[Byte],
    width: Int,
    height: Int,
    n_frames: Int)

/** Decoder output: per-item feature vector plus byte accounting. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal-column operators for training-data pipelines.
  *
  * Design: image/audio/video payloads are opaque `binary` columns with
  * typed metadata columns beside them; everything Spark-side (schema,
  * partitioning, batch shape) is real, while the codec step itself is a
  * pluggable function — this container has no image/audio libraries,
  * so the default decoder is a DETERMINISTIC STUB (byte histogram); a
  * real deployment swaps in e.g. a JPEG decoder + model forward pass
  * without touching the plumbing.
  *
  * Scale notes: decode is embarrassingly parallel per row. The batched
  * `mapPartitions` shape ([[decodeFeatures]]) is the Scala analog of
  * PySpark's `mapInPandas` — the decoder sees `batchSize` items at a
  * time so real codecs/models can amortize per-batch init. Payload
  * bytes never shuffle: decode immediately after the scan, project to
  * features, and only the (small) feature vectors flow onward.
  */
object Multimodal {

  /** Synthesize a deterministic media table from any id+text frame —
    * the payload is md5-chained pseudo-bytes (stands in for real media
    * blobs, which the test environment cannot decode anyway). One
    * md5 block = 16 bytes; `blocks` controls payload size.
    */
  def syntheticMedia(df: DataFrame, idCol: String, seedCol: String, blocks: Int = 4): DataFrame = {
    val chain = concat((0 until blocks).map(i =>
      md5(concat(lit(i.toString), lit(":"), col(seedCol)))): _*)
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      unhex(chain).as("payload"),
      (pmod(col(idCol), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col(idCol), lit(3)) * 120 + 240).cast("int").as("height"),
      (pmod(col(idCol), lit(8)) + 1).cast("int").as("n_frames"))
  }

  /** The deterministic stand-in for a real decoder: 16-bin byte
    * histogram, L1-normalized. Pure function of the payload, so results
    * reproduce across executors and engines.
    */
  val stubDecoder: Array[Byte] => Array[Float] = { bytes =>
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Batched feature extraction — the `mapInPandas` analog: the decoder
    * runs once per item but the iterator is consumed in `batchSize`
    * groups, the hook where a real implementation initializes a codec /
    * model per batch instead of per item. Narrow (no shuffle).
    */
  def decodeFeatures(
      items: Dataset[MediaItem],
      batchSize: Int = 64,
      decoder: Array[Byte] => Array[Float] = stubDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: val codec = acquireCodec(); batch.map(m => codec.decode(...))
        batch.map(m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length, decoder(m.payload)))
      }
    }
  }

  /** Perceptual difference-hash (dHash) over a payload's leading
    * `rows × cols` bytes, treated as a row-major "pixel" grid: bit
    * (r, c) is set iff pixel (r, c+1) > pixel (r, c) — the standard
    * 56-bit gradient signature real image-dedup pipelines compute on
    * the 9×8-downscaled grayscale image. Here the "pixels" are the
    * decoder's output bytes (this environment's decoder is the
    * deterministic stub, so the grid is the raw payload head — a real
    * deployment points this at decoded luma bytes; the hash, banding,
    * and verify machinery are identical either way).
    *
    * Pure codegen'd Column expression: 64 one-byte substrings → hex →
    * int, 56 literal-shift comparison terms, no UDF. Bytes beyond the
    * payload's end read as null comparisons and contribute 0-bits
    * (deterministic for short payloads).
    */
  def dHash(payload: Column, rows: Int = 8, cols: Int = 8): Column = {
    def byteAt(i: Int): Column =
      conv(hex(substring(payload, i + 1, 1)), 16, 10).cast("int")
    val terms = for {
      r <- 0 until rows
      c <- 0 until (cols - 1)
    } yield {
      val idx = r * (cols - 1) + c
      when(byteAt(r * cols + c + 1) > byteAt(r * cols + c), lit(1L << idx))
        .otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Perceptual near-dup candidate pairs over a media frame — the
    * image-space twin of [[Dedup.simhashPairs]]'s text SimHash:
    * [[dHash]] per item, the SAME bit-slice band keys, hot-bucket
    * cap, (band, key) self equi-join, and Hamming verify. 56 bits →
    * 4 bands × 14 bits by default, so a true near-dup (hamming ≤ 6)
    * keeps ≥ 89% odds of an untouched band at the default threshold,
    * and only the two bigint signatures ride the shuffle — payloads
    * never leave the scan.
    */
  def phashPairs(
      media: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 6,
      bands: Int = 4,
      bitsPerBand: Int = 14,
      maxBucket: Int = Dedup.LshMaxBucket): DataFrame = {
    val withH = media.select(col(idCol).as("id"), dHash(col(payloadCol)).as("sim"))
    val banded = withH
      .select(col("id"), col("sim"),
        explode(Dedup.simhashBandKeys(col("sim"), bands, bitsPerBand)).as("bk"))
      .select(col("id"), col("sim"), col("bk.band").as("band"), col("bk.key").as("key"))
    val capped = Dedup.splitBuckets(banded, maxBucket)
    capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.__sub") === col("b.__sub") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame sampling for video payloads: every `everyK`-th frame-sized
    * slice of the payload, as an array of binary frames. Pure Column
    * expression — stays in codegen, no UDF.
    */
  def frameSample(payload: Column, nFrames: Column, frameBytes: Int, everyK: Int): Column =
    transform(
      sequence(lit(0), greatest(floor((nFrames - 1) / everyK).cast("int"), lit(0))),
      i => substring(payload, (i * everyK * frameBytes + 1).cast("int"), lit(frameBytes)))

  /** Resize metadata transform: the STUB half of a real resize — it
    * rescales the metadata and tags the payload untouched (no codec in
    * this environment); the plumbing (schema in/out) is what a real
    * resizer plugs into.
    */
  def resizeStub(df: DataFrame, maxSide: Int): DataFrame =
    // scale is materialized as a column FIRST: inlining the expression
    // into each withColumn would re-evaluate it against the already-
    // mutated width/height.
    df.withColumn("__scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("resized", col("__scale") < 1.0)
      .withColumn("width", (col("width") * col("__scale")).cast("int"))
      .withColumn("height", (col("height") * col("__scale")).cast("int"))
      .drop("__scale")
}
