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
