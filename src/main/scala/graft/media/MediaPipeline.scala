package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record. `width`/`height` come from the (stubbed)
  * decoder; `features` is a real byte-level feature vector.
  */
final case class DecodedMedia(
    doc_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    features: Array[Float])

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded and featurized in distributed batches.
  *
  * The Spark-side structure is the deliverable (schema, partitioning,
  * batch shape): media travels as a `binary` column beside a metadata
  * struct; decode/feature-extract run per partition so a real codec
  * would amortize native init across a batch, exactly like a Python
  * `mapInPandas` batch UDF. The codec itself is STUBBED (no image/audio
  * libraries in this environment) behind [[decodeStub]] — a
  * deterministic fake with the same signature a real decoder would
  * have; everything around it is real and tested.
  */
object MediaPipeline {

  /** Synthesize an opaque media column from the documents table: the
    * UTF-8 payload stands in for image/audio bytes; `meta` carries the
    * typed metadata a real ingest would attach.
    */
  def toMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("fake/utf8").as("kind"),
        length(col("text")).as("n_bytes"),
        col("lang").as("origin")).as("meta"))

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * derives fake dimensions from the payload length. A real
    * implementation would decode `bytes` here (per-partition, so codec
    * state is reused across the batch).
    */
  private[media] def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 640 + 1, (n * 7) % 480 + 1)
  }

  /** Real featurization: 16-bin byte histogram, L1-normalized. */
  private[media] def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) >>> 4) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var b = 0
      while (b < 16) { bins(b) /= bytes.length.toFloat; b += 1 }
    }
    bins
  }

  /** Decode + featurize in partition-sized batches. Returns a typed
    * Dataset; partitioning of the input is preserved (no shuffle).
    */
  def decodeAndFeaturize(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        // per-partition init of a real codec would go here
        batch.map { case (id, bytes, kind) =>
          val (w, h) = decodeStub(bytes)
          DecodedMedia(id, kind, bytes.length, w, h, byteHistogram(bytes))
        }
      }
  }

  /** Flat feature frame for downstream relational use. */
  def mediaFeatures(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeAndFeaturize(toMediaTable(documents))
      .toDF()
      .select(
        col("doc_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"),
        round(element_at(col("features"), 1), 6).as("f0"))
      .orderBy("doc_id")
}
