package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record. `width`/`height` are REAL values decoded
  * from the PNG payload; `features` is a 16-bin luma histogram over the
  * decoded pixels.
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
  * Media travels as a `binary` column beside a metadata struct;
  * decode/feature-extract run per partition (mapPartitions) so codec
  * state amortizes across a batch, exactly like a Python `mapInPandas`
  * batch UDF. The codecs are REAL: payloads are PNG or JPEG images
  * encoded and decoded with the JDK's javax.imageio (no external
  * libraries), so `width`/`height`/`features` are true decoded values,
  * not fakes. The format is sniffed from the payload's magic bytes
  * ([[sniffKind]]) and cross-checked against the declared metadata —
  * a mislabeled payload fails fast instead of silently decoding as the
  * wrong type.
  */
object MediaPipeline {

  /** Deterministic image stand-in for a real ingest payload: dimensions
    * derive from doc_id, pixel content from the text hash, so the decode
    * side can be verified against ground truth. Even doc_ids encode as
    * PNG, odd as JPEG, exercising both codecs in one table.
    */
  private[media] def synthesizeImage(docId: Long, text: String): Array[Byte] = {
    val w = 8 + (docId % 32).toInt
    val h = 8 + ((docId * 3) % 24).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val seed = text.hashCode
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (seed * 31 + x * 7 + y * 131) & 0xffffff)
        x += 1
      }
      y += 1
    }
    if (docId % 2 == 0) encodePng(img) else encodeJpeg(img)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** GIF (palette-quantized by the encoder — dims are exact, colors are
    * not; the dimension/shape plumbing is what the decode contract
    * pins).
    */
  def encodeGif(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", out)
    out.toByteArray
  }

  /** Animated GIF: encode `frames` as one multi-frame GIF via the
    * JDK's real GIF sequence writer. Every frame is written FULL
    * (no delta optimization), so [[gifFrames]] returns ready frames
    * with no composition step.
    */
  def encodeAnimatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "an animated GIF needs at least one frame")
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Demux an animated GIF into its frames with the JDK's real GIF
    * reader. Frames are returned AS STORED: GIFs written by a
    * delta-optimizing encoder carry partial frames that would need
    * compositing for playback — [[encodeAnimatedGif]] writes full
    * frames, and a production pipeline would hand delta GIFs to a
    * native decoder at exactly this seam.
    */
  def gifFrames(bytes: Array[Byte]): Seq[BufferedImage] = {
    val (n, frames) = gifSelectFrames(bytes, _ => true)
    require(frames.length == n, "internal: full demux must decode every frame")
    frames.map(_._2)
  }

  /** Demux a GIF decoding ONLY the frames whose index passes `keep` —
    * the stride-sampling primitive: skipped frames are never decoded or
    * retained (a 1000-frame clip sampled at stride 10 decodes 100
    * images, not 1000). Returns (total frame count, kept (idx, frame)
    * pairs).
    */
  def gifSelectFrames(
      bytes: Array[Byte],
      keep: Int => Boolean): (Int, Seq[(Int, BufferedImage)]) = {
    require(sniffKind(bytes) == "image/gif", "payload is not a GIF")
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (n, (0 until n).collect { case i if keep(i) => (i, reader.read(i)) })
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** MIME type from the payload's magic bytes — the payload itself is
    * the source of truth for its format, never the file name or caller-
    * supplied metadata. Fails fast on unknown formats.
    */
  def sniffKind(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "image/png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "image/jpeg"
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') "image/gif"
    else throw new IllegalArgumentException(
      s"unrecognized media payload (${bytes.length} bytes) — supported: PNG, JPEG, GIF")

  /** Real image decode (JDK ImageIO; PNG or JPEG, dispatched on the
    * payload's magic bytes). Fails fast on undecodable bytes — a
    * corrupt payload must surface, not produce a plausible fake.
    */
  def decodeImage(bytes: Array[Byte]): BufferedImage = {
    sniffKind(bytes) // reject unknown formats with a clear message
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable media payload (${bytes.length} bytes)")
    img
  }

  /** Decoded (width, height) of a PNG/JPEG payload. */
  def decodeDims(bytes: Array[Byte]): (Int, Int) = {
    val img = decodeImage(bytes)
    (img.getWidth, img.getHeight)
  }

  /** 16-bin luma histogram over decoded pixels, L1-normalized. */
  private[media] def lumaHistogram(img: BufferedImage): Array[Float] = {
    val bins = new Array[Float](16)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        bins(luma >>> 4) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var b = 0
    while (b < 16) { bins(b) /= n; b += 1 }
    bins
  }

  /** Synthesize an opaque media column from the documents table: one
    * real PNG or JPEG per document; `meta` carries the typed metadata a
    * real ingest would attach. Encoding runs per partition on executors.
    */
  def toMediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text, lang) =>
          val img = synthesizeImage(id, text)
          (id, img, sniffKind(img), img.length, lang)
        }
      }
      .toDF("doc_id", "media", "kind", "n_bytes", "origin")
      .select(col("doc_id"), col("media"),
        struct(col("kind"), col("n_bytes"), col("origin")).as("meta"))
  }

  /** Ingest a DIRECTORY of raw media files via Spark's built-in
    * `binaryFile` source — the front door for real multimodal ingest:
    * executors read file bytes directly (no driver involvement, no
    * decode at scan time), `pathGlobFilter` prunes at listing time, and
    * `spark.sql.files.maxPartitionBytes` sizes partitions as for any
    * file scan. Output matches [[toMediaTable]]'s (doc_id, media, meta)
    * schema, so [[decodeAndFeaturize]] / [[resizedMedia]] compose
    * unchanged on real files: doc_id = xxhash64(path) (deterministic),
    * kind sniffed from the payload's magic bytes on the executor,
    * origin = the source path.
    */
  def ingestBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(xxhash64(col("path")).as("doc_id"), col("path"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, p, bytes) =>
          (id, bytes, sniffKind(bytes), bytes.length, p)
        }
      }
      .toDF("doc_id", "media", "kind", "n_bytes", "origin")
      .select(col("doc_id"), col("media"),
        struct(col("kind"), col("n_bytes"), col("origin")).as("meta"))
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
        // per-partition: ImageIO codec lookup state is JVM-wide; a
        // native codec would be initialized here once per batch
        batch.map { case (id, bytes, kind) =>
          val sniffed = sniffKind(bytes)
          require(sniffed == kind,
            s"doc $id: payload is $sniffed but metadata declares $kind")
          val img = decodeImage(bytes)
          DecodedMedia(id, kind, bytes.length,
            img.getWidth, img.getHeight, lumaHistogram(img))
        }
      }
  }

  /** Bilinear resize — the standard pre-featurization normalization
    * step (thumbnails, fixed-size model inputs).
    */
  def resizeImage(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Resize every payload to `w`×`h` and re-encode as PNG (lossless, so
    * downstream decodes see exactly the resized pixels regardless of the
    * source format). Same per-partition batch shape as
    * [[decodeAndFeaturize]]; partitioning preserved, no shuffle.
    */
  def resizedMedia(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"), col("meta.origin").as("origin"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, origin) =>
          val png = encodePng(resizeImage(decodeImage(bytes), w, h))
          (id, png, "image/png", png.length, origin)
        }
      }
      .toDF("doc_id", "media", "kind", "n_bytes", "origin")
      .select(col("doc_id"), col("media"),
        struct(col("kind"), col("n_bytes"), col("origin")).as("meta"))
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
