package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.metadata.IIOMetadataNode

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
    * delta-optimizing encoder carry partial frames — use
    * [[gifComposedFrames]] to run the disposal-method state machine and
    * get full playback frames; [[encodeAnimatedGif]] writes full frames
    * so its output needs no composition.
    */
  def gifFrames(bytes: Array[Byte]): Seq[BufferedImage] = {
    val (n, frames) = gifSelectFrames(bytes, _ => true)
    require(frames.length == n, "internal: full demux must decode every frame")
    frames.map(_._2)
  }

  /** Animated GIF, delta-optimized: frame 0 is stored full; each later
    * frame stores only the bounding box of pixels that changed vs the
    * previous frame, placed at its (left, top) offset with disposal
    * `doNotDispose` — the classic GIF size optimization. An unchanged
    * frame stores a 1×1 box (GIF has no zero-size frames). All input
    * frames must share one canvas size. [[gifFrames]] on this output
    * returns the PARTIAL stored frames; [[gifComposedFrames]]
    * reconstructs playback.
    */
  def encodeAnimatedGifDelta(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "an animated GIF needs at least one frame")
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "delta encoding requires a constant canvas size across frames")
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var prev: BufferedImage = null
      frames.foreach { f =>
        val box =
          if (prev == null) new java.awt.Rectangle(0, 0, w, h)
          else {
            var (x0, y0, x1, y1) = (w, h, -1, -1)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                if (f.getRGB(x, y) != prev.getRGB(x, y)) {
                  if (x < x0) x0 = x
                  if (y < y0) y0 = y
                  if (x > x1) x1 = x
                  if (y > y1) y1 = y
                }
                x += 1
              }
              y += 1
            }
            if (x1 < 0) new java.awt.Rectangle(0, 0, 1, 1) // identical frame
            else new java.awt.Rectangle(x0, y0, x1 - x0 + 1, y1 - y0 + 1)
          }
        val sub = copyRegion(f, box)
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(sub), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        // the default tree carries a GENERIC 256-entry LocalColorTable
        // (not the image's palette); supplying it would override the
        // image's color model and scramble colors — drop it so the
        // writer derives the palette from the image, as the
        // null-metadata path does
        val lct = root.getElementsByTagName("LocalColorTable")
        (0 until lct.getLength).reverse.foreach(i => root.removeChild(lct.item(i)))
        val desc = root.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", box.x.toString)
        desc.setAttribute("imageTopPosition", box.y.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        val gce = {
          val existing = root.getElementsByTagName("GraphicControlExtension")
          if (existing.getLength > 0) existing.item(0).asInstanceOf[IIOMetadataNode]
          else { // DTD order puts GCE after ImageDescriptor/LocalColorTable
            val n = new IIOMetadataNode("GraphicControlExtension")
            root.appendChild(n)
            n
          }
        }
        gce.setAttribute("disposalMethod", "doNotDispose")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(sub, null, meta), null)
        prev = f
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Compose an animated GIF into full playback frames by running the
    * disposal-method state machine over the stored (possibly partial)
    * frames: each frame draws at its (left, top) offset over the
    * canvas, then its disposal applies — `none`/`doNotDispose` keeps
    * the canvas, `restoreToBackgroundColor` clears the frame's
    * rectangle, `restoreToPrevious` reverts the canvas to its
    * pre-frame state. Full-frame GIFs compose to their stored frames
    * unchanged.
    */
  def gifComposedFrames(bytes: Array[Byte]): Seq[BufferedImage] = {
    val (n, frames) = gifComposedSelectFrames(bytes, _ => true)
    require(frames.length == n, "internal: full composition must emit every frame")
    frames.map(_._2)
  }

  /** [[gifComposedFrames]] retaining only the frames whose index passes
    * `keep`. Unlike [[gifSelectFrames]], every stored frame up to the
    * LAST kept index must still be decoded — frame i's pixels depend on
    * frames 0..i-1 by construction of delta encoding — so sampling
    * saves retention and downstream feature cost, not decode. Returns
    * (total frame count, kept (idx, full frame) pairs).
    */
  def gifComposedSelectFrames(
      bytes: Array[Byte],
      keep: Int => Boolean): (Int, Seq[(Int, BufferedImage)]) = {
    require(sniffKind(bytes) == "image/gif", "payload is not a GIF")
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val lastKept = (n - 1 to 0 by -1).find(keep).getOrElse(-1)
      if (lastKept < 0) (n, Seq.empty)
      else {
        // metadata for ALL n frames (cheap — no pixel decode): the
        // canvas must not depend on which frames the stride keeps, or
        // the same clip would report different dimensions at different
        // strides whenever the LSD is absent/undersized. Pixel decode
        // below remains bounded by lastKept.
        val metas = (0 until n).map(i => gifFrameMeta(reader, i))
        // canvas = logical screen, or the frame extents if the LSD is
        // absent/undersized (encoders disagree; playback uses the max)
        val canvasW = math.max(gifScreenDims(reader)._1, metas.map(m => m.x + m.w).max)
        val canvasH = math.max(gifScreenDims(reader)._2, metas.map(m => m.y + m.h).max)
        val canvas = new BufferedImage(canvasW, canvasH, BufferedImage.TYPE_INT_ARGB)
        val g = canvas.createGraphics()
        val out = Seq.newBuilder[(Int, BufferedImage)]
        var i = 0
        while (i <= lastKept) {
          val m = metas(i)
          val saved = if (m.disposal == "restoreToPrevious") copyRegion(
            canvas, new java.awt.Rectangle(0, 0, canvasW, canvasH)) else null
          g.drawImage(reader.read(i), m.x, m.y, null)
          if (keep(i)) out += ((i, copyRegion(
            canvas, new java.awt.Rectangle(0, 0, canvasW, canvasH))))
          m.disposal match {
            case "restoreToBackgroundColor" =>
              val comp = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Clear)
              g.fillRect(m.x, m.y, m.w, m.h)
              g.setComposite(comp)
            case "restoreToPrevious" =>
              val comp = g.getComposite
              g.setComposite(java.awt.AlphaComposite.Src)
              g.drawImage(saved, 0, 0, null)
              g.setComposite(comp)
            case _ => // none / doNotDispose: canvas persists
          }
          i += 1
        }
        g.dispose()
        (n, out.result())
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Placement + disposal of one stored frame, from the GIF's real
    * per-frame metadata (`javax_imageio_gif_image_1.0`).
    */
  private final case class GifFrameMeta(
      x: Int, y: Int, w: Int, h: Int, disposal: String)

  private def gifFrameMeta(
      reader: javax.imageio.ImageReader, i: Int): GifFrameMeta = {
    val root = reader.getImageMetadata(i)
      .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[IIOMetadataNode]
    def first(name: String): Option[IIOMetadataNode] = {
      val kids = root.getElementsByTagName(name)
      if (kids.getLength > 0) Some(kids.item(0).asInstanceOf[IIOMetadataNode]) else None
    }
    val desc = first("ImageDescriptor").getOrElse(throw new IllegalArgumentException(
      s"GIF frame $i carries no ImageDescriptor"))
    GifFrameMeta(
      desc.getAttribute("imageLeftPosition").toInt,
      desc.getAttribute("imageTopPosition").toInt,
      desc.getAttribute("imageWidth").toInt,
      desc.getAttribute("imageHeight").toInt,
      first("GraphicControlExtension").map(_.getAttribute("disposalMethod"))
        .filter(_.nonEmpty).getOrElse("none"))
  }

  /** Logical screen size from the GIF stream metadata; (0, 0) when the
    * descriptor is absent (the caller falls back to frame extents).
    */
  private def gifScreenDims(reader: javax.imageio.ImageReader): (Int, Int) = {
    val root = reader.getStreamMetadata
      .getAsTree("javax_imageio_gif_stream_1.0").asInstanceOf[IIOMetadataNode]
    val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
    if (lsd.getLength == 0) (0, 0)
    else {
      val d = lsd.item(0).asInstanceOf[IIOMetadataNode]
      def dim(a: String) = d.getAttribute(a) match {
        case s if s.nonEmpty && s.forall(_.isDigit) => s.toInt
        case _ => 0
      }
      (dim("logicalScreenWidth"), dim("logicalScreenHeight"))
    }
  }

  /** Deep-copy a rectangle of `src` into a fresh image of the same
    * color model — safe to hand to codecs (no shared raster, no
    * translated origin).
    */
  private def copyRegion(src: BufferedImage, r: java.awt.Rectangle): BufferedImage = {
    val out = new BufferedImage(
      src.getColorModel,
      src.getRaster.createCompatibleWritableRaster(r.width, r.height),
      src.isAlphaPremultiplied, null)
    out.setData(src.getData(r).createTranslatedChild(0, 0))
    out
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
        bins(lumaAt(img, x, y) >>> 4) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var b = 0
    while (b < 16) { bins(b) /= n; b += 1 }
    bins
  }

  private def lumaAt(img: BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
      (rgb & 0xff) * 114) / 1000
  }

  /** 64-bit difference hash (dHash, the standard perceptual image
    * fingerprint: Krawetz's public "kind of like that" formulation) —
    * bilinear-resize to 9×8, integer luma per pixel ([[lumaHistogram]]'s
    * formula), bit (y·8+x) set when luma(x,y) < luma(x+1,y). Horizontal
    * gradients survive re-encoding, resizing and small edits, so
    * near-identical images land within a few bits of Hamming distance —
    * the visual analogue of SimHash over text.
    */
  def dHash64(img: BufferedImage): Long = {
    val s = resizeImage(img, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lumaAt(s, x, y) < lumaAt(s, x + 1, y))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** (doc_id, kind, phash) perceptual-hash table over an opaque media
    * column — the [[decodeAndFeaturize]] per-partition decode shape;
    * the 8-byte hash is what downstream dedup shuffles, never pixels.
    */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, kind) =>
          (id, kind, dHash64(decodeImage(bytes)))
        }
      }
      .toDF("doc_id", "kind", "phash")
  }

  /** Image near-duplicate pairs by banded Hamming over a perceptual-
    * hash table `(doc_id, variant, phash)` — the SimHash band trick on
    * the visual fingerprint (Manku et al. 2007's simhash-table layout):
    * split the 64-bit hash into `nBands` equal-width band keys,
    * candidates meet ONLY inside a (band, key) bucket equi-join, then
    * the exact Hamming distance filters to ≤ `maxHamming`. With
    * maxHamming < nBands the banding is EXACT by pigeonhole
    * (≤ maxHamming differing bits cannot touch every band, so some
    * band key matches) — recall 1 with candidate mass bounded by
    * bucket co-occupancy instead of n²/2.
    *
    * The bucket join rides
    * [[graft.ops.BucketedPairs.cappedCandidatePairs]] — an 8-bit band
    * key has only 256 values, so a LARGE corpus necessarily piles
    * Θ(N/256) rows per bucket and the shared cap keeps each reducer's
    * fan-out bounded (WARN + degraded-recall contract documented
    * there). Below the cap the listing is exhaustive, i.e. exact.
    *
    * Output: (i_doc, i_var, j_doc, j_var, hamming), each unordered row
    * pair once under (doc, variant) lexicographic order, hamming as
    * BIGINT, sorted by all four keys.
    */
  def phashNearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 7,
      nBands: Int = 8,
      cap: Int = 4096): DataFrame = {
    require(nBands > 0 && 64 % nBands == 0,
      s"nBands must divide 64: $nBands")
    require(maxHamming >= 0 && maxHamming < nBands,
      s"banded candidates are exact only when maxHamming < nBands " +
        s"(pigeonhole): maxHamming=$maxHamming nBands=$nBands")
    // a single-variant table (e.g. [[perceptualHashes]]' direct output)
    // has no `variant` column — give it one so the two engine methods
    // compose without a caller-side withColumn
    val hashes0 =
      if (hashes.columns.contains("variant")) hashes
      else hashes.withColumn("variant", lit("orig"))
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // variant-KIND-sized collect (a handful of strings): gives every
    // (doc, variant) row a doc-major dense long id, so the kernel's
    // i < j id order IS the output's lexicographic (doc, var) order
    val variants = hashes0.select("variant").distinct().orderBy("variant")
      .collect().map(_.getString(0)).toSeq
    val nv = variants.size.toLong
    val vord = map(variants.zipWithIndex.flatMap { case (v, i) =>
      Seq(lit(v), lit(i.toLong)) }: _*)
    def withId(df: DataFrame) = df.withColumn("id",
      col("doc_id") * nv + element_at(vord, col("variant")))
    val members = withId(hashes0)
      .select(col("id"), col("phash").as("sigh"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bucket",
        expr(s"shiftrightunsigned(sigh, band * $width)")
          .bitwiseAND(lit(mask)))
      .select("id", "band", "bucket", "sigh")
    val pairs = graft.ops.BucketedPairs
      .cappedCandidatePairs(members, cap)
      .distinct()
    val side = withId(hashes0).select("id", "doc_id", "variant", "phash")
    pairs
      .join(side.select(col("id").as("i"), col("doc_id").as("i_doc"),
        col("variant").as("i_var"), col("phash").as("i_hash")), Seq("i"))
      .join(side.select(col("id").as("j"), col("doc_id").as("j_doc"),
        col("variant").as("j_var"), col("phash").as("j_hash")), Seq("j"))
      .withColumn("hamming",
        bit_count(col("i_hash").bitwiseXOR(col("j_hash"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("i_doc", "i_var", "j_doc", "j_var", "hamming")
      .orderBy("i_doc", "i_var", "j_doc", "j_var")
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
