package graft.media

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One decoded audio record: true decoded sample count / rate plus
  * cheap signal features (RMS level, zero-crossing count).
  */
final case class DecodedAudio(
    doc_id: Long,
    n_bytes: Int,
    sample_rate: Int,
    n_samples: Long,
    duration_ms: Long,
    rms: Double,
    zero_crossings: Long)

/** Audio-column plumbing: opaque WAV payloads decoded and featurized in
  * distributed batches — the audio twin of [[MediaPipeline]].
  *
  * The codec is REAL: payloads are RIFF/WAVE PCM files encoded and
  * decoded with the JDK's javax.sound.sampled (no external libraries),
  * so sample counts, rates and signal features are true decoded values.
  * The same mapPartitions batch shape carries over unchanged to a
  * native codec (mp3/flac) — only [[decodePcm]] would swap.
  */
object AudioPipeline {

  /** 16-bit mono PCM WAV magic: RIFF....WAVE. */
  def sniffWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Deterministic WAV stand-in for a real ingest payload: a sine tone
    * whose frequency/length derive from doc_id, so the decode side can
    * be verified against ground truth.
    */
  private[media] def synthesizeWav(docId: Long, sampleRate: Int = 8000): Array[Byte] = {
    val nSamples = 400 + (docId % 32).toInt * 25
    val freqHz = 100.0 + (docId % 7).toDouble * 50.0
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toShort
      i += 1
    }
    encodeWav(samples, sampleRate)
  }

  /** Encode 16-bit mono little-endian PCM as a WAV file. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real WAV decode (JDK javax.sound): returns (samples, sampleRate).
    * Fails fast on undecodable bytes.
    */
  def decodePcm(bytes: Array[Byte]): (Array[Short], Int) = {
    require(sniffWav(bytes), s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got ${fmt.getSampleSizeInBits}-bit ${fmt.getChannels}ch")
      val raw = in.readAllBytes()
      val samples = new Array[Short](raw.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) =
          if (fmt.isBigEndian) (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort
          else (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
        i += 1
      }
      (samples, fmt.getSampleRate.toInt)
    } finally in.close()
  }

  /** Synthesize an opaque audio column from the documents table. */
  def toAudioTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val wav = synthesizeWav(id)
        (id, wav, "audio/wav", wav.length)
      })
      .toDF("doc_id", "media", "kind", "n_bytes")
      .select(col("doc_id"), col("media"),
        struct(col("kind"), col("n_bytes")).as("meta"))
  }

  /** Decode + featurize in partition-sized batches (no shuffle). */
  def decodeAndFeaturize(audio: DataFrame): Dataset[DecodedAudio] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (samples, rate) = decodePcm(bytes)
        var sumSq = 0.0
        var zc = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i) / 32768.0
          sumSq += v * v
          if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) zc += 1
          i += 1
        }
        val rms = if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length)
        DecodedAudio(id, bytes.length, rate, samples.length.toLong,
          samples.length.toLong * 1000 / rate, rms, zc)
      })
  }

  /** Flat audio feature frame for downstream relational use. */
  def audioFeatures(documents: DataFrame): DataFrame =
    decodeAndFeaturize(toAudioTable(documents))
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("duration_ms"), round(col("rms"), 6).as("rms"), col("zero_crossings"))
      .orderBy("doc_id")
}
