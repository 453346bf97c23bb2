package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL audio metadata extraction from raw header bytes — no codec
  * libraries: WAV/RIFF layout is publicly specified (RIFF chunks; the
  * `fmt ` chunk carries format/channels/sample-rate/bit-depth, `data`
  * carries the payload size that fixes the duration). The audio
  * counterpart of [[ImageHeader]], and the non-stub member of the audio
  * family whose DECODE/transcribe step ([[BinaryOps]] stubs, whisper)
  * needs native models outside this sandbox.
  *
  * WAV chunk order is not fixed (LIST/INFO chunks may precede `fmt `),
  * so parsing is a bounded chunk WALK — a per-row UDF like the JPEG SOF
  * scan, reading only chunk headers (8 bytes each) plus the 16-byte fmt
  * payload, never audio data. Magic detection (RIFF/WAVE, FLAC, OggS,
  * ID3/MP3 sync) is pure fixed-offset expressions.
  */
object AudioHeader {

  /** Parsed WAV facts; duration derives from data size / byte rate. */
  private[graft] def wavInfo(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long)] = { // (channels, rate, bits, durMs)
    if (bytes == null || bytes.length < 44) return None
    def le(off: Int, len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v |= (bytes(off + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    def ascii(off: Int, len: Int): String =
      new String(bytes, off, len, java.nio.charset.StandardCharsets.US_ASCII)
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataLen: Option[Long] = None
    var walking = true
    while (walking && i + 8 <= bytes.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val id = ascii(i, 4)
      val size = le(i + 4, 4)
      if (id == "fmt " && i + 8 + 16 <= bytes.length) {
        val channels = le(i + 10, 2).toInt
        val rate = le(i + 12, 4).toInt
        val byteRate = le(i + 16, 4)
        val bits = le(i + 22, 2).toInt
        if (channels <= 0 || rate <= 0 || bits <= 0) return None
        fmt = Some((channels, rate, bits, byteRate))
      } else if (id == "data") {
        dataLen = Some(size)
      }
      // Advance in LONG space BEFORE touching the cursor: a corrupt chunk
      // declaring a ~2^31 size would wrap an Int increment negative and
      // index out of bounds; past-the-end just stops the walk (the data
      // chunk's payload legitimately extends past a header-only buffer).
      val next = i.toLong + 8L + size + (size & 1L)
      if (next > bytes.length || next <= i) walking = false
      else i = next.toInt
    }
    for ((channels, rate, bits, byteRate) <- fmt; dl <- dataLen) yield {
      val br = if (byteRate > 0) byteRate
        else rate.toLong * channels * bits / 8
      val durMs = if (br > 0) dl * 1000L / br else 0L
      (channels, rate, bits, durMs)
    }
  }

  /** struct(format, channels, sample_rate, bits, duration_ms) — WAV
    * parses fully; FLAC/OGG/MP3 are magic-detected with null detail
    * (their metadata needs full tag/frame parsing — format routing is
    * the curation decision); unknown payloads yield "unknown". */
  def infoCol(bin: Column): Column = {
    val wavUdf = udf { (bytes: Array[Byte]) =>
      wavInfo(bytes) match {
        case Some((ch, rate, bits, dur)) =>
          AudioInfo("wav", ch, rate, bits, dur)
        case None => AudioInfo("wav", null, null, null, null)
      }
    }
    val nullInt = lit(null).cast("int")
    val nullLong = lit(null).cast("bigint")
    def magic(hexPrefix: String): Column =
      hex(substring(bin, 1, hexPrefix.length / 2)) === hexPrefix
    val isWav = magic("52494646") && length(bin) >= 12 &&
      hex(substring(bin, 9, 4)) === "57415645" // RIFF....WAVE
    when(isWav, wavUdf(bin))
      .when(magic("664C6143"), struct(lit("flac").as("format"), // fLaC
        nullInt.as("channels"), nullInt.as("sample_rate"),
        nullInt.as("bits"), nullLong.as("duration_ms")))
      .when(magic("4F676753"), struct(lit("ogg").as("format"), // OggS
        nullInt.as("channels"), nullInt.as("sample_rate"),
        nullInt.as("bits"), nullLong.as("duration_ms")))
      .when(magic("494433") || magic("FFFB") || magic("FFF3"),
        struct(lit("mp3").as("format"), // ID3 tag or MPEG sync
          nullInt.as("channels"), nullInt.as("sample_rate"),
          nullInt.as("bits"), nullLong.as("duration_ms")))
      .otherwise(struct(lit("unknown").as("format"),
        nullInt.as("channels"), nullInt.as("sample_rate"),
        nullInt.as("bits"), nullLong.as("duration_ms")))
  }

  // BYTECODE-PUBLIC (private[graft], not private) with boxed Java types
  // for nullable fields: a private nested case class (and Option
  // accessors) makes the generated serializer fail to compile, silently
  // dropping every task to interpreted mode.
  private[graft] case class AudioInfo(format: String, channels: Integer,
      sample_rate: Integer, bits: Integer, duration_ms: java.lang.Long)

  /** Append parsed audio metadata for a binary column. */
  def parse(df: DataFrame, binaryCol: String,
      outCol: String = "audio_header"): DataFrame =
    df.withColumn(outCol, infoCol(col(binaryCol)))

  /** Canonical 44-byte WAV header + silent payload — the fixture writer
    * ([[graft.sources.ParseFixtures]] convention): real RIFF bytes the
    * parser must round-trip. */
  def makeWav(channels: Int, sampleRate: Int, bits: Int,
      dataBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = (0 until 2).foreach(i =>
      out.write((v >> (8 * i)) & 0xff))
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val byteRate = sampleRate.toLong * channels * bits / 8
    tag("RIFF"); w32(36L + dataBytes); tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(channels); w32(sampleRate)
    w32(byteRate); w16(channels * bits / 8); w16(bits)
    tag("data"); w32(dataBytes)
    out.write(new Array[Byte](dataBytes))
    out.toByteArray
  }
}
