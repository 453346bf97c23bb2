package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL image metadata extraction from raw header bytes — no codec
  * libraries: PNG/GIF/BMP dimensions live at fixed offsets and JPEG's in
  * its SOF segment, all publicly specified (PNG RFC 2083 IHDR; GIF89a
  * logical screen descriptor; BMP BITMAPINFOHEADER; JPEG ISO/IEC 10918
  * marker segments). This is the part of the multimodal family that needs
  * no decode kernel, so unlike [[BinaryOps.decodeImageStub]] it is NOT a
  * stub: the bytes parsed are the real formats' real headers.
  *
  * PNG/GIF/BMP parse as PURE codegen'd expressions (substring + hex/conv
  * byte arithmetic over the binary column — fixed offsets, no UDF, fused
  * into the scan). JPEG needs a variable-length marker scan (segment
  * lengths chain), which no fixed expression tree can express — that one
  * format routes through a bounded per-row UDF (reads only until SOF,
  * never decodes image data). Magic-number dispatch picks the path per
  * row.
  */
object ImageHeader {

  /** Big-endian unsigned int from `len` bytes at 1-based `off`. */
  private def be(bin: Column, off: Int, len: Int): Column =
    conv(hex(substring(bin, off, len)), 16, 10).cast("int")

  /** Little-endian unsigned value (as long — 4 bytes exceed int range)
    * from `len` bytes at 1-based `off`. */
  private def le(bin: Column, off: Int, len: Int): Column =
    (0 until len).map(i =>
      conv(hex(substring(bin, off + i, 1)), 16, 10).cast("bigint") *
        lit(1L << (8 * i)))
      .reduce(_ + _)

  private def magic(bin: Column, hexPrefix: String): Column =
    hex(substring(bin, 1, hexPrefix.length / 2)) === hexPrefix

  /** JPEG SOF marker scan: walk segments from offset 2 until a
    * SOFn marker (C0–CF minus C4/C8/CC), whose payload carries height
    * then width big-endian at +5/+7. Bounded by the header region —
    * stops at start-of-scan (DA) without touching entropy-coded data. */
  private[graft] def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      // ISO/IEC 10918 permits any number of 0xFF fill bytes before a
      // marker: skip them, or a padded stream's real marker byte would be
      // read as the high byte of a segment length and mis-walk the chain.
      while (i + 3 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xff) return None // fill bytes ran into the buffer end
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else if (marker == 0xda) {
        return None // start of scan: no SOF seen
      } else {
        // the fill-skip may stop with the marker at the buffer's edge — a
        // length-bearing marker there has no room for its length bytes
        if (i + 3 >= bytes.length) return None
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 >= bytes.length) return None
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return Some((w, h))
        }
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  /** The JPEG arm's full output row — a case class so the UDF returns ONE
    * struct with the final field names, keeping a single ScalaUDF node in
    * the plan (two per-field `jpgUdf(bin).getField` calls would evaluate
    * the marker walk twice per row unless codegen CSE happens to fire).
    * The class must be BYTECODE-PUBLIC (private[graft], not private)
    * and use boxed Java types for nullable fields: a private nested case
    * class (and Option accessors) makes the generated serializer fail to
    * compile, silently dropping every task to interpreted mode. */
  private[graft] case class Dims(width: Integer, height: Integer, format: String)

  /** struct(width, height, format) parsed from real header bytes; unknown
    * or truncated payloads yield (null, null, "unknown"). */
  def dimsCol(bin: Column): Column = {
    val pngOk = magic(bin, "89504E470D0A1A0A") && length(bin) >= 24
    val gifOk = (magic(bin, "474946383961") || magic(bin, "474946383761")) &&
      length(bin) >= 10
    val bmpOk = magic(bin, "424D") && length(bin) >= 26
    val jpgOk = magic(bin, "FFD8FF")
    val jpgUdf = udf { (bytes: Array[Byte]) =>
      jpegDims(bytes) match {
        case Some((w, h)) => Dims(w, h, "jpeg")
        case None => Dims(null, null, "jpeg")
      }
    }
    val nullInt = lit(null).cast("int")
    when(pngOk, struct(
      be(bin, 17, 4).as("width"), be(bin, 21, 4).as("height"),
      lit("png").as("format")))
      .when(gifOk, struct(
        le(bin, 7, 2).cast("int").as("width"),
        le(bin, 9, 2).cast("int").as("height"),
        lit("gif").as("format")))
      .when(bmpOk, struct(
        le(bin, 19, 4).cast("int").as("width"),
        // BMP height is signed 32-bit (negative = top-down row order)
        abs(when(le(bin, 23, 4) > Int.MaxValue,
          le(bin, 23, 4) - lit(4294967296L)).otherwise(le(bin, 23, 4)))
          .cast("int").as("height"),
        lit("bmp").as("format")))
      .when(jpgOk, jpgUdf(bin))
      .otherwise(struct(nullInt.as("width"), nullInt.as("height"),
        lit("unknown").as("format")))
  }

  /** Append parsed (width, height, format) for a binary column. */
  def parse(df: DataFrame, binaryCol: String,
      outCol: String = "image_header"): DataFrame =
    df.withColumn(outCol, dimsCol(col(binaryCol)))
}
