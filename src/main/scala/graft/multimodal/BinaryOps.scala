package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs.
  *
  * The decode kernels are STUBS (this container has no image/audio codecs —
  * driver mandate): `decodeImageStub` derives deterministic fake metadata
  * from the bytes. Everything around the stub — schema, batch iteration,
  * partitioning, output shapes — is the real Spark plumbing a codec-backed
  * implementation would keep: swap the stub body for an actual decoder and
  * nothing else changes.
  *
  * The reference's analog is its load-time parsing tools (whisper/xlsx/docx/
  * OCR, reference docetl/parsing_tools.py:53-432): binary -> rows at scan.
  */
object BinaryOps {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** STUB decode: metadata is a pure function of the bytes (length + first
    * bytes), so tests are deterministic. A real build replaces the body with
    * e.g. javax.imageio probing — signature and plan shape stay identical. */
  def decodeImageStub(bytes: Array[Byte]): Row =
    if (bytes == null || bytes.isEmpty) Row(0, 0, 0, "empty")
    else Row(
      128 + (bytes.length % 1024),
      128 + ((bytes.length * 7) % 1024),
      3,
      if (bytes.length % 2 == 0) "png" else "jpeg")

  /** Attach decoded metadata for a binary column. `mapPartitions` processes
    * a whole partition per task — the batch shape a vectorized decoder
    * (or Arrow-based Pandas UDF in PySpark) would also use. */
  def withImageMeta(df: DataFrame, binaryCol: String, outCol: String = "image_meta"): DataFrame = {
    val idx = df.schema.fieldIndex(binaryCol)
    val newSchema = df.schema.add(StructField(outCol, imageMetaSchema))
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        Row.fromSeq(row.toSeq :+ decodeImageStub(bytes))
      }
    }(Encoders.row(newSchema))
  }

  /** STUB bytes → feature-vector kernel: a deterministic unit-free
    * `dim`-dimensional embedding derived from md5 of the payload — each
    * component is the 52-bit prefix of md5("<md5hex(bytes)>_<j>") mapped
    * into [-1, 1] (exactly (h mod 2001 − 1000)/1000). A real build
    * replaces the body with a CLIP/wav2vec-style encoder; the signature,
    * null handling, and output shape stay identical — and because the
    * stub is pure md5 arithmetic, the whole seam is ORACLE-REPLAYABLE
    * (DuckDB recomputes the vector from the same bytes). */
  def byteFeatureStub(bytes: Array[Byte], dim: Int): Array[Double] =
    if (bytes == null || bytes.isEmpty) Array.fill(dim)(0.0)
    else {
      val h = md5Hex(bytes)
      Array.tabulate(dim) { j =>
        val hj = md5Hex(s"${h}_$j".getBytes("UTF-8")).substring(0, 13)
        (java.lang.Long.parseLong(hj, 16) % 2001L - 1000L) / 1000.0
      }
    }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Attach a feature vector for a binary column — the multimodal
    * retrieval seam: image/audio payloads become an `array<double>`
    * embedding column that [[graft.ann.Ann.bruteForce]] / `ivf` / the
    * embedding-dedup arms consume unchanged. Same `mapPartitions` batch
    * shape as [[withImageMeta]] (one task walks a whole partition — what
    * a vectorized encoder batch would also want); swap
    * [[byteFeatureStub]] for a codec-backed encoder and the plan,
    * schema, and downstream retrieval wiring stay identical. */
  def withByteFeatures(df: DataFrame, binaryCol: String, dim: Int,
      outCol: String = "byte_features"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val idx = df.schema.fieldIndex(binaryCol)
    val newSchema = df.schema.add(
      StructField(outCol, ArrayType(DoubleType)))
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        Row.fromSeq(row.toSeq :+ byteFeatureStub(bytes, dim).toSeq)
      }
    }(Encoders.row(newSchema))
  }

  /** STUB frame sampling for video-like payloads: emits `n` byte slices as
    * one row per "frame" (posexplode plumbing is real; slicing is the stub). */
  def sampleFrames(df: DataFrame, binaryCol: String, n: Int): DataFrame = {
    val chunk = (length(col(binaryCol)) / n).cast("int")
    val frames = transform(sequence(lit(0), lit(n - 1)), i =>
      substring(col(binaryCol), (i * chunk + 1).cast("int"), greatest(chunk, lit(1)).cast("int")))
    df.select(col("*"), posexplode(frames).as(Seq("frame_no", "frame_bytes")))
  }
}
