package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 values of word n-gram shingles, fused into one
  * zero-allocation pass over the text bytes.
  *
  * Semantically identical to
  * `array_sort(array_distinct(transform(TextFunctions.shingles(c, n), s => xxhash64(s))))`
  * but ~50x cheaper: that pipeline is a tree of interpreted higher-order
  * lambdas which copies a token-array slice and builds a new UTF8String per
  * shingle. Because tokens come from splitting on a single literal space and
  * are re-joined with a single space, every shingle is EXACTLY a byte range
  * of the original text (0x20 never occurs inside a UTF-8 multi-byte
  * sequence) — so this expression just records token start offsets and
  * hashes byte ranges in place with the same XXH64(seed=42) that
  * `xxhash64()` uses. The generated code is a single call into the
  * pre-compiled helper, so it adds nothing to Janino compile time and the
  * JVM JIT optimizes one shared method instead of N generated classes.
  *
  * Dedup building block (MinHash / n-gram Jaccard families; reference
  * near-dup semantics per docetl docs). Hash values are engine-internal —
  * oracle parity only depends on the induced shingle SET, which matches the
  * string pipeline exactly (64-bit collisions aside).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // functions.xxhash64's default seed

  /** One pass: token start offsets -> hash each n-window byte range ->
    * sort -> dedupe adjacent. Token semantics match `split(c, " ")` with
    * Spark's default limit (-1): empty tokens between consecutive spaces
    * and after a trailing space are kept. Fewer than n tokens -> one
    * shingle covering the whole text (concat_ws over all tokens == the
    * original bytes). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // Token starts: position 0 plus every byte following a 0x20.
    var numTokens = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == 0x20) numTokens += 1
      i += 1
    }
    if (numTokens < n)
      return new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, len, Seed)))
    val starts = new Array[Int](numTokens)
    var t = 1
    i = 0
    while (i < len) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val count = numTokens - n + 1
    val hashes = new Array[Long](count)
    i = 0
    while (i < count) {
      val s = starts(i)
      val e = if (i + n < numTokens) starts(i + n) - 1 else len
      hashes(i) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // Dedupe adjacent in place.
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == count) hashes else java.util.Arrays.copyOf(hashes, w))
  }

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
