package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-wide installation point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` injects the engine's native
  * SQL functions into EVERY session the cluster creates — the idiomatic
  * deployment path for a shared Spark service, where per-session
  * `CosineSimilarity.register(spark)` calls would have to be repeated by
  * each notebook/job (and forgotten by some).
  *
  * Injected functions:
  *   - `cosine_similarity(a, b)` — the fused codegen'd cosine
  *     ([[graft.functions.CosineSimilarity]])
  *   - `unicode_normalize(s, form)` — NFC/NFKC/NFD/NFKD canonicalization
  *     ([[graft.functions.UnicodeNormalize]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName,
        "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_similarity expects 2 arguments, got ${exprs.length}")
        graft.functions.CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getName,
        "unicode_normalize"),
      (exprs: Seq[Expression]) => graft.functions.UnicodeNormalize
        .fromExpressions(exprs)))
  }
}
