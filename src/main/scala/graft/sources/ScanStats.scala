package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet row-group statistics + pruning estimator — the visibility
  * tool for the scan layer's most important free lunch: row-group
  * min/max skipping. A 100 TB scan with a range predicate touches only
  * row groups whose [min, max] intersects the predicate — IF the data
  * layout clusters the column ([[graft.ops.ZOrder]], sorted writes,
  * [[Compact]] with sortCols). This op reads ONLY footers (KBs per
  * file, never data pages) and reports per-row-group bounds plus a
  * what-if estimate: how many groups/rows a given range predicate
  * would skip under the CURRENT layout. The footer format is the
  * public Apache Parquet spec.
  *
  * Scale shape: the file list parallelizes across executors; each task
  * reads its files' footers via parquet-hadoop (the Hadoop conf rides
  * along as a plain property map — no data scan, no shuffle). Output is
  * row-group-count-sized. The estimate is one aggregation over it.
  */
object ScanStats {

  /** Per-row-group footer stats for `column`: (file, row_group, rows,
    * min_value, max_value, nulls) — bounds rendered as strings so any
    * physical type reports (int64/double/binary-UTF8). Files lacking
    * stats for the column emit null bounds. */
  def rowGroups(spark: SparkSession, path: String,
      column: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), conf)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".") &&
        f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq.sorted
    // Ship the conf as plain properties; executors rebuild it. (The data
    // never moves — each task reads only its files' footers.)
    val confMap = {
      val b = Map.newBuilder[String, String]
      val ci = conf.iterator()
      while (ci.hasNext) { val e = ci.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    val sc = spark.sparkContext
    val slices = math.max(1, math.min(files.size, sc.defaultParallelism))
    val rows = sc.parallelize(files, slices).mapPartitions { paths =>
      val c = new org.apache.hadoop.conf.Configuration(false)
      confMap.foreach { case (k, v) => c.set(k, v) }
      paths.flatMap { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), c)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks
          (0 until blocks.size()).map { i =>
            val blk = blocks.get(i)
            val colMeta = {
              val cols = blk.getColumns
              (0 until cols.size()).map(cols.get)
                .find(_.getPath.toDotString == column)
            }
            val (mn, mx, nulls) = colMeta match {
              case Some(m) if m.getStatistics != null &&
                  !m.getStatistics.isEmpty =>
                val st = m.getStatistics
                val render = (v: AnyRef) => v match {
                  case b: org.apache.parquet.io.api.Binary =>
                    b.toStringUsingUTF8
                  case other => String.valueOf(other)
                }
                (if (st.hasNonNullValue) render(st.genericGetMin
                   .asInstanceOf[AnyRef]) else null,
                 if (st.hasNonNullValue) render(st.genericGetMax
                   .asInstanceOf[AnyRef]) else null,
                 st.getNumNulls)
              case _ => (null, null, -1L)
            }
            (p.substring(p.lastIndexOf('/') + 1), i.toLong,
              blk.getRowCount, mn, mx, nulls)
          }
        } finally r.close()
      }
    }
    spark.createDataFrame(rows).toDF(
      "file", "row_group", "rows", "min_value", "max_value", "nulls")
  }

  /** What-if pruning estimate for `column BETWEEN lo AND hi` on a
    * NUMERIC column, over a [[rowGroups]] frame: one row —
    * (groups_total, groups_scanned, rows_total, rows_scanned,
    * prune_ratio). A group is scanned when its [min, max] intersects
    * [lo, hi] or its bounds are unknown (no stats = cannot skip —
    * exactly the engine rule). prune_ratio is the fraction of ROWS
    * skipped: 0.0 means the layout gives this predicate nothing and a
    * sort/Z-order pass would pay for itself. */
  def pruneEstimate(rowGroupsDf: DataFrame, lo: Double,
      hi: Double): DataFrame = {
    val mn = col("min_value").cast("double")
    val mx = col("max_value").cast("double")
    val scanned = mn.isNull || mx.isNull || !(mx < lo || mn > hi)
    rowGroupsDf.agg(
      count(lit(1)).as("groups_total"),
      sum(when(scanned, 1L).otherwise(0L)).as("groups_scanned"),
      coalesce(sum(col("rows")), lit(0L)).as("rows_total"),
      coalesce(sum(when(scanned, col("rows")).otherwise(0L)), lit(0L))
        .as("rows_scanned"))
      .withColumn("prune_ratio",
        when(col("rows_total") > 0,
          round(lit(1.0) - col("rows_scanned").cast("double") /
            col("rows_total"), 6)).otherwise(lit(0.0)))
  }
}
