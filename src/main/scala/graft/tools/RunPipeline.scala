package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI entry point for YAML pipelines — the analog of the reference's
  * `docetl run pipeline.yaml` (reference docetl/cli.py:168).
  *
  * Usage: runMain graft.tools.RunPipeline <pipeline.yaml> [showRows|--describe]
  * `--describe` prints each step's output schema without writing the sink.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunPipeline <pipeline.yaml> [showRows|--describe]")
    val describe = args.length > 1 && args(1) == "--describe"
    val showRows = if (args.length > 1 && !describe) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (describe) {
      val conf = graft.api.Conf.fromYamlFile(args(0))
      graft.api.Pipeline.describe(conf, spark).foreach { case (name, schema) =>
        println(s"[pipeline] step $name: ${schema.simpleString}")
      }
    } else {
      val out = graft.api.Pipeline.runYamlFile(args(0), spark)
      println(s"[pipeline] output rows: ${out.count()}")
      out.show(showRows, truncate = false)
    }
    spark.stop()
  }
}
