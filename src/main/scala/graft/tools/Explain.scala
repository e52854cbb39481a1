package graft.tools

import org.apache.spark.sql.SparkSession

/** Formatted-plan dump for named driver queries — the per-round plan
  * audit (`.explain("formatted")`) as a first-class tool instead of a
  * scratch script: `runMain graft.tools.Explain <name> [<name> ...]`
  * against `SPARK_GRAFT_SF_DIR` (default sf0.01). Audit targets: one
  * scan per corpus relation, BroadcastHashJoin on dim/query sides,
  * pushed filters reaching the parquet scan, no unexpected
  * SortMergeJoin or cartesian, WholeStageCodegen spans wide. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_agg_pricing")
    names.foreach { name =>
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
