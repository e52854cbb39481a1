package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-cost profiler for the bench floor: runs each named query K
  * times IN ONE SESSION and prints every timing, splitting the
  * per-query cost into first-run (plan analysis + codegen compile +
  * scan-metadata) and steady-state (pure job execution — the repeat
  * runs hit the JVM codegen cache for an identical plan).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.BenchProbe q01_agg_pricing q08_topk'
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", "8m"))
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q08_topk", "q25_null_funcs", "q01_agg_pricing", "q03_dim_double_join")
    // one unmeasured warm query to absorb session-wide one-time costs
    graft.SparkEntry.queries("q09_distinct")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val steady = times.drop(1).min
      println(f"[probe] $name%-24s first=${times.head}%6.3fs steady=$steady%6.3fs " +
        f"fixed=${times.head - steady}%6.3fs  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
