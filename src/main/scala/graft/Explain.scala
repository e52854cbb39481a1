package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of one or all
  * queries. Usage: runMain graft.Explain [queryName] [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q03_dim_double_join")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (name == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
