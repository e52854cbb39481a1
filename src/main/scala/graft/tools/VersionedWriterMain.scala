package graft.tools

import org.apache.spark.sql.SparkSession

/** A standalone writer PROCESS for the versioned-table multi-writer
  * contract (VERDICT r12 next-#3): commits `n` single-row merges into
  * `root`, each a distinct key, from its own JVM and its own
  * SparkSession — the cross-process actor the optimistic commit path
  * exists for (the per-root in-JVM lock can't see this writer; only
  * the manifest put-if-absent CAS serializes it against others).
  * Launched by VersionedTableMultiWriterSpec (two concurrent writer
  * JVMs) and the ClusterSmoke writer-vs-reader shape (one writer JVM
  * committing while the parent JVM's readers scan).
  *
  * args: root writerId nCommits. Prints one `[vtwriter]` line with the
  * committed version numbers; exits nonzero on any failure (including
  * exhausted optimistic retries).
  */
object VersionedWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"vt-writer-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val versions = (1 to n.toInt).map { i =>
        graft.pipeline.VersionedTable.merge(spark, root,
          Seq((s"$writerId-$i", writerId, i.toLong)).toDF("key", "writer", "seq"),
          uniqueKey = Seq("key"))
      }
      println(s"[vtwriter] $writerId committed ${versions.mkString(",")}")
    } finally spark.stop()
  }
}
