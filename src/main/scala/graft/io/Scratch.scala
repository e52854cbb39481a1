package graft.io

import org.apache.spark.sql.SparkSession

/** Shared scratch-space resolution for cut-point materializations (the
  * parquet relations a pipeline writes once and several consumers read —
  * e.g. the d02/d08 shared signature→pairs relation).
  *
  * Resolution order:
  *   1. `spark.graft.tmp` conf, if set — the operator's explicit choice.
  *   2. Single-JVM masters (`local` / `local[*]`): `java.io.tmpdir`.
  *      Driver and "executors" share one filesystem by definition.
  *   3. Any multi-JVM master (a real cluster, `local-cluster[...]`):
  *      `spark.sql.warehouse.dir` — the one root that is shared storage
  *      on every deployment where Spark SQL writes tables at all. A
  *      `file:/tmp` path here would be written by each executor to its
  *      OWN local disk and the driver's read-back would see a partial
  *      relation (VERDICT r3 #1).
  *
  * Paths are scoped per application id and deleted on application end,
  * so long-lived JVMs that run many sessions don't accrete scratch dirs.
  */
object Scratch {

  private val cleanupRegistered =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** App-scoped scratch root under the resolved base (see class doc). */
  def root(spark: SparkSession): String = {
    val base = spark.conf.getOption("spark.graft.tmp").getOrElse {
      val m = spark.sparkContext.master
      if (m == "local" || m.startsWith("local["))
        sys.props("java.io.tmpdir")
      else spark.conf.get("spark.sql.warehouse.dir")
    }
    val scoped =
      s"${base.stripSuffix("/")}/graft-scratch-${spark.sparkContext.applicationId}"
    registerCleanup(spark, scoped)
    scoped
  }

  /** A named scratch directory under [[root]]. */
  def dir(spark: SparkSession, name: String): String = s"${root(spark)}/$name"

  private def registerCleanup(spark: SparkSession, path: String): Unit = {
    cleanupRegistered.getOrElseUpdate(path, {
      val sc = spark.sparkContext
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          try {
            val p = new org.apache.hadoop.fs.Path(path)
            p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
          } catch { case _: Throwable => () } // best-effort cleanup
        }
      })
      true
    })
    ()
  }
}
