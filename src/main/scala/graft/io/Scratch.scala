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

  /** Pure resolution of the scratch BASE (unit-testable):
    * `graftTmp` conf wins; single-JVM masters use tmpdir; multi-JVM
    * masters use the warehouse dir ONLY when the user set it explicitly.
    *
    * Fail-fast guard (ADVICE r4): on a multi-JVM master the DEFAULT
    * warehouse dir is file:$CWD/spark-warehouse — driver-local on a real
    * cluster, so executors would write scratch parquet to their OWN
    * disks and the driver's read-back would see a partial relation.
    * Refusing loudly beats silently corrupting the cut-point; the user
    * who sets the conf owns the claim that it is shared storage. */
  private[graft] def resolveBase(master: String, graftTmp: Option[String],
      warehouseDir: => String, warehouseExplicit: => Boolean): String =
    graftTmp.getOrElse {
      if (master == "local" || master.startsWith("local["))
        sys.props("java.io.tmpdir")
      else {
        val wh = warehouseDir
        val looksDefault = wh.replaceFirst("^file:/*", "/")
          .stripSuffix("/").endsWith("/spark-warehouse")
        if (!warehouseExplicit && looksDefault) throw new IllegalStateException(
          s"graft.io.Scratch: master '$master' runs executors in separate " +
          s"JVMs but the scratch base would resolve to the default " +
          s"warehouse dir '$wh', which is driver-local storage on a " +
          s"multi-node cluster. Set spark.graft.tmp (or " +
          s"spark.sql.warehouse.dir) to a SHARED filesystem path " +
          s"(HDFS/S3/NFS) visible to every executor.")
        wh
      }
    }

  /** App-scoped scratch root under the resolved base (see class doc). */
  def root(spark: SparkSession): String = {
    val base = resolveBase(
      spark.sparkContext.master,
      spark.conf.getOption("spark.graft.tmp"),
      spark.conf.get("spark.sql.warehouse.dir"),
      spark.sparkContext.getConf.contains("spark.sql.warehouse.dir"))
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
