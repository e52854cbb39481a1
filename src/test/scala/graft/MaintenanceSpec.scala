package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Warehouse maintenance ops ([[Pipeline.deleteKeys]] /
  * [[Pipeline.compact]]): physical deletion must remove exactly the
  * requested keys and nothing else, be idempotent, and heal a crashed
  * swap; compaction must cut the file count without changing a row. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(path: String): Set[(Long, String)] =
    spark.read.parquet(path).as[(Long, String)].collect().toSet

  test("deleteKeys removes exactly the requested keys, idempotently") {
    val path = Files.createTempDirectory("graft-del").toString + "/t"
    (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4).write.parquet(path)
    val keys = Seq(3L, 7L, 7L, 999L).toDF("k") // dup + missing keys ok
    val n1 = Pipeline.deleteKeys(spark, path, keys, Seq("k"))
    assert(n1 == 2L, s"deleted $n1")
    val want = (1L to 100L).filterNot(Set(3L, 7L))
      .map(i => (i, s"v$i")).toSet
    assert(rows(path) == want)
    // replaying the same request deletes nothing and rewrites nothing
    assert(Pipeline.deleteKeys(spark, path, keys, Seq("k")) == 0L)
    assert(rows(path) == want)
  }

  test("deleteKeys heals a swap that crashed between its renames") {
    val path = Files.createTempDirectory("graft-del2").toString + "/t"
    (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v").write.parquet(path)
    // simulate the crash window: live moved aside, replacement missing
    val f = new java.io.File(path)
    assert(f.renameTo(new java.io.File(path + ".__incremental_old")))
    val n = Pipeline.deleteKeys(spark, path, Seq(1L).toDF("k"), Seq("k"))
    assert(n == 1L)
    assert(rows(path) == (2L to 10L).map(i => (i, s"v$i")).toSet,
      "history restored from the aside copy before deleting")
  }

  test("compact cuts file count, content byte-identical") {
    val path = Files.createTempDirectory("graft-cpt").toString + "/t"
    (1L to 2000L).map(i => (i, s"payload-$i")).toDF("k", "v")
      .repartition(32).write.parquet(path)
    val before = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 32)
    val want = rows(path)
    val after = Pipeline.compact(spark, path)
    assert(after < before && after >= 1, s"$before -> $after files")
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) == after)
    assert(rows(path) == want, "compaction must not change a row")
  }
}
