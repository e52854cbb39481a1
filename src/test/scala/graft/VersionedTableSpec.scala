package graft

import graft.pipeline.VersionedTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Snapshot-versioned tables ([[VersionedTable]]): a reader resolved
  * before a rewrite must see ONE consistent version mid-scan; versions
  * time-travel; merge/deleteKeys reuse unaffected partition files
  * (O(affected) maintenance); prune bounds retention. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def root() =
    Files.createTempDirectory("graft-vt").toString + "/tbl"

  test("reader resolved before a swap sees one consistent version after it") {
    val r = root()
    VersionedTable.write(spark, r,
      (1L to 100L).map(i => (i, "v1")).toDF("id", "tag"))
    // resolve NOW: the DataFrame binds to version-1 files
    val pinned = VersionedTable.read(spark, r)
    // a full rewrite commits version 2 (different content + row count)
    VersionedTable.write(spark, r,
      (1L to 50L).map(i => (i, "v2")).toDF("id", "tag"))
    assert(VersionedTable.currentVersion(spark, r) === Some(2L))
    // the pinned reader STILL sees exactly version 1 — no mixing, no
    // mid-swap vanishing relation
    val got = pinned.select("id", "tag").as[(Long, String)].collect()
    assert(got.length === 100 && got.forall(_._2 == "v1"))
    // a fresh reader sees version 2
    assert(VersionedTable.read(spark, r).count() === 50L)
  }

  test("time travel: version N-1 readable until pruned; prune expires it") {
    val r = root()
    VersionedTable.write(spark, r, Seq((1L, "a")).toDF("id", "tag"))
    VersionedTable.write(spark, r, Seq((2L, "b")).toDF("id", "tag"))
    VersionedTable.write(spark, r, Seq((3L, "c")).toDF("id", "tag"))
    assert(VersionedTable.versions(spark, r) === Seq(1L, 2L, 3L))
    assert(VersionedTable.readVersion(spark, r, 2L)
      .select("tag").as[String].head() === "b")
    VersionedTable.prune(spark, r, keep = 2)
    assert(VersionedTable.versions(spark, r) === Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, r, 1L)
    }
    // retained versions still fully readable after prune
    assert(VersionedTable.readVersion(spark, r, 2L).count() === 1L)
    assert(VersionedTable.read(spark, r).count() === 1L)
  }

  test("partition-scoped merge reuses unaffected partition files byte-for-byte") {
    val r = root()
    VersionedTable.write(spark, r,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("id", "p", "x"),
      partitionBy = Seq("p"))
    def manifestOf(v: Long) = {
      val f = new java.io.File(s"$r/_manifests/v$v")
      scala.io.Source.fromFile(f).getLines().toSet
    }
    val m1 = manifestOf(1L)
    // merge touches only partition b (key = (p, id): partition ⊆ key)
    VersionedTable.merge(spark, r,
      Seq((2L, "b", 99L), (4L, "b", 40L)).toDF("id", "p", "x"),
      uniqueKey = Seq("p", "id"), partitionBy = Seq("p"))
    val m2 = manifestOf(2L)
    // partitions a and c: SAME files referenced (no rewrite)
    val untouched1 = m1.filter(f => f.contains("__pp_p=a/") || f.contains("__pp_p=c/"))
    val untouched2 = m2.filter(f => f.contains("__pp_p=a/") || f.contains("__pp_p=c/"))
    assert(untouched1 === untouched2 && untouched1.nonEmpty)
    // partition b: new files only
    assert(m2.filter(_.contains("__pp_p=b/")).forall(!m1.contains(_)))
    // merged content: delete+insert on (p, id)
    val got = VersionedTable.read(spark, r)
      .select("id", "p", "x").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 10L), (2L, "b", 99L),
      (3L, "c", 30L), (4L, "b", 40L)))
    // version 1 still shows the pre-merge state (time travel)
    assert(VersionedTable.readVersion(spark, r, 1L)
      .filter($"id" === 2L).select("x").as[Long].head() === 20L)
  }

  test("deleteKeys: partition-scoped rewrite; old version keeps the rows") {
    val r = root()
    VersionedTable.write(spark, r,
      (1L to 10L).map(i => (i, s"p${i % 2}", i * 10)).toDF("id", "p", "x"),
      partitionBy = Seq("p"))
    val v = VersionedTable.deleteKeys(spark, r,
      Seq(("p1", 1L), ("p1", 3L)).toDF("p", "id"),
      keyCols = Seq("p", "id"), partitionBy = Seq("p"))
    assert(v === 2L)
    val ids = VersionedTable.read(spark, r).select("id").as[Long].collect().toSet
    assert(ids === (1L to 10L).toSet -- Set(1L, 3L))
    // p0's files are reused verbatim
    def manifestOf(n: Long) =
      scala.io.Source.fromFile(s"$r/_manifests/v$n").getLines().toSet
    assert(manifestOf(1L).filter(_.contains("__pp_p=p0/")) ===
      manifestOf(2L).filter(_.contains("__pp_p=p0/")))
    // recovery window: the deleted rows live in version 1 until pruned
    assert(VersionedTable.readVersion(spark, r, 1L).count() === 10L)
    // deleting nothing commits nothing
    assert(VersionedTable.deleteKeys(spark, r,
      Seq(("p9", 99L)).toDF("p", "id"),
      keyCols = Seq("p", "id"), partitionBy = Seq("p")) === 2L)
  }

  test("compact rewrites into fewer files, content-identical, as a new version") {
    val r = root()
    VersionedTable.write(spark, r,
      (1L to 200L).map(i => (i, i * 2)).toDF("id", "x").repartition(16))
    def nFiles(v: Long) =
      scala.io.Source.fromFile(s"$r/_manifests/v$v").getLines().size
    assert(nFiles(1L) >= 16)
    VersionedTable.compact(spark, r)
    assert(nFiles(2L) < nFiles(1L))
    val a = VersionedTable.readVersion(spark, r, 1L)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = VersionedTable.read(spark, r)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("readPartitions prunes at the manifest, same rows as a filter") {
    val r = root()
    VersionedTable.write(spark, r,
      (1L to 30L).map(i => (i, s"p${i % 3}", i)).toDF("id", "p", "x"),
      partitionBy = Seq("p"))
    val pruned = VersionedTable.readPartitions(spark, r, "p", Seq("p1"))
    val full = VersionedTable.read(spark, r).filter($"p" === "p1")
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ===
      full.select("id").as[Long].collect().sorted.toSeq)
    // the pruned scan reads strictly fewer files
    assert(pruned.inputFiles.length < VersionedTable.read(spark, r).inputFiles.length)
  }
}
