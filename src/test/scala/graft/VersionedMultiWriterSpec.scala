package graft

import java.nio.file.Files

import graft.pipeline.VersionedTable

/** TWO CONCURRENT WRITER JVMs on one versioned table (VERDICT r12
  * next-#3, the done-criterion spec): each writer process runs its own
  * SparkSession and commits four single-key merges through the
  * optimistic manifest-CAS path — the per-root in-JVM lock cannot see
  * the sibling process, so every real race is settled by the
  * put-if-absent manifest create and the losers' re-stage retries.
  *
  * Linearizability check: every merge inserts exactly one NEW key, so
  * if all 8 commits land with none lost, the history must be versions
  * 1..8 with version v containing exactly v rows — any lost update,
  * overwritten manifest, or trashed staged file breaks the count
  * ladder. (With 2 writers x 4 commits a writer can lose at most 4
  * consecutive races, within the commit path's retry budget of 5 —
  * the test cannot flake on retry exhaustion.)
  */
class VersionedMultiWriterSpec extends SparkSpec {

  // the build forks test JVMs, so java.class.path is the real test
  // classpath (spark jars included) — the shared launcher hands it to
  // the writer processes
  private def launchWriter(root: String, id: String, n: Int): Process =
    graft.tools.VersionedWriterMain.launch(root, id, n)

  test("two writer JVMs: all commits land, history is linearizable, no lost files") {
    val root = Files.createTempDirectory("graft-vt-mw").toString + "/tbl"
    val (w1, w2) = (launchWriter(root, "w1", 4), launchWriter(root, "w2", 4))
    assert(w1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      w2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "writer processes must finish")
    assert(w1.exitValue === 0 && w2.exitValue === 0,
      "both writers must commit all merges (optimistic retries, no refusal)")
    assert(VersionedTable.currentVersion(spark, root) === Some(8L))
    assert(VersionedTable.versions(spark, root) === (1L to 8L))
    // single-key inserts make the ladder exact: version v has v rows
    (1L to 8L).foreach { v =>
      assert(VersionedTable.readVersion(spark, root, v).count() === v,
        s"version $v must hold exactly $v rows — a lost update breaks the ladder")
    }
    // final content: all 8 keys, 4 per writer, no duplicates
    val rows = VersionedTable.read(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.length === 8)
    assert(rows.map(_._1).distinct.length === 8, "no duplicate keys")
    assert(rows.count(_._2 == "w1") === 4 && rows.count(_._2 == "w2") === 4)
  }
}
