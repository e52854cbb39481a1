package graft

import org.apache.spark.sql.functions._

/** s01 gate shape (r18): the AvailableNow drain of the q04 harmonized
  * union must equal the batch transform row-for-row, stay stable across
  * repeated invocations in ONE JVM (the Bench steady-state shape), and
  * keep only one live memory-sink view per JVM (the PerJvmTemp
  * discipline, review r18). */
class StreamHarmonizeGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "ts_date", "user_id", "amount", "props", "kind")
      .collect().map(_.toSeq).toSeq

  test("drained s01 == batch q04; repeat invocation stable; one live view") {
    val batch = rows(graft.queries.CoreQueries.q04HarmonizeUnion(spark, dir))
    val first = rows(graft.queries.CoreQueries.s01StreamHarmonize(spark, dir))
    assert(first.nonEmpty && first === batch,
      "streaming drain must equal the batch harmonized union")
    def liveViews = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("s01_drain_"))
    val afterFirst = liveViews
    // second invocation (the bench re-measure shape): same rows, and
    // the FIRST drain's memory view is swept — one live copy
    val second = rows(graft.queries.CoreQueries.s01StreamHarmonize(spark, dir))
    assert(second === batch)
    val afterSecond = liveViews
    assert(afterSecond.length === 1,
      s"one live s01 view expected, got ${afterSecond.toSeq}")
    assert(afterFirst.toSet.intersect(afterSecond.toSet).isEmpty,
      "the previous invocation's view must be dropped")
  }
}
