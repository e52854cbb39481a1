package graft

import graft.pipeline.Snapshots
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("SCD2 lifecycle: init, change closes version, new key opens, absence keeps") {
    val day1 = Seq(
      (1L, "Bronx", ts("2024-01-01 00:00:00")),
      (2L, "Queens", ts("2024-01-01 00:00:00")))
      .toDF("zone_id", "borough", "updated_at")
    val snap1 = Snapshots.initialize(day1, "updated_at")
    assert(snap1.filter(col("is_current")).count() == 2)

    val day2 = Seq(
      (1L, "Bronx-Renamed", ts("2024-02-01 00:00:00")), // changed
      (3L, "EWR", ts("2024-02-01 00:00:00")))           // new key; 2 absent
      .toDF("zone_id", "borough", "updated_at")
    val snap2 = Snapshots.merge(snap1, day2, "zone_id", "updated_at").cache()

    assert(snap2.count() == 4, "2 current day1 + 1 closed + 1 new = 4 versions")
    val cur = snap2.filter(col("is_current"))
      .select("zone_id", "borough").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur == Map(1L -> "Bronx-Renamed", 2L -> "Queens", 3L -> "EWR"))

    val closed = snap2.filter(!col("is_current")).collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[String]("borough") == "Bronx")
    assert(closed.head.getAs[Timestamp]("valid_to") == ts("2024-02-01 00:00:00"))

    // point-in-time reads
    val jan = Snapshots.asOf(snap2, ts("2024-01-15 00:00:00"))
      .select("zone_id", "borough").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(jan == Map(1L -> "Bronx", 2L -> "Queens"))
    val feb = Snapshots.asOf(snap2, ts("2024-02-15 00:00:00"))
    assert(feb.count() == 3)
  }

  test("a batch carrying several versions of one key keeps only the latest") {
    val day1 = Seq((1L, "v1", ts("2024-01-01 00:00:00"))).toDF("k", "v", "updated_at")
    val snap = Snapshots.initialize(day1, "updated_at")
    val multi = Seq(
      (1L, "v2", ts("2024-01-02 00:00:00")),
      (1L, "v3", ts("2024-01-03 00:00:00"))).toDF("k", "v", "updated_at")
    val merged = Snapshots.merge(snap, multi, "k", "updated_at")
    val cur = merged.filter(col("is_current")).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("v") == "v3",
      "only the latest incoming version opens")
    assert(merged.count() == 2, "v2 is skipped, not opened-and-closed")
  }

  test("NULL business key version-chains as one key (no duplicate currents)") {
    val day1 = Seq(
      (Some(1L), "A", ts("2024-01-01 00:00:00")),
      (None, "null-key-v1", ts("2024-01-01 00:00:00")))
      .toDF("k", "v", "updated_at")
    val snap = Snapshots.initialize(day1, "updated_at")

    // re-observe the SAME null-key row: idempotent, nothing new opens
    val again = Snapshots.merge(snap, day1, "k", "updated_at")
    assert(again.count() == 2, "same observation -> no new versions")
    assert(again.filter(col("is_current")).count() == 2)

    // a NEWER null-key version closes the old one and opens the new
    val day2 = Seq((Option.empty[Long], "null-key-v2", ts("2024-02-01 00:00:00")))
      .toDF("k", "v", "updated_at")
    val merged = Snapshots.merge(again, day2, "k", "updated_at")
    assert(merged.count() == 3, "1 key-1 current + closed null-v1 + open null-v2")
    val curNull = merged.filter(col("is_current") && col("k").isNull).collect()
    assert(curNull.length == 1 && curNull.head.getAs[String]("v") == "null-key-v2")
  }

  test("NULL updated_at current row IS superseded by a timestamped version") {
    // ADVICE r2: NULL __cts made both the closed-join predicate and the
    // fresh filter evaluate NULL — the newer incoming version was
    // silently dropped. NULL current ts now means -infinity.
    val day1 = Seq((1L, "untimed", Option.empty[Timestamp]))
      .toDF("k", "v", "updated_at")
    val snap = Snapshots.initialize(day1, "updated_at")
    val day2 = Seq((1L, "timed", Option(ts("2024-02-01 00:00:00"))))
      .toDF("k", "v", "updated_at")
    val merged = Snapshots.merge(snap, day2, "k", "updated_at").cache()
    assert(merged.count() == 2, "closed NULL-ts version + opened timed version")
    val cur = merged.filter(col("is_current")).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("v") == "timed")
    val closed = merged.filter(!col("is_current")).collect()
    assert(closed.length == 1 && closed.head.getAs[String]("v") == "untimed")
    assert(closed.head.getAs[Timestamp]("valid_to") == ts("2024-02-01 00:00:00"))

    // a NULL-ts incoming version never supersedes (NULL vs NULL or NULL
    // vs timed = "not newer"): merging day1 again changes nothing
    val again = Snapshots.merge(merged, day1, "k", "updated_at")
    assert(again.count() == 2)
    assert(again.filter(col("is_current")).head.getAs[String]("v") == "timed")
  }

  test("idempotent: merging the same observation twice changes nothing") {
    val day1 = Seq((1L, "A", ts("2024-01-01 00:00:00"))).toDF("k", "v", "updated_at")
    val snap = Snapshots.initialize(day1, "updated_at")
    val again = Snapshots.merge(snap, day1, "k", "updated_at")
    assert(again.count() == 1)
    assert(again.filter(col("is_current")).count() == 1)
  }

  test("NULL is_current row survives a merge (total cur/hist partition)") {
    val snap = Seq((1L, "A", ts("2024-01-01 00:00:00"))).toDF("k", "v", "updated_at")
      .withColumn("valid_from", col("updated_at"))
      .withColumn("valid_to", lit(Snapshots.validTo999))
      .withColumn("is_current", lit(null).cast("boolean")) // damaged flag
    val inc = Seq((2L, "B", ts("2024-02-01 00:00:00"))).toDF("k", "v", "updated_at")
    val merged = Snapshots.merge(snap, inc, "k", "updated_at")
    assert(merged.count() == 2,
      "a NULL-flag row must land in hist, not vanish from the union")
    assert(merged.filter(col("k") === 1L).count() == 1)
  }

  test("equal-timestamp versions of one key pick a deterministic survivor") {
    val t = ts("2024-01-01 00:00:00")
    // same key, same ts, different payloads, shuffled input orders
    val inc1 = Seq((1L, "a", t), (1L, "b", t)).toDF("k", "v", "updated_at")
    val inc2 = Seq((1L, "b", t), (1L, "a", t)).toDF("k", "v", "updated_at")
      .repartition(3)
    val empty = Snapshots.initialize(
      Seq.empty[(Long, String, Timestamp)].toDF("k", "v", "updated_at"), "updated_at")
    val v1 = Snapshots.merge(empty, inc1, "k", "updated_at")
      .head.getAs[String]("v")
    val v2 = Snapshots.merge(empty, inc2, "k", "updated_at")
      .head.getAs[String]("v")
    assert(v1 == v2, "survivor must not depend on input/partition order")
  }

  test("asOf sees a key first observed with NULL timestamp (valid_from -infinity)") {
    val inc = Seq((1L, "A", Option.empty[Timestamp])).toDF("k", "v", "updated_at")
    val snap = Snapshots.initialize(inc, "updated_at")
    val visible = Snapshots.asOf(snap, ts("2024-06-01 00:00:00"))
    assert(visible.count() == 1,
      "NULL valid_from is -infinity, not invisible-at-every-time")
  }

  test("q67 gate shape: one current per key, contiguous chain, rejection path live") {
    val out = graft.queries.ExtQueries.q67Scd2Snapshot(
      spark, "/root/testdata/sf0.001").cache()
    try {
      // exactly one open version per key
      val multiCur = out.filter(col("is_current") === 1L)
        .groupBy("k").count().filter(col("count") =!= 1L).count()
      assert(multiCur == 0, "every key must have exactly one current version")
      // the chain is contiguous: each closed version's valid_to equals
      // the NEXT version's valid_from, with no gaps or overlaps
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("vts")
      val broken = out
        .withColumn("nxt", lead(col("vts"), 1).over(w))
        .filter((col("is_current") === 0L && col("valid_to_s") =!= col("nxt"))
          || (col("is_current") === 1L && col("nxt").isNotNull))
        .count()
      assert(broken == 0, "closed.valid_to must chain to the next valid_from; " +
        "the current version must be the chain's last")
      // monotone acceptance is actually EXERCISED by this corpus: some
      // key must have an order in a later batch with a SMALLER orderkey
      // than an earlier batch's latest (the dropped-stale-version path) —
      // versions out < per-(key,batch) latest count proves drops happened
      val perBatchLatest = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_custkey").as("k"), col("o_orderkey").as("vts"),
          pmod(col("o_orderkey"), lit(3L)).as("b"))
        .groupBy("k", "b").agg(max("vts")).count()
      assert(out.count() < perBatchLatest,
        s"corpus must exercise the stale-version rejection path " +
          s"(versions=${out.count()} latests=$perBatchLatest)")
    } finally out.unpersist()
  }

  test("q69 gate shape: asOf returns at most one version per key, consistent with the chain") {
    val dir = "/root/testdata/sf0.001"
    val asOf = graft.queries.ExtQueries.q69SnapshotAsof(spark, dir).cache()
    try {
      val dup = asOf.groupBy("k").count().filter(col("count") > 1L).count()
      assert(dup == 0, "a point-in-time read sees ONE version per key")
      // every returned (k, vts) is a version of the q67 chain whose
      // interval covers t — cross-check against the full chain
      val t = spark.read.parquet(s"$dir/orders.parquet")
        .agg(max(col("o_orderkey"))).head.getLong(0) / 2L
      val chain = graft.queries.ExtQueries.q67Scd2Snapshot(spark, dir)
      val want = chain.filter(col("vts") <= t &&
          (col("valid_to_s").isNull || lit(t) < col("valid_to_s")))
        .select("k", "vts", "price")
      assert(asOf.exceptAll(want).count() == 0 &&
        want.exceptAll(asOf).count() == 0)
      assert(asOf.count() > 0)
    } finally asOf.unpersist()
  }
}
