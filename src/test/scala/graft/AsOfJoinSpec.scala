package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofBackward: latest right at-or-before left time, inclusive bound, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after r2
      (2L, 10L, ts("2024-01-01 08:00:00")), // exactly at r1 (inclusive)
      (3L, 10L, ts("2024-01-01 07:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 12:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L),
      (10L, ts("2024-01-01 09:00:00"), 200L)
    ).toDF("user_id", "rt", "payload")

    val got = AsOfJoin.asofBackward(left, right, "user_id", "t", "rt",
        Seq("payload"))
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getLong(3)))

    assert(got.toSeq == Seq(
      1L -> 200L,  // latest at-or-before 10:00 is 09:00 row
      2L -> 100L,  // ==08:00 is visible (inclusive)
      3L -> null,  // nothing at or before 07:00
      4L -> null)) // key absent from right
  }

  test("NULL keys never match (SQL join semantics)") {
    val left = Seq((1L, Option(10L), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[Long], ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "t")
    val right = Seq((Option(10L), ts("2024-01-01 08:00:00"), 100L),
      (Option.empty[Long], ts("2024-01-01 08:00:00"), 999L))
      .toDF("user_id", "rt", "payload")
    val got = AsOfJoin.asofBackward(left, right, "user_id", "t", "rt",
        Seq("payload"))
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getLong(3)))
    assert(got.toSeq == Seq(1L -> 100L, 2L -> null),
      "NULL-key left row gets NULL payload; NULL-key right row matches nothing")
  }
}
