package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path, Paths}

/** ProcessingTime-trigger soak of the streaming upsert (VERDICT r3
  * stretch #8): deliveries land WHILE the query runs on a wall-clock
  * trigger, and a concurrent reader hammers the output relation
  * throughout. Pins the merge-under-read contract: every successful
  * read is a CONSISTENT published state (key-unique, count equal to a
  * cumulative delivery boundary) — old or new, never partial or mixed;
  * the only acceptable failure is a transient missing-path during the
  * swap window (retried).
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def writeDelivery(tmp: Path, lo: Long, hi: Long): Path = {
    val stage = Files.createTempDirectory("graft-soak-stage").toString
    (lo until hi).map(i => (i, i * 2.0)).toDF("event_id", "value")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    part
  }

  test("ProcessingTime upsert under concurrent reads: only consistent states are observable") {
    val in = Files.createTempDirectory("graft-soak-in")
    val out = Files.createTempDirectory("graft-soak-out").toString + "/rel"
    val batchSize = 100L
    val nDeliveries = 5
    val validCounts = (0 to nDeliveries).map(_ * batchSize).toSet

    val stream = spark.readStream
      .schema("event_id LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val q = EventStreams.upsertStreamQuery(spark, stream, out,
      uniqueKey = Seq("event_id"), outputMode = "append",
      trigger = Trigger.ProcessingTime("300 milliseconds"))
    try {
      var observed = List.empty[Long]
      var transientMisses = 0
      (0 until nDeliveries).foreach { d =>
        val part = writeDelivery(in, d * batchSize, (d + 1) * batchSize)
        Files.copy(part, in.resolve(s"delivery-$d.parquet"))
        // concurrent reads while the trigger fires and merges land
        val deadline = System.nanoTime() + 2_000_000_000L
        while (System.nanoTime() < deadline) {
          try {
            val r = spark.read.parquet(out)
              .agg(count(lit(1)), count_distinct(col("event_id"))).head
            val (n, nd) = (r.getLong(0), r.getLong(1))
            assert(n == nd, s"non-key-unique state observed: $n rows, $nd keys")
            assert(validCounts.contains(n),
              s"partial state observed: $n rows is not a delivery boundary")
            observed ::= n
          } catch {
            // swap-window miss: the directory (or its files) vanished
            // between listing and read — the documented transient.
            // Under host load the miss can surface WRAPPED (a
            // multi-file read fails inside a job and the outer
            // SparkException says "job aborted" with the real cause
            // nested), so walk the cause chain for the markers; a
            // genuine consistency violation is an assertion error and
            // never matches
            case _: org.apache.spark.sql.AnalysisException => transientMisses += 1
            case e: org.apache.spark.SparkException if {
              var t: Throwable = e
              var hit = false
              while (t != null && !hit) {
                val m = t.getMessage
                if (m != null && (m.contains("FileNotFound") ||
                    m.contains("does not exist") ||
                    m.contains("FAILED_READ_FILE"))) hit = true
                t = t.getCause
              }
              hit
            } => transientMisses += 1
          }
          Thread.sleep(50)
        }
      }
      q.processAllAvailable()
      val finalN = spark.read.parquet(out).count()
      assert(finalN == nDeliveries * batchSize,
        s"drain incomplete: $finalN of ${nDeliveries * batchSize}")
      assert(observed.nonEmpty, "the concurrent reader never got a successful read")
      // evidence strength, not correctness: on a quiet host the reader
      // sees several intermediate states; on a badly lagged host merges
      // may trail the read windows and the set can degenerate — warn,
      // don't flake (the hard assertions above pinned consistency on
      // every read that DID land)
      if (observed.toSet.size < 2)
        info(s"WEAK EVIDENCE: only ${observed.toSet} observed — host lagged")
      info(s"observed states: ${observed.toSet.toSeq.sorted.mkString(",")}; " +
        s"transient misses retried: $transientMisses")
    } finally {
      if (q.isActive) q.stop()
    }
  }

  test("redelivery under ProcessingTime converges (idempotent merge, same keys twice)") {
    val in = Files.createTempDirectory("graft-soak-in2")
    val out = Files.createTempDirectory("graft-soak-out2").toString + "/rel"
    val stream = spark.readStream
      .schema("event_id LONG, value DOUBLE")
      .parquet(in.toString)
    val q = EventStreams.upsertStreamQuery(spark, stream, out,
      uniqueKey = Seq("event_id"), outputMode = "append",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      val part = writeDelivery(in, 0L, 50L)
      Files.copy(part, in.resolve("delivery-a.parquet"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 50L)
      // same content, new file name -> every key redelivered
      Files.copy(part, in.resolve("delivery-b.parquet"))
      q.processAllAvailable()
      val r = spark.read.parquet(out)
        .agg(count(lit(1)), count_distinct(col("event_id"))).head
      assert(r.getLong(0) == 50L && r.getLong(1) == 50L,
        "redelivered keys replaced, not appended")
    } finally {
      if (q.isActive) q.stop()
    }
  }
}
