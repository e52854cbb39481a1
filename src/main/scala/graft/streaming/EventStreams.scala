package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is a cron-refreshed batch
  * pipeline (Cloud Scheduler -> dbt run, SURVEY.md §3); its Spark-native
  * streaming rendering is a file-source stream processed with
  * `Trigger.AvailableNow` — each "cron tick" drains whatever files have
  * landed, exactly-once, then stops. The same transforms then scale to a
  * continuous stream unchanged.
  *
  * At 100 TB/day the source would be a partitioned landing zone (or
  * Kafka); everything below is already expressed against the unbounded
  * table model: watermarks bound state, windows pre-aggregate map-side,
  * and sessionization state is per-key and eagerly timed out.
  */
object EventStreams {

  /** On-disk schema of the LEGACY events table: ts as TIMESTAMP(NANOS)
    * parquet, which Spark only reads as a raw long (see Catalog.events).
    * Current generator output carries timestamp[us] instead — readEvents
    * sniffs which one a directory holds. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events directory (parquet). Streaming
    * sources need a declared schema, and the generator has shipped two
    * spellings of `ts` (TIMESTAMP(NANOS) and timestamp[us]) — so sniff
    * the schema from the files already present via one batch footer
    * read (a driver-side metadata op, not a data scan), falling back to
    * the legacy schema for an empty landing dir. Either way `ts` is
    * normalized to session-TZ micros before any watermark sees it.
    *
    * The sniff merges EVERY footer (mergeSchema): one declared schema is
    * applied to the whole stream, so a landing dir that mixes generator
    * generations (nanos files + micros files) cannot be read correctly —
    * the merge conflict on `ts` (long vs timestamp) fails LOUD here at
    * declaration time instead of misparsing the minority spelling by
    * ~1000x mid-stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = scala.util.Try(
        spark.read.option("mergeSchema", "true").parquet(dir).schema) match {
      case scala.util.Success(s) if s.fieldNames.contains("ts") => s
      case scala.util.Failure(e) if e.getMessage != null &&
          e.getMessage.toLowerCase.contains("merge") =>
        throw new IllegalStateException(
          s"events landing dir $dir mixes parquet ts encodings " +
            "(legacy TIMESTAMP(NANOS) files alongside timestamp[us] " +
            "files); a file-source stream declares ONE schema for all " +
            "files, so a mixed dir cannot be read correctly — separate " +
            "the generations into distinct landing dirs", e)
      case _ => eventsRawSchema // empty landing dir: legacy fallback
    }
    graft.catalog.Catalog.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(dir))
  }

  /** Windowed aggregation with a watermark: 5-minute tumbling windows of
    * count/sum(value) per event_type. Append-mode compatible (closed
    * windows only); state bounded by the 10-minute watermark. */
  def windowedTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  final case class SessionEvent(user_id: Long, event_id: Long, tsMicros: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Stateful sessionization via flatMapGroupsWithState: the streaming
    * twin of CoreQueries.q14Sessionize (30-minute inactivity gap). Emits
    * a session row when a gap closes it; trailing sessions stay open in
    * state. State per user is one 3-field struct — O(active users).
    *
    * `withTimeout=true` additionally closes idle sessions on a
    * processing-time timeout — for CONTINUOUS operation only: pending
    * timeouts force extra micro-batches under Trigger.AvailableNow
    * (observed: the drain never terminates), so batch-drain runs must
    * leave it off. */
  def sessionize(events: DataFrame, gapMicros: Long = 30L * 60 * 1000000,
                 withTimeout: Boolean = false)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val typed = events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros")).as[SessionEvent]

    def fn(userId: Long, rows: Iterator[SessionEvent],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, s.start, s.last, s.n))
      }
      val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.event_id))
      var cur = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.tsMicros - s.last <= gapMicros =>
            // min/max, never plain assignment: a LATE event from an
            // earlier micro-batch window (cross-batch arrival order is
            // not sorted) must widen the session bounds, not regress
            // `last` below `start` — the regressed state both inverts
            // the emitted session and mis-measures the next gap. A late
            // event is folded into the open session (streaming
            // best-effort; the batch q14 operator is the exact one).
            cur = Some(SessionState(math.min(s.start, e.tsMicros),
              math.max(s.last, e.tsMicros), s.n + 1))
          case Some(s) =>
            closed += SessionOut(userId, s.start, s.last, s.n)
            cur = Some(SessionState(e.tsMicros, e.tsMicros, 1))
          case None =>
            cur = Some(SessionState(e.tsMicros, e.tsMicros, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (withTimeout) state.setTimeoutDuration("30 minutes")
      }
      closed.result().iterator
    }

    val timeout =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** Native session-window aggregation — the declarative twin of
    * [[sessionize]]: Spark's `session_window` merges per-user event-time
    * windows separated by less than the gap, entirely inside the
    * aggregation operator (state = one open window per key, evicted by
    * the watermark). Use this form when the per-session output is an
    * AGGREGATE (count/sum/min/max); `sessionize`'s
    * flatMapGroupsWithState remains for custom state logic. Emits only
    * CLOSED sessions (append mode: a session is final once the
    * watermark passes its end) — the spec pins drain == the batch
    * session_window aggregation minus each user's trailing session,
    * which is exactly the still-open state. */
  def sessionWindowCounts(events: DataFrame,
                          gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup: drops rows whose key was already seen,
    * with state bounded by the watermark (a duplicate arriving later
    * than `withinWatermark` after the original may pass — the standard
    * streaming-dedup contract; exact global dedup is the batch
    * operator's job). */
  def dedupEvents(events: DataFrame, withinWatermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", withinWatermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming harmonized union — the TLC-union shape on an unbounded
    * source (SURVEY.md §7.2 slice 5): per-feed projections with typed
    * NULL padding, unioned; all map-only, so watermarks/state are not
    * involved and the plan scales like the batch one. */
  def harmonizedUnion(events: DataFrame): DataFrame = {
    import graft.harmonize.Harmonize._
    import org.apache.spark.sql.types._
    val canon = Seq(
      CanonicalCol("event_id", LongType),
      CanonicalCol("ts", TimestampType),
      CanonicalCol("user_id", LongType),
      CanonicalCol("amount", DoubleType),
      CanonicalCol("kind", StringType))
    unionHarmonized(canon, Seq(
      SourceFeed("clicks", events.filter(col("event_type") === "click"),
        Map("event_id" -> "event_id", "ts" -> "ts", "user_id" -> "user_id",
            "amount" -> "value"),
        Map("kind" -> lit("click"))),
      SourceFeed("signups", events.filter(col("event_type") === "signup"),
        Map("event_id" -> "event_id", "ts" -> "ts", "user_id" -> "user_id"),
        Map("kind" -> lit("signup")))))
  }

  /** Streaming upsert sink: drains the stream with Trigger.AvailableNow
    * and merges every micro-batch into the parquet relation at `path`
    * with the SAME delete+insert semantics as the batch DAG's
    * Incremental materialization ([[graft.pipeline.Pipeline
    * .mergeIntoParquet]]) — the streaming path into the warehouse
    * contract. Use outputMode "update" for upserting a streaming
    * aggregation (each batch emits changed keys, the merge replaces
    * them) or "append" for keyed fact streams (redelivered keys
    * converge to one row). foreachBatch is at-least-once; the merge is
    * idempotent per key set, so a replayed batch lands the same state.
    *
    * `partitionBy` passes through to the merge: when every partition
    * column is part of `uniqueKey` (keys cannot migrate across
    * partitions), each micro-batch rewrites ONLY the partition dirs its
    * increment touches — the O(affected-partitions) path that keeps
    * per-micro-batch upserts viable on a 100 TB relation. Without it
    * every micro-batch is a full-table read+rewrite+swap (correct, but
    * only sized for small relations). */
  def upsertStream(spark: SparkSession, out: DataFrame, path: String,
                   uniqueKey: Seq[String],
                   outputMode: String = "update",
                   partitionBy: Seq[String] = Nil): Unit =
    upsertStreamQuery(spark, out, path, uniqueKey, outputMode, partitionBy,
      Trigger.AvailableNow()).awaitTermination()

  /** Trigger-parameterized form of [[upsertStream]], returning the
    * running query: `Trigger.ProcessingTime(...)` gives the continuous
    * micro-batch upsert (caller stops the query), `AvailableNow` the
    * drain-and-stop cron tick. Merge semantics are identical — each
    * micro-batch goes through the same crash-safe
    * [[graft.pipeline.Pipeline.mergeIntoParquet]] swap.
    *
    * Concurrent-reader contract (pinned by StreamingSoakSpec): the
    * merge publishes via whole-directory rename, so a concurrent
    * parquet read sees the OLD state, the NEW state, or a transient
    * missing-path error during the swap window (retry) — never a
    * partial or mixed key set. A transactional table format would
    * remove the transient-miss window; plain parquet dirs cannot. */
  def upsertStreamQuery(spark: SparkSession, out: DataFrame, path: String,
                        uniqueKey: Seq[String],
                        outputMode: String = "update",
                        partitionBy: Seq[String] = Nil,
                        trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    out.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.pipeline.Pipeline.mergeIntoParquet(
          spark, path, batch.toDF(), uniqueKey, partitionBy)
      }
      .outputMode(outputMode)
      .option("checkpointLocation", s"$path.__checkpoint")
      .trigger(trigger)
      .start()

  /** [[upsertStreamQuery]] against a SNAPSHOT-VERSIONED table
    * ([[graft.pipeline.VersionedTable]]) — the transactional form the
    * plain-dir contract above explicitly scopes out: each micro-batch
    * commits as a new version (manifest + atomic pointer rename), so a
    * concurrent reader NEVER sees a transient missing path or mixed
    * state — it reads whichever version was current when it resolved,
    * fully consistent mid-scan. Merge semantics are mergeIntoParquet's
    * delete+insert, partition-scoped when partitionBy ⊆ uniqueKey;
    * content converges under at-least-once replay (re-merging a batch
    * is delete+insert of the same rows), with versions as the audit
    * trail. Call [[graft.pipeline.VersionedTable.prune]] on the
    * maintenance cadence to bound retention. */
  def versionedUpsertStreamQuery(spark: SparkSession, out: DataFrame,
                                 root: String, uniqueKey: Seq[String],
                                 outputMode: String = "update",
                                 partitionBy: Seq[String] = Nil,
                                 trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    out.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.pipeline.VersionedTable.merge(
          spark, root, batch.toDF(), uniqueKey, partitionBy)
        ()
      }
      .outputMode(outputMode)
      .option("checkpointLocation", s"$root.__checkpoint")
      .trigger(trigger)
      .start()

  /** STREAMING RAG INGEST — the r13 curation-DAG RAG loop's serving
    * tick as a stream: every document micro-batch (a crawl drop) is
    * chunked ([[graft.operators.TextAnalysis.tokenWindowChunks]], the
    * t24 kernel), stub-embedded
    * ([[graft.multimodal.Multimodal.stubTextEmbedding]] — one
    * expression, a real encoder swaps in at that point), assigned
    * MAP-ONLY against the FROZEN coarse codebook (the e20
    * maintained-index contract — the stream never refits; the e18
    * recall gate decides when to retrain offline), and merged into the
    * versioned cell-partitioned index on (cell, chunk_id) — the same
    * storage contract as [[graft.models.CurationModels]]'s
    * RAG_CHUNK_INDEX stage and
    * [[graft.io.IvfMaintenance.upsertVersioned]]. Readers pin a
    * version: a search concurrent with any number of ticks sees one
    * consistent index. Re-sent doc_ids REPLACE their chunks in place
    * (latest-wins within a cell); a doc whose re-chunked spans move
    * cells needs a delete first (the append-log caveat, same as
    * upsertVersioned). Convergent under at-least-once replay
    * (delete+insert of identical rows).
    *
    * Scale shape: chunk+embed+assign ride the micro-batch scan with no
    * shuffle; the merge rewrites only the batch's cells. Per-tick cost
    * tracks the batch, never the index. */
  def ragIngestStreamQuery(spark: SparkSession, docs: DataFrame,
                           textCol: String, idCol: String,
                           codebook: Seq[Seq[Double]], dim: Int,
                           root: String,
                           cap: Int = graft.operators.TextAnalysis.ChunkCap,
                           stride: Int = graft.operators.TextAnalysis.ChunkStride,
                           trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val assigned = graft.operators.Similarity.cellAssignmentsTrained(
      ragChunkEmbed(docs, textCol, idCol, dim, cap, stride),
      "emb", "chunk_id", codebook)
      .withColumnRenamed("id", "chunk_id")
    versionedUpsertStreamQuery(spark, assigned, root,
      uniqueKey = Seq("cell", "chunk_id"), outputMode = "append",
      partitionBy = Seq("cell"), trigger = trigger)
  }

  /** The shared RAG tick front half: chunk → packed chunk_id →
    * stub-embed. Map-only; rides the micro-batch scan. */
  private def ragChunkEmbed(docs: DataFrame, textCol: String, idCol: String,
                            dim: Int, cap: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.TextAnalysis
      .tokenWindowChunks(docs, textCol, idCol, cap, stride)
      .withColumn("chunk_id",
        col("doc_id") * lit(graft.operators.TextAnalysis.ChunkIdBase) +
          col("chunk_idx"))
      .withColumn("emb", graft.multimodal.Multimodal
        .stubTextEmbedding(col("chunk_text"), dim))
  }

  /** STREAMING ATOMIC PUBLISH — the [[graft.pipeline.PublishSet]]
    * release folded into the RAG ingest tick (the r14 candidate): every
    * micro-batch epoch
    *
    *   chunk → stub-embed (map-only, rides the batch scan)
    *   → merge chunks into the versioned CHUNKS table (chunk_id-keyed)
    *   → merge assignments into the versioned cell-partitioned INDEX
    *     ([[graft.io.IvfMaintenance.upsertVersioned]], frozen codebook)
    *   → GATE: the new index version's row count must not be below the
    *     currently RELEASED index version's (the accretion invariant —
    *     latest-wins replacement keeps counts equal, a bad merge that
    *     drops cells shrinks them; exact integer compare, the deep
    *     recall gate stays an offline concern per the e18/e20 contract)
    *   → ONE [[graft.pipeline.PublishSet.publish]] naming the exact
    *     (chunks, index, codebook) versions this epoch produced,
    *     annotated `epoch <batchId>`.
    *
    * Readers resolving through the registry therefore NEVER see a
    * mid-tick state: the chunks/index commits land first, invisible,
    * and become the release only at the single registry CAS. A failed
    * gate publishes nothing — release readers keep the previous epoch
    * (the ragRecallGate discipline per tick).
    *
    * The frozen codebook is itself a release member: committed once
    * (v1) on the first epoch and pinned in every release, so a resolved
    * set always carries the quantizer its index was assigned with —
    * the index/codebook lockstep contract without per-epoch refits.
    *
    * Replay safety (the cmsFoldBatch trichotomy, review r14): the
    * member merges are idempotent keyed merges (replaying identical
    * rows converges — the [[ragIngestStreamQuery]] contract), and the
    * newest RETAINED release's `epoch <id> rows <n>` note is the
    * authoritative epoch cursor (scanned newest-first, so an
    * interleaved [[graft.pipeline.PublishSet.rollback]] — whose note
    * is `rollback to vN` — never erases epoch memory). A replayed
    * batch (id == cursor) re-runs the idempotent merges but SKIPS the
    * publish; a batch id BELOW the cursor means the checkpoint was
    * reset while the registry survived — that fails LOUD before any
    * merge (silently merging-but-never-releasing until ids catch up
    * would starve release readers). Epochs that fail the gate never
    * advance the cursor — their rows ride the NEXT epoch's release.
    *
    * At 100 TB: per-tick cost tracks the batch — map-only front; the
    * chunks member merges partition-scoped on a doc-id RANGE bucket
    * (a crawl drop's fresh monotone ids land in the newest buckets,
    * so old buckets' files are reused verbatim, review r14); the
    * index merge rewrites only the batch's cells; the gate compares
    * the note's stored row count against ONE count of the new index
    * version (no released-version rescan); the registry CAS is
    * metadata-only. */
  def ragReleaseStreamQuery(spark: SparkSession, docs: DataFrame,
                            textCol: String, idCol: String,
                            codebook: Seq[Seq[Double]], dim: Int,
                            registryRoot: String, chunksRoot: String,
                            indexRoot: String, codebookRoot: String,
                            cap: Int = graft.operators.TextAnalysis.ChunkCap,
                            stride: Int = graft.operators.TextAnalysis.ChunkStride,
                            trigger: Trigger = Trigger.AvailableNow(),
                            gcKeepReleases: Option[Int] = None,
                            gcMemberKeep: Int = 1,
                            gcStaleAfterMs: Long = 3600 * 1000L,
                            chunkBucketDocs: Long = 100000L,
                            compactMaxFiles: Option[Int] = None,
                            compactColdVersions: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{PublishSet, VersionedTable}
    require(chunkBucketDocs >= 1, s"bad chunkBucketDocs $chunkBucketDocs")
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ragReleaseFoldBatch(spark, batch.toDF(), batchId, textCol, idCol,
          codebook, dim, registryRoot, chunksRoot, indexRoot, codebookRoot,
          cap, stride, gcKeepReleases, gcMemberKeep, gcStaleAfterMs,
          chunkBucketDocs, compactMaxFiles, compactColdVersions)
      }
      .option("checkpointLocation", s"$registryRoot.__checkpoint")
      .trigger(trigger)
      .start()
  }

  /** The guarded per-epoch release fold (exposed so the replay spec
    * can drive it with a stale batch id — the cmsFoldBatch pattern). */
  private[graft] def ragReleaseFoldBatch(spark: SparkSession,
      batchDf: DataFrame, batchId: Long, textCol: String, idCol: String,
      codebook: Seq[Seq[Double]], dim: Int, registryRoot: String,
      chunksRoot: String, indexRoot: String, codebookRoot: String,
      cap: Int, stride: Int, gcKeepReleases: Option[Int],
      gcMemberKeep: Int, gcStaleAfterMs: Long,
      chunkBucketDocs: Long,
      compactMaxFiles: Option[Int] = None,
      compactColdVersions: Int = 0): Unit = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{PublishSet, VersionedTable}
    {
        val batch = batchDf
        val released = PublishSet.currentVersion(spark, registryRoot)
        // the newest RETAINED 'epoch <id> rows <n>' note is the epoch
        // cursor — scanned newest-first so a rollback release's
        // 'rollback to vN' note cannot erase epoch memory (review r14)
        def parseNote(n: String): Option[(Long, Option[Long])] =
          n.split(' ') match {
            case Array("epoch", e) => e.toLongOption.map(_ -> None)
            case Array("epoch", e, "rows", r) =>
              e.toLongOption.map(_ -> r.toLongOption)
            case _ => None
          }
        val lastRelease: Option[(Long, Option[Long])] =
          if (released.isEmpty) None
          else PublishSet.versions(spark, registryRoot).reverseIterator
            .map(v => PublishSet.note(spark, registryRoot, v)
              .flatMap(parseNote))
            .collectFirst { case Some(x) => x }
        // the epoch cursor is the MAX of the note-derived cursor and
        // the persisted sidecar ([[PublishSet.readEpochCursor]]):
        // retention can fill the registry window entirely with
        // rollback-noted releases, resetting the note cursor to -1 —
        // a replayed batch would then re-publish OVER the rollback
        // (ADVICE r14). The sidecar survives any prune; rollback never
        // advances it (rollback must not reset OR extend epoch memory).
        val cursorEpoch = PublishSet.readEpochCursor(spark, registryRoot)
          .map(_._1).getOrElse(-1L)
        // re-sync a LAGGING sidecar from the notes (review r15): a
        // crash between publish and the cursor advance leaves the
        // sidecar one epoch behind, and the replayed batch then skips
        // the publish WITHOUT advancing it — retention could later
        // erase the only up-to-date copy (the exact hole the sidecar
        // closes). The note still retained at this instant carries the
        // same (epoch, rows) the crashed advance would have written.
        lastRelease.filter(_._1 > cursorEpoch).foreach { case (e, rows) =>
          PublishSet.advanceEpochCursor(spark, registryRoot, e,
            rows.getOrElse(0L))
        }
        val lastEpoch = math.max(lastRelease.map(_._1).getOrElse(-1L),
          cursorEpoch)
        // the cmsFoldBatch trichotomy, BEFORE any member merge: a batch
        // id below the cursor means the checkpoint restarted at 0 while
        // the registry survived — merging-but-never-publishing until
        // ids catch up would silently starve release readers
        if (batchId < lastEpoch)
          throw new IllegalStateException(
            s"release registry at $registryRoot has epoch cursor " +
              s"$lastEpoch but the stream delivered batchId=$batchId — " +
              "the checkpoint was reset while the registry survived; " +
              "restore the checkpoint (or move registry, members and " +
              "checkpoint aside together) before restarting")
        // within-epoch dedup: a crawl drop can carry the same doc twice
        // (a re-fetch landing in the same batch) — the keyed member
        // merges dedup ACROSS epochs but insert every row of one
        // increment, so duplicate ids must collapse here; max(text) is
        // the deterministic keeper (dropDuplicates' first-wins is
        // partitioning-dependent), found by the replay spec inserting
        // doubled chunk rows
        val dedup = batch.toDF().groupBy(col(idCol))
          .agg(max(col(textCol)).as(textCol))
        val chunked = ragChunkEmbed(dedup, textCol, idCol, dim,
            cap, stride)
          // one durable cut: chunks feed BOTH member merges, and the
          // second merge must not rescan a landing dir the first one's
          // job may outlive (the curation-tick eager-cut rule)
          .localCheckpoint()
        // doc-id RANGE bucket as the chunks partition (review r14): a
        // crawl drop's fresh monotone ids land in the newest buckets,
        // so the partition-scoped merge reuses old buckets' files
        // verbatim — per-tick write cost tracks the batch, not the
        // accumulated corpus
        val chunksV = VersionedTable.merge(spark, chunksRoot,
          chunked.select(
            expr(s"doc_id div ${chunkBucketDocs}L").as("chunk_bucket"),
            col("doc_id"), col("chunk_idx"), col("chunk_id"),
            col("chunk_text")),
          uniqueKey = Seq("chunk_bucket", "chunk_id"),
          partitionBy = Seq("chunk_bucket"))
        val idxV = graft.io.IvfMaintenance.upsertVersioned(spark, indexRoot,
          chunked.select(col("chunk_id"), col("emb")), "emb", "chunk_id",
          codebook)
        val cbV = VersionedTable.currentVersion(spark, codebookRoot)
          .getOrElse {
            import spark.implicits._
            VersionedTable.write(spark, codebookRoot,
              codebook.zipWithIndex.map { case (c, i) => (i.toLong, c) }
                .toDF("cell", "centroid"))
          }
        // accretion gate vs the RELEASED index: the released count
        // comes from the note (no released-version rescan, review
        // r14); pre-`rows` notes fall back to counting the pin once
        val releasedIdxRows = lastRelease.flatMap(_._2).orElse {
          released
            .map(v => PublishSet.resolveVersion(spark, registryRoot, v))
            .flatMap(_.get(indexRoot))
            .map(v => VersionedTable.readVersion(spark, indexRoot, v)
              .count())
        }.getOrElse(0L)
        val newIdxRows = VersionedTable.readVersion(spark, indexRoot, idxV)
          .count()
        if (batchId > lastEpoch && newIdxRows >= releasedIdxRows) {
          PublishSet.publish(spark, registryRoot,
            Map(chunksRoot -> chunksV, indexRoot -> idxV,
              codebookRoot -> cbV),
            note = Some(s"epoch $batchId rows $newIdxRows"))
          // persist the cursor OUTSIDE note retention (ADVICE r14) —
          // after the publish, so a crash between the two leaves the
          // note as the (still-retained, newest) cursor source
          PublishSet.advanceEpochCursor(spark, registryRoot, batchId,
            newIdxRows)
          // in-tick retention maintenance (opt-in): bound the registry
          // to the newest gcKeepReleases, then the retention-coupled
          // member GC ([[graft.pipeline.PublishSet.pruneMembers]]) —
          // the maintenance cadence that otherwise needs an external
          // cron rides the publish that created the garbage. Runs only
          // AFTER a successful publish, so a gate-failed epoch never
          // triggers a sweep under the release readers still serve.
          gcKeepReleases.foreach { keep =>
            PublishSet.prune(spark, registryRoot, keep)
            PublishSet.pruneMembers(spark, registryRoot, gcMemberKeep,
              gcStaleAfterMs)
          }
          // opt-in small-file maintenance AFTER the publish: each
          // partition-scoped merge leaves one shuffle-task file set per
          // touched bucket, so long-running members fragment steadily —
          // compactPartitions rewrites ONLY over-threshold buckets
          // (content-identical new version, above the retained floor;
          // the release keeps serving its pinned version untouched)
          // compactColdVersions > 0 adds the cadence policy: only
          // buckets untouched by the last N VERSIONS compact (size N
          // in versions, not merges — compaction commits advance the
          // version counter too), so the hot range bucket (still
          // receiving every tick's fresh ids) is never rewritten just
          // to re-fragment next tick
          compactMaxFiles.foreach { maxF =>
            VersionedTable.compactPartitions(spark, chunksRoot, maxF,
              compactColdVersions)
            VersionedTable.compactPartitions(spark, indexRoot, maxF,
              compactColdVersions)
          }
        }
        ()
    }
  }

  /** STREAMING DELTA NEAR-DUP PAIRING — the delta dedup family
    * ([[graft.operators.Dedup.minhashPairsDelta]]) driven by a
    * document stream: every micro-batch (a crawl drop) pairs against
    * the materialized keeper state, appends its contributed pairs, and
    * folds itself into the state. The pairs relation stores
    * (id1, id2, jaccard) WITHOUT weights: a later batch's exact copies
    * re-weight earlier pairs, so stored weights would go stale —
    * consumers derive weights by joining the CURRENT state's copy
    * counts ([[weightedPairs]]), which keeps them exact at any read
    * point. The final (pairs ∪ derived weights) relation equals the
    * batch rebuild for ANY slicing with append-ordered ids
    * (StreamingDeltaDedupSpec pins it): within-batch pairs land with
    * their batch, cross-batch pairs with the later one, and no pair is
    * ever produced twice (only NEW fingerprints pair). When a later
    * slice carries a SMALLER id for a known fingerprint, the
    * keeper-stable merge ([[graft.operators.Dedup
    * .mergeFingerprintRepState]], ADVICE r7) keeps every stored pair
    * valid — the result then matches the rebuild up to first-seen vs
    * min-id keeper naming.
    *
    * foreachBatch is at-least-once; the state fold is NOT idempotent
    * (counts would double), so replays must be skipped. The
    * last-processed batch id is committed ATOMICALLY WITH the state
    * (a `last_batch` column written in the same crash-safe
    * [[graft.pipeline.Pipeline.mergeIntoParquet]] swap — ADVICE r7:
    * the previous sidecar marker file was written AFTER the fold, so a
    * crash between the two doubled counts on replay, and its java.nio
    * path silently restricted statePath to local filesystems). Write
    * order per batch: pairs first (idempotent per (id1,id2) key — a
    * replayed merge lands identical rows), then bands/base appends
    * (idempotent per key the same way), then the state fold + batch id
    * in one swap. A crash anywhere replays into the OLD state and
    * re-produces byte-identical intermediate merges.
    *
    * The state side's signatures come from MATERIALIZED companion
    * tables (`<statePath>_base`, `<statePath>_bands` — [[graft
    * .operators.Dedup.minhashPairsDeltaBanded]]): each batch appends
    * its new fingerprints' rows, so no micro-batch ever re-shingles
    * old text and per-batch cost is independent of state size
    * (VERDICT r7 next-#3). */
  /** Shared keeper-state read for the delta streaming queries: the
    * (fp, id, text, n_copies) relation plus the last committed batch id
    * (-1 when the state is absent OR predates the r8 atomic batch-id
    * column — both queries tolerate a pre-r8 state, ADVICE r8 low).
    * Existence resolves through the path's Hadoop FileSystem
    * ([[graft.pipeline.Pipeline.pathExists]]) — the previous
    * `java.io.File` check read an HDFS/S3 state as empty, defeating the
    * replay guard and replacing accumulated counts (ADVICE r8 medium). */
  private def readKeeperState(spark: SparkSession, statePath: String)
      : (DataFrame, Long) = {
    import spark.implicits._
    val stateExists = graft.pipeline.Pipeline.pathExists(spark, statePath)
    val rawState =
      if (stateExists) spark.read.parquet(statePath)
      else Seq.empty[(String, Long, String, Long, Long)]
        .toDF("fp", "id", "text", "n_copies", "last_batch")
    val last =
      if (!stateExists || !rawState.columns.contains("last_batch")) -1L
      else rawState.agg(coalesce(max(col("last_batch")), lit(-1L)))
        .head.getLong(0)
    (rawState.select(col("fp"), col("id"), col("text"), col("n_copies")), last)
  }

  /** Companion/label relation read-or-empty, through the Hadoop
    * FileSystem for the same reason as [[readKeeperState]]. */
  private def readOrEmpty(spark: SparkSession, path: String,
                          empty: => DataFrame): DataFrame =
    if (graft.pipeline.Pipeline.pathExists(spark, path))
      spark.read.parquet(path)
    else empty

  /** The two signature companion tables of a keeper state. */
  private def readBandState(spark: SparkSession, statePath: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    (readOrEmpty(spark, s"${statePath}_base",
       Seq.empty[(Long, Seq[String])].toDF("id", "sh")),
     readOrEmpty(spark, s"${statePath}_bands",
       Seq.empty[(Long, String)].toDF("id", "band")))
  }

  def deltaDedupStreamQuery(spark: SparkSession, docs: DataFrame,
                            textCol: String, idCol: String,
                            statePath: String, pairsPath: String,
                            threshold: Double = 0.5,
                            trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val (state, last) = readKeeperState(spark, statePath)
        if (batchId > last) {
          val (stateBase, stateBands) = readBandState(spark, statePath)
          val delta = graft.operators.Dedup.minhashPairsDeltaBanded(
            batch.toDF(), state, stateBase, stateBands,
            textCol, idCol, threshold = threshold)
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, pairsPath, delta.pairs.select(col("id1"), col("id2"), col("jaccard")),
            Seq("id1", "id2"))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, s"${statePath}_base", delta.newBase, Seq("id"))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, s"${statePath}_bands", delta.newBands, Seq("id", "band"))
          val newState = graft.operators.Dedup.mergeFingerprintRepState(
              state, batch.toDF(), textCol, idCol)
            .withColumn("last_batch", lit(batchId))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, statePath, newState, Seq("fp"))
        }
        () // foreachBatch wants (Dataset, Long) => Unit
      }
      .option("checkpointLocation", s"$statePath.__checkpoint")
      .trigger(trigger)
      .start()

  /** Freeze the cosine-link state from a reference corpus — the
    * [[graft.operators.Dedup.allPairsCosineState]] relations written as
    * warehouse tables for [[cosineLinkStreamQuery]]'s ticks: `_freq`
    * (the FROZEN blocking order — ticks never touch it), `_prefix`,
    * and `_base` (with the replay-guard `last_batch` column). */
  def initCosineLinkState(spark: SparkSession, ref: DataFrame,
                          textCol: String, idCol: String, shingleN: Int,
                          tauNum: Int, tauDen: Int,
                          statePath: String): Unit = {
    val (freq, prefix, base) = graft.operators.Dedup.allPairsCosineState(
      ref, textCol, idCol, shingleN, tauNum, tauDen)
    freq.write.mode("overwrite").parquet(s"${statePath}_freq")
    prefix.write.mode("overwrite").parquet(s"${statePath}_prefix")
    base.withColumn("last_batch", lit(-1L))
      .write.mode("overwrite").parquet(s"${statePath}_base")
  }

  /** STREAMING COSINE LINK — the d26 batch-vs-state join as a
    * micro-batch tick over an unbounded crawl: every drop links
    * against the ACCRETED state (the frozen reference plus every
    * earlier drop), emits its internal pairs too, and appends its own
    * sets + frozen-order prefix so later drops link against it. The
    * blocking order never changes (losslessness holds under any SHARED
    * total order; only bucket-size quality drifts — re-freezing is the
    * tuning lever), so the union of all emitted pairs equals the
    * static [[graft.operators.Dedup.allPairsCosine]] on everything
    * ever seen — the StreamingDeltaDedupSpec invariant, pinned by
    * StreamingCosineLinkSpec. Pairs are stored orientation-normalized
    * (id1 < id2). Per-tick cost: the batch's sets are hashed ONCE and
    * reused for the cross link, the internal link, and the state
    * append; the replay guard (max last_batch in `_base`) makes a
    * re-delivered batch a no-op. */
  def cosineLinkStreamQuery(spark: SparkSession, docs: DataFrame,
                            textCol: String, idCol: String, shingleN: Int,
                            tauNum: Int, tauDen: Int,
                            statePath: String, pairsPath: String,
                            trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val stateBase = spark.read.parquet(s"${statePath}_base")
        val last = stateBase
          .agg(coalesce(max(col("last_batch")), lit(-1L))).head.getLong(0)
        if (batchId > last) {
          val freq = spark.read.parquet(s"${statePath}_freq")
          val prefix = spark.read.parquet(s"${statePath}_prefix")
          val (bBase, bPrefix) = graft.operators.Dedup.allPairsCosineAppend(
            batch.toDF(), textCol, idCol, shingleN, tauNum, tauDen, freq)
          val cross = graft.operators.Dedup.allPairsCosineDeltaPre(
              bBase, bPrefix, tauNum, tauDen, prefix,
              stateBase.select("id", "shs", "n"))
            .select(
              least(col("ref_id"), col("batch_id")).as("id1"),
              greatest(col("ref_id"), col("batch_id")).as("id2"),
              when(col("ref_id") < col("batch_id"), col("n_ref"))
                .otherwise(col("n_batch")).as("n1"),
              when(col("ref_id") < col("batch_id"), col("n_batch"))
                .otherwise(col("n_ref")).as("n2"),
              col("n_shared"), col("cos_nano"))
          val internal = graft.operators.Dedup.allPairsCosinePre(
            bBase, tauNum, tauDen)
          graft.pipeline.Pipeline.mergeIntoParquet(spark, pairsPath,
            cross.unionByName(internal), Seq("id1", "id2"))
          graft.pipeline.Pipeline.mergeIntoParquet(spark,
            s"${statePath}_prefix", bPrefix, Seq("h", "id"))
          graft.pipeline.Pipeline.mergeIntoParquet(spark,
            s"${statePath}_base",
            bBase.withColumn("last_batch", lit(batchId)), Seq("id"))
        }
        ()
      }
      .option("checkpointLocation", s"$statePath.__checkpoint")
      .trigger(trigger)
      .start()

  /** Freeze the containment-link state from a reference corpus — the
    * [[graft.operators.Dedup.allPairsContainmentState]] relations as
    * warehouse tables for [[containLinkStreamQuery]]'s ticks: `_freq`
    * (the FROZEN blocking order), `_small`/`_big` (BOTH role prefixes
    * with positions), and `_base` (with the replay-guard `last_batch`
    * column). */
  def initContainLinkState(spark: SparkSession, ref: DataFrame,
                           textCol: String, idCol: String, shingleN: Int,
                           tauNum: Int, tauDen: Int, minN: Int,
                           statePath: String): Unit = {
    val (freq, small, big, base) =
      graft.operators.Dedup.allPairsContainmentState(
        ref, textCol, idCol, shingleN, tauNum, tauDen, minN)
    freq.write.mode("overwrite").parquet(s"${statePath}_freq")
    small.write.mode("overwrite").parquet(s"${statePath}_small")
    big.write.mode("overwrite").parquet(s"${statePath}_big")
    base.withColumn("last_batch", lit(-1L))
      .write.mode("overwrite").parquet(s"${statePath}_base")
  }

  /** STREAMING CONTAINMENT LINK — [[cosineLinkStreamQuery]]'s accreting
    * tick for the ASYMMETRIC family: every crawl drop links against the
    * accreted state (frozen reference + every earlier drop) through the
    * two role paths, emits its internal pairs, and appends its own sets
    * + BOTH frozen-order role prefixes so later drops link against it.
    * Losslessness holds under the SHARED frozen total order (unseen
    * hashes rank frequency-0, ordered among themselves by hash — the
    * same order every batch uses, so batch-batch pairs through unseen
    * vocabulary still link); the union of all emitted pairs equals the
    * static [[graft.operators.Dedup.allPairsContainment]] on everything
    * ever seen (StreamingContainLinkSpec pins it). Pairs are stored in
    * the operator's canonical orientation — id1 = the CONTAINED
    * (smaller; id asc on ties) side. Per-tick cost: the batch's sets
    * are hashed and ranked ONCE and reused for the cross link, the
    * internal link, and the state append; the replay guard
    * (max last_batch in `_base`) makes a re-delivered batch a no-op. */
  def containLinkStreamQuery(spark: SparkSession, docs: DataFrame,
                             textCol: String, idCol: String, shingleN: Int,
                             tauNum: Int, tauDen: Int, minN: Int,
                             statePath: String, pairsPath: String,
                             trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val stateBase = spark.read.parquet(s"${statePath}_base")
        val last = stateBase
          .agg(coalesce(max(col("last_batch")), lit(-1L))).head.getLong(0)
        if (batchId > last) {
          val freq = spark.read.parquet(s"${statePath}_freq")
          val small = spark.read.parquet(s"${statePath}_small")
          val big = spark.read.parquet(s"${statePath}_big")
          val (bBase, bSmall, bBig) =
            graft.operators.Dedup.allPairsContainmentAppend(
              batch.toDF(), textCol, idCol, shingleN, tauNum, tauDen,
              minN, freq)
          // canonical orientation: id1 = the contained (smaller;
          // id-asc on ties) side, matching allPairsContainment
          val sm = col("n_ref") < col("n_batch") ||
            (col("n_ref") === col("n_batch") &&
              col("ref_id") < col("batch_id"))
          val cross = graft.operators.Dedup.allPairsContainmentDeltaPre(
              bBase, bSmall, bBig, tauNum, tauDen,
              small, big, stateBase.select("id", "shs", "n"))
            .select(
              when(sm, col("ref_id")).otherwise(col("batch_id")).as("id1"),
              when(sm, col("batch_id")).otherwise(col("ref_id")).as("id2"),
              when(sm, col("n_ref")).otherwise(col("n_batch")).as("n1"),
              when(sm, col("n_batch")).otherwise(col("n_ref")).as("n2"),
              col("n_shared"), col("cont_nano"))
          val internal = graft.operators.Dedup.allPairsContainmentPre(
            bBase, tauNum, tauDen, minN)
          graft.pipeline.Pipeline.mergeIntoParquet(spark, pairsPath,
            cross.unionByName(internal), Seq("id1", "id2"))
          graft.pipeline.Pipeline.mergeIntoParquet(spark,
            s"${statePath}_small", bSmall, Seq("h", "id"))
          graft.pipeline.Pipeline.mergeIntoParquet(spark,
            s"${statePath}_big", bBig, Seq("h", "id"))
          graft.pipeline.Pipeline.mergeIntoParquet(spark,
            s"${statePath}_base",
            bBase.withColumn("last_batch", lit(batchId)), Seq("id"))
        }
        ()
      }
      .option("checkpointLocation", s"$statePath.__checkpoint")
      .trigger(trigger)
      .start()

  /** STREAMING CURATION — the curation DAG's per-document gate chain
    * composed with the delta dedup family on an unbounded crawl
    * (VERDICT r7 next-#6): every micro-batch (a crawl drop) runs
    *
    *   gate (profile + filter + redact, [[graft.models.CurationModels
    *   .gateDocs]] — the EXACT batch-DAG code, stateless per doc)
    *   → exact-dedup against the evolving fingerprint keeper state
    *     (first-seen keeper; == the batch DAG's min-id keeper under
    *     append-ordered ids)
    *   → decontamination of the NEW keepers against the fixed
    *     benchmark (per-doc, stateless)
    *   → append to the streamed DOCS_CLEAN relation,
    *
    * plus the banded delta near-dup pairing over the same gated batch
    * ([[graft.operators.Dedup.minhashPairsDeltaBanded]] with
    * materialized signature state), and the TRANSITIVE GROUPS folded
    * forward per batch ([[graft.operators.Dedup
    * .connectedComponentsDelta]] over the previous labeling + the
    * batch's contributed pairs — |state|+|batch| edges, never the full
    * pair history; maintained at `<pairsPath>_groups`, idempotent on
    * replay because re-folding already-incorporated pairs is a
    * fixpoint). StreamingCurationSpec pins: drained over any
    * append-ordered slicing, the streamed DOCS_CLEAN equals the batch
    * DAG's DOCS_CLEAN on the union corpus, the streamed pairs
    * (weighted by final state counts) equal the batch minhashPairs
    * over the gated union, and the streamed groups equal the batch
    * connected components. The frozen-quantizer scorer composes the
    * same way (a literal-codebook map-only expression —
    * StreamingQuantizerSpec) when the stream carries embeddings.
    *
    * Replay safety: same contract as [[deltaDedupStreamQuery]] — the
    * last-processed batch id commits atomically with the state swap;
    * every other write is an idempotent keyed merge. */
  def curationStreamQuery(spark: SparkSession, docs: DataFrame,
                          benchmark: DataFrame,
                          statePath: String, cleanPath: String,
                          pairsPath: String,
                          threshold: Double = 0.5,
                          trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import spark.implicits._
        val (state, last) = readKeeperState(spark, statePath)
        if (batchId > last) {
          val (stateBase, stateBands) = readBandState(spark, statePath)
          val gated = graft.models.CurationModels.gateDocs(batch.toDF())
            .localCheckpoint(false) // feeds pairing, keeper drop, and the fold
          val delta = graft.operators.Dedup.minhashPairsDeltaBanded(
            gated, state, stateBase, stateBands,
            "text", "doc_id", threshold = threshold)
          // EAGER cut: the pair relation is consumed twice (pairs merge
          // + the groups fold below) and its plan scans the companion
          // tables the merges in between REWRITE — a lazy re-execution
          // after the swap would read deleted part files
          val newPairs = delta.pairs
            .select(col("id1"), col("id2"), col("jaccard"))
            .localCheckpoint()
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, pairsPath, newPairs, Seq("id1", "id2"))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, s"${statePath}_base", delta.newBase, Seq("id"))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, s"${statePath}_bands", delta.newBands, Seq("id", "band"))
          // transitive groups: fold the batch's pairs into the evolving
          // labeling — the delta-CC graph is |labels| + |batch pairs|
          // edges, and changed labels replace their rows in the merge
          val oldLabels = readOrEmpty(spark, s"${pairsPath}_groups",
            Seq.empty[(Long, Long)].toDF("id", "group_id"))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, s"${pairsPath}_groups",
            graft.operators.Dedup.connectedComponentsDelta(
              oldLabels, newPairs.select(col("id1"), col("id2"))),
            Seq("id"))
          // the batch's NEW keepers (first-seen fingerprints), full
          // gated columns carried through, then per-doc decontamination
          val newKeeperIds = graft.operators.Dedup
            .fingerprintRepState(gated, "text", "doc_id")
            .join(state.select(col("fp")), Seq("fp"), "left_anti")
            .select(col("id").as("doc_id"))
          val newKeepers = gated.join(newKeeperIds, Seq("doc_id"))
          val contaminated = graft.operators.TextAnalysis.ngramOverlap(
            newKeepers, benchmark, "text", "doc_id", n = 5)
          val clean = newKeepers.join(
            contaminated.select(col("doc_id")), Seq("doc_id"), "left_anti")
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, cleanPath, clean, Seq("doc_id"))
          val newState = graft.operators.Dedup.mergeFingerprintRepState(
              state, gated, "text", "doc_id")
            .withColumn("last_batch", lit(batchId))
          graft.pipeline.Pipeline.mergeIntoParquet(
            spark, statePath, newState, Seq("fp"))
        }
        ()
      }
      .option("checkpointLocation", s"$statePath.__checkpoint")
      .trigger(trigger)
      .start()

  /** Current-weight view of the streamed pairs: join the state's copy
    * counts onto the stored (id1, id2, jaccard) relation — identical
    * columns and weights to the batch [[graft.operators.Dedup
    * .minhashPairs]] over everything streamed so far. */
  def weightedPairs(spark: SparkSession, statePath: String,
                    pairsPath: String): DataFrame = {
    val counts = spark.read.parquet(statePath).select(col("id"), col("n_copies"))
    spark.read.parquet(pairsPath)
      .join(counts.select(col("id").as("id1"), col("n_copies").as("nc1")), Seq("id1"))
      .join(counts.select(col("id").as("id2"), col("n_copies").as("nc2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("jaccard"),
        (col("nc1") * col("nc2")).as("weight"))
  }

  /** Stream-static enrichment — the third cell of the streaming join
    * matrix (stream-stream inner and left-outer live above): an
    * unbounded event stream joined to a warehouse DIMENSION path. The
    * static side is passed as a PATH, not a DataFrame, and read fresh
    * at query construction — under the repo's cron-tick operating model
    * (one AvailableNow drain per tick) every drain therefore resolves
    * the CURRENT dimension files: a dim rewritten between drains
    * enriches subsequent batches with the new rows, the slowly-
    * changing-dimension contract StreamingEnrichSpec pins. (Within one
    * long-lived query, re-resolution of a static file side is an engine
    * detail this operator does not promise.) Broadcast-sized dims make
    * this a map-only stage per batch; no watermark or state involved. */
  def enrichFromDim(spark: SparkSession, events: DataFrame, dimPath: String,
                    eventKey: String, dimKey: String): DataFrame =
    events.join(spark.read.parquet(dimPath),
      col(eventKey) === col(dimKey), "left_outer")

  /** Streaming count-min sketch maintenance: the d×w counter relation
    * ([[graft.operators.TextAnalysis.cmsSketch]]) kept as a warehouse
    * state table, folded per micro-batch by per-(r,bucket) ADDITION —
    * the CMS merge law, so after any append-ordered slicing the state
    * equals the batch sketch of the drained corpus (StreamingCmsSpec
    * pins it). The state is FIXED-SIZE (d×w rows) no matter how much
    * streams through — the sketch is the thing that makes "top tokens
    * over an unbounded crawl" a bounded-state streaming problem.
    *
    * Additive folds are not idempotent, so replays are skipped via the
    * same atomic last-batch-in-state-swap guard as
    * [[deltaDedupStreamQuery]]. */
  def cmsStreamQuery(spark: SparkSession, docs: DataFrame, textCol: String,
                     statePath: String, d: Int = 4, w: Int = 512,
                     trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        cmsFoldBatch(spark, batch.toDF(), batchId, textCol, statePath, d, w)
      }
      .option("checkpointLocation", s"$statePath.__checkpoint")
      .trigger(trigger)
      .start()

  /** The guarded per-batch CMS fold (exposed so the replay spec can
    * drive it with a stale batch id): skip unless batchId advances, add
    * the batch's partial sketch per (r, bucket), commit the batch id in
    * the same state swap. */
  private[graft] def cmsFoldBatch(spark: SparkSession, batch: DataFrame,
                                  batchId: Long, textCol: String,
                                  statePath: String, d: Int, w: Int): Unit = {
    import spark.implicits._
    val exists = graft.pipeline.Pipeline.pathExists(spark, statePath)
    val raw =
      if (exists) spark.read.parquet(statePath)
      else Seq.empty[(Int, Long, Long, Long)]
        .toDF("r", "bucket", "c", "last_batch")
    val last =
      if (!exists) -1L
      else raw.agg(coalesce(max(col("last_batch")), lit(-1L)))
        .head.getLong(0)
    // batchId == last is a genuine foreachBatch replay (restart before
    // the checkpoint committed) — skip silently, the fold is already in.
    // batchId < last means the CHECKPOINT was deleted/recreated while
    // the state table survived: batch ids restarted at 0 and every fold
    // would silently no-op forever. That is an operational error, not a
    // replay — fail loud so the operator resets state and checkpoint
    // together.
    if (batchId < last)
      throw new IllegalStateException(
        s"CMS state at $statePath has last_batch=$last but the stream " +
          s"delivered batchId=$batchId — the checkpoint was reset while " +
          "the state table survived; delete (or move) BOTH together " +
          "before restarting, or every batch is silently skipped")
    if (batchId > last) {
      val part = graft.operators.TextAnalysis
        .cmsSketch(batch, textCol, d, w)
      val merged = raw.select(col("r"), col("bucket"), col("c"))
        .unionByName(part)
        .groupBy("r", "bucket").agg(sum(col("c")).as("c"))
        .withColumn("last_batch", lit(batchId))
      graft.pipeline.Pipeline.mergeIntoParquet(
        spark, statePath, merged, Seq("r", "bucket"))
    }
  }

  /** Streaming DATA CARD maintenance: the t22 release datasheet as a
    * warehouse state table folded per micro-batch
    * ([[graft.operators.TextAnalysis.dataCardState]] — fingerprint-keyed
    * counter merges, so the RETROACTIVE dup flip of an earlier batch's
    * document falls out of the keying with no rescan). Same
    * atomic last-batch-in-state-swap replay guard as the CMS fold
    * (counter merges are not idempotent); read the card at any time
    * with `dataCardFromState(read(statePath).drop("last_batch"))`. */
  def dataCardStreamQuery(spark: SparkSession, docs: DataFrame,
                          textCol: String, langCol: String,
                          sourceCol: String, nCharsCol: String,
                          statePath: String,
                          trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        dataCardFoldBatch(spark, batch.toDF(), batchId, textCol, langCol,
          sourceCol, nCharsCol, statePath)
      }
      .option("checkpointLocation", s"$statePath.__checkpoint")
      .trigger(trigger)
      .start()

  /** The guarded per-batch data-card fold (exposed for the replay
    * spec). Guard semantics identical to [[cmsFoldBatch]]: equal batch
    * id = genuine replay, skip; lower = checkpoint reset over surviving
    * state, fail loud. */
  private[graft] def dataCardFoldBatch(spark: SparkSession, batch: DataFrame,
                                       batchId: Long, textCol: String,
                                       langCol: String, sourceCol: String,
                                       nCharsCol: String,
                                       statePath: String): Unit = {
    import spark.implicits._
    val exists = graft.pipeline.Pipeline.pathExists(spark, statePath)
    val raw =
      if (exists) spark.read.parquet(statePath)
      else Seq.empty[(String, String, String, Long, Long, Long, Long, Long)]
        .toDF("fp", "lang", "source", "n_docs", "n_tokens", "n_chars",
          "n_pii_docs", "last_batch")
    val last =
      if (!exists) -1L
      else raw.agg(coalesce(max(col("last_batch")), lit(-1L)))
        .head.getLong(0)
    if (batchId < last)
      throw new IllegalStateException(
        s"data-card state at $statePath has last_batch=$last but the " +
          s"stream delivered batchId=$batchId — the checkpoint was reset " +
          "while the state table survived; delete (or move) BOTH " +
          "together before restarting, or every batch is silently skipped")
    if (batchId > last) {
      val part = graft.operators.TextAnalysis
        .dataCardState(batch, textCol, langCol, sourceCol, nCharsCol)
      val merged = graft.operators.TextAnalysis
        .mergeDataCardState(raw.drop("last_batch"), part)
        .withColumn("last_batch", lit(batchId))
      graft.pipeline.Pipeline.mergeIntoParquet(
        spark, statePath, merged, Seq("fp", "lang", "source"))
    }
  }

  /** Stream-stream interval join — the attribution shape: each purchase
    * joined to the SAME user's clicks in the preceding `horizon`. Both
    * sides are watermarked and the time-range predicate is two-sided,
    * so Spark bounds the buffered join state on BOTH sides (clicks
    * evict once older than horizon + watermark past the purchase-side
    * watermark; purchases once past their own) — the state contract
    * that keeps an unbounded self-join runnable forever. An INNER join
    * emits a match as soon as both rows are buffered; the watermark
    * only governs eviction, so an AvailableNow drain emits every
    * in-horizon pair — the spec pins drain == the batch interval join
    * (q39's shape) on the same input.
    *
    * Self-join note: both inputs are filters of ONE file-source stream;
    * Spark plans them as two scans of the same source with independent
    * state stores — no second landing of the data is needed. */
  def attributionJoin(events: DataFrame, horizon: String = "10 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("amount"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("amount"))
  }

  /** The LEFT OUTER attribution join: every purchase emitted, matched
    * to preceding clicks where they exist, null-padded otherwise — the
    * "conversions without a click" report. Same state bounds as
    * [[attributionJoin]]; the semantic difference is WHEN the null row
    * can be emitted: only once the purchase-side watermark has passed
    * the end of its join window (before that a matching click could
    * still arrive), so purchases inside the final watermark window are
    * withheld by an AvailableNow drain — the spec pins exactly that
    * boundary with a watermark-advancing sentinel.
    *
    * Two operational facts the spec encodes (both bite real users): the
    * GLOBAL watermark is the MIN over both sides' event-time columns —
    * advancing only the click side never closes anything — and a batch
    * runs under the watermark persisted by the PREVIOUS batch (and an
    * empty backlog runs no batch), so null rows surface one data-drop
    * after the sentinel that closed their window. */
  def attributionJoinOuter(events: DataFrame, horizon: String = "10 minutes",
                           watermark: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
        col("c_user_id") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("amount"))
  }

  /** Drain-everything-now runner (the cron-tick semantics): starts the
    * query with Trigger.AvailableNow on a memory sink and blocks until
    * the backlog is processed. Returns the sink contents. */
  def runAvailableNow(spark: SparkSession, out: DataFrame,
                      queryName: String, outputMode: String = "append"): DataFrame = {
    val q = out.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
