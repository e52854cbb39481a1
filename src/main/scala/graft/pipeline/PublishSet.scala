package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE ATOMIC PUBLISH — a manifest-of-manifests registry
  * (VERDICT r13 next-#4): a curation run commits DOCS_*, the data
  * card, and the RAG index as SEPARATE [[VersionedTable]] versions, so
  * a reader between those commits could assemble a TORN cross-table
  * state (yesterday's card over today's index). This registry closes
  * the gap the way Iceberg's catalog-level transactions and Delta's
  * multi-table commit coordinators do, re-expressed minimally on the
  * primitives the manifest layer already has:
  *
  *  - A registry ROOT is itself a versioned object: `_manifests/v<N>`
  *    + `_current` pointer cache, committed through the SAME atomic
  *    put-if-absent CAS as table manifests
  *    ([[VersionedTable.commitText]] — one linearization-point
  *    implementation, two manifest grammars).
  *  - A registry version's manifest is a RELEASE SET: one
  *    `<version> <url-encoded table root>` line per member table.
  *  - [[resolve]] reads ONE registry manifest into an immutable
  *    (table → version) map; member manifests are immutable, so every
  *    read through the map is a consistent cross-table snapshot BY
  *    CONSTRUCTION — there is no instant at which a reader can
  *    observe member A's new version with member B's old one, because
  *    the pair only ever travels inside one atomically-created file.
  *  - [[rollback]] republishes a prior release set as a NEW registry
  *    version — the whole set restores in one commit, and the bad
  *    release stays inspectable in history.
  *
  * Publishing discipline: commit the member tables first (each
  * table's own optimistic CAS), then [[publish]] the set naming the
  * exact versions the run produced. The window between member commits
  * is invisible to registry readers — they keep resolving the previous
  * release until the ONE registry CAS lands. A gate (e.g.
  * [[graft.models.CurationModels.ragRecallGate]]) therefore runs
  * BETWEEN member commits and [[publish]]: a failed gate simply never
  * publishes, and registry readers never saw the bad candidate.
  *
  * Retention coupling: [[publish]] validates every named member
  * manifest exists at publish time, and member-table prune `retain`
  * must be sized >= the registry's retention window — a reader of a
  * RETAINED release whose member version was pruned underneath is the
  * same out-of-contract reader as [[VersionedTable.prune]]'s
  * (readTable throws the member layer's not-retained error, loudly).
  *
  * At 100 TB this is metadata-only machinery: a release set is
  * |tables| lines; publish cost is one small-file CAS regardless of
  * data volume.
  */
object PublishSet {

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Commit `set` (table root → member version) as the next registry
    * version. Validates each named member manifest exists. Optimistic:
    * retries the registry CAS like any table mutator. Returns the
    * committed registry version.
    *
    * `note` is an optional free-text annotation stored WITH the release
    * (a `#`-prefixed first line, url-encoded) — the streaming publish
    * tick stamps its epoch id here so a restarted stream can see which
    * epoch last released ([[note]]); readers of the set itself ignore
    * it. */
  def publish(spark: SparkSession, registryRoot: String,
              set: Map[String, Long], note: Option[String] = None): Long =
      VersionedTable.withRootLock(registryRoot) {
    require(set.nonEmpty, "a release set must name at least one table")
    set.foreach { case (table, v) =>
      require(VersionedTable.manifestExists(spark, table, v),
        s"release set names $table version $v, which is not a committed " +
          "retained version - publish AFTER the member commits, and size " +
          "member retention to cover registry retention")
    }
    val content = (note.map(n => s"#${enc(n)}").toSeq ++
      set.toSeq.sortBy(_._1)
        .map { case (table, v) => s"$v ${enc(table)}" }).mkString("\n")
    VersionedTable.withCommitRetries(registryRoot, "publish") { () =>
      val v = VersionedTable.currentVersion(spark, registryRoot)
        .getOrElse(0L) + 1
      VersionedTable.commitText(spark, registryRoot, v, content)
      v
    }
  }

  /** The annotation `publish` stored with release `v`, if any. */
  def note(spark: SparkSession, registryRoot: String, v: Long)
      : Option[String] =
    VersionedTable.manifestLines(spark, registryRoot, v)
      .find(_.startsWith("#")).map(l => dec(l.substring(1)))

  /** Snapshot each table's CURRENT version and publish that as the
    * release set. The snapshot is taken table by table, so call this
    * from the single orchestrator AFTER the run's member commits — the
    * atomicity guarantee is for READERS (one registry manifest), not
    * for publishers racing member writers. */
  def publishCurrent(spark: SparkSession, registryRoot: String,
                     tables: Seq[String]): Long = {
    require(tables.nonEmpty, "a release set must name at least one table")
    publish(spark, registryRoot, tables.map { t =>
      t -> VersionedTable.currentVersion(spark, t).getOrElse(
        throw new IllegalArgumentException(
          s"publishCurrent: no versioned table at $t"))
    }.toMap)
  }

  /** The current release (table root → member version) — ONE manifest
    * read; the returned map is the whole atomic snapshot. */
  def resolve(spark: SparkSession, registryRoot: String): Map[String, Long] =
    resolveVersion(spark, registryRoot,
      currentVersion(spark, registryRoot).getOrElse(
        throw new IllegalArgumentException(
          s"no release registry at $registryRoot")))

  /** Time travel: a specific retained release set. `#` lines are
    * annotations ([[note]]), not members. */
  def resolveVersion(spark: SparkSession, registryRoot: String,
                     v: Long): Map[String, Long] =
    VersionedTable.manifestLines(spark, registryRoot, v)
      .filterNot(_.startsWith("#")).map { line =>
      val i = line.indexOf(' ')
      require(i > 0, s"malformed release line '$line' in $registryRoot v$v")
      dec(line.substring(i + 1)) -> line.substring(0, i).toLong
    }.toMap

  /** Committed release version, pointer healed exactly like a table's
    * ([[VersionedTable.currentVersion]] only touches the shared
    * pointer/manifest layout). */
  def currentVersion(spark: SparkSession, registryRoot: String): Option[Long] =
    VersionedTable.currentVersion(spark, registryRoot)

  /** All retained release versions, ascending. */
  def versions(spark: SparkSession, registryRoot: String): Seq[Long] =
    VersionedTable.versions(spark, registryRoot)

  /** Read member `table` AT the current release's pinned version —
    * never the member's own (possibly further-advanced) current. */
  def readTable(spark: SparkSession, registryRoot: String,
                table: String): DataFrame = {
    val set = resolve(spark, registryRoot)
    val v = set.getOrElse(table, throw new IllegalArgumentException(
      s"$table is not in the current release of $registryRoot " +
        s"(members: ${set.keys.toSeq.sorted.mkString(", ")})"))
    VersionedTable.readVersion(spark, table, v)
  }

  /** Restore release `to`'s ENTIRE set as a new registry version — the
    * one-commit cross-table rollback. */
  def rollback(spark: SparkSession, registryRoot: String, to: Long): Long =
    publish(spark, registryRoot, resolveVersion(spark, registryRoot, to),
      Some(s"rollback to v$to"))

  /** Bound registry retention: keep the newest `keep` release
    * manifests. Registry versions are metadata-only (no data dirs), so
    * this is a manifest sweep; member-table retention is each table's
    * own [[VersionedTable.prune]] and must be sized to cover this. */
  def prune(spark: SparkSession, registryRoot: String, keep: Int = 5): Unit =
      VersionedTable.withRootLock(registryRoot) {
    require(keep >= 1, "must retain at least the current release")
    val f = VersionedTable.fsFor(spark, registryRoot)
    val vs = versions(spark, registryRoot)
    vs.dropRight(keep).foreach { v =>
      f.delete(VersionedTable.hp(
        VersionedTable.manifestPath(registryRoot, v)), false)
    }
  }

  /** RETENTION-COUPLED MEMBER GC — the coupling contract ("size member
    * retention to cover registry retention") automated instead of
    * hand-sized: prune every table the RETAINED releases reference,
    * deriving each table's retention floor from the oldest version any
    * retained release still pins. Run it on the maintenance cadence
    * AFTER [[prune]] has bounded the registry — the expired releases'
    * exclusive versions become prunable exactly then.
    *
    * Per member table: floor = min over retained releases of the
    * pinned version; the table keeps everything >= floor (plus its own
    * newest `memberKeep`, whichever window is larger) via
    * [[VersionedTable.prune]]'s `alsoRetainFrom` — the >=-floor count
    * is re-derived inside the member's prune lock, so a commit racing
    * this sweep only widens retention, never evicts a pinned version.
    * Tables no retained release references are NOT touched (an
    * unreferenced table is outside the registry's contract — prune it
    * under its own policy), and a referenced root with no versioned
    * table is a loud error, never a skip.
    *
    * Returns (table root → retention floor) for observability — the
    * release-reader contract after the sweep is: every
    * [[resolveVersion]] of a retained release reads every member
    * through [[VersionedTable.readVersion]] successfully.
    *
    * Serialization: holds the REGISTRY root lock for the whole sweep,
    * so a same-JVM [[publish]]/[[rollback]] (which validates member
    * manifests under the same lock) can never interleave between this
    * sweep's floor derivation and a member deletion. ACROSS processes
    * the ordering contract is operational, same as every snapshot
    * store's GC-vs-pinning-committer caveat (Iceberg's expire_snapshots
    * has the identical window): a publisher naming OLD member versions
    * must not race the maintenance cadence — publish validates
    * manifest existence, and a GC between that check and the registry
    * CAS makes the new release unreadable (loudly, at read time).
    *
    * At 100 TB: the derivation is |releases|·|tables| manifest lines;
    * the data work is each member's own prune (expired-file deletes). */
  /** DRY RUN of [[pruneMembers]]: (table root → member versions the
    * sweep WOULD expire) under the same retention-floor derivation,
    * deleting nothing — the report an operator reads before enabling
    * the GC fleet-wide. Tables with nothing to expire map to empty;
    * the plan reasons over COMMITTED versions only (the classification
    * the sweep uses — counting orphaned manifests beyond a heal gap
    * would misstate what the sweep retains), and it fails as loudly as
    * the sweep does on a pinned root with no versioned table — the
    * exact failure a dry run exists to predict. */
  def pruneMembersPlan(spark: SparkSession, registryRoot: String,
                       memberKeep: Int = 1): Map[String, Seq[Long]] =
      VersionedTable.withRootLock(registryRoot) {
    require(memberKeep >= 1, "must retain at least each member's current")
    val vs = versions(spark, registryRoot)
    require(vs.nonEmpty, s"no release registry at $registryRoot")
    vs.flatMap(v => resolveVersion(spark, registryRoot, v).toSeq)
      .groupMapReduce(_._1)(_._2)(math.min)
      .map { case (table, floor) =>
        require(VersionedTable.currentVersion(spark, table).nonEmpty,
          s"retained releases of $registryRoot pin $table, but no " +
            "versioned table exists there")
        val mvs = VersionedTable.committedVersions(spark, table)
        val keepN = math.max(memberKeep, mvs.count(_ >= floor))
        table -> mvs.dropRight(keepN)
      }
  }

  def pruneMembers(spark: SparkSession, registryRoot: String,
                   memberKeep: Int = 1,
                   staleAfterMs: Long = 3600 * 1000L): Map[String, Long] =
      VersionedTable.withRootLock(registryRoot) {
    require(memberKeep >= 1, "must retain at least each member's current")
    val vs = versions(spark, registryRoot)
    require(vs.nonEmpty, s"no release registry at $registryRoot")
    val floors: Map[String, Long] = vs
      .flatMap(v => resolveVersion(spark, registryRoot, v).toSeq)
      .groupMapReduce(_._1)(_._2)(math.min)
    floors.foreach { case (table, floor) =>
      require(VersionedTable.currentVersion(spark, table).nonEmpty,
        s"retained releases of $registryRoot pin $table, but no " +
          "versioned table exists there")
      VersionedTable.prune(spark, table, keep = memberKeep,
        staleAfterMs = staleAfterMs, alsoRetainFrom = Some(floor))
    }
    floors
  }
}
