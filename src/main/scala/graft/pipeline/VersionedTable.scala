package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet tables — the storage capability the
  * warehouse layer was missing (VERDICT r11 "what's missing" #3 /
  * next-#6): [[Pipeline]]'s swap discipline makes single-writer
  * updates crash-safe, but a READER concurrent with a swap races the
  * renames, and there is no way to read yesterday's state. This module
  * adds the minimal manifest layer that fixes both, the way the real
  * table formats do it (file-level manifests; Iceberg/Delta's core
  * idea, re-expressed minimally):
  *
  * Layout under `root/`:
  *   - `data/b<N>/…` immutable data files, written once by version N,
  *     NEVER mutated or renamed afterwards; partition layouts live
  *     inside the batch dir as `__pp_<col>=<value>/` dirs (the
  *     partition column is DUPLICATED into the dir key, so the data
  *     files keep every column and explicit-file reads need no
  *     directory inference — probed: basePath inference conflicts on
  *     batch dirs, plain file-list reads don't).
  *   - `_manifests/v<N>` one relative file path per line: THE version.
  *     A new version's manifest REFERENCES unchanged files of the old
  *     version — maintenance cost stays O(affected partitions), never
  *     O(table).
  *   - `_current` the pointer file, containing just `N`; updated by an
  *     atomic rename (write `_current.tmp`, rename over) — the commit
  *     point. Everything before the rename is invisible to readers;
  *     a crash anywhere leaves the previous version intact and the
  *     next write heals by overwriting the orphan batch/manifest.
  *
  * Readers ([[read]]/[[readVersion]]) resolve the pointer ONCE, to a
  * concrete immutable file list: a concurrent writer commits new
  * versions without touching those files, so a mid-scan reader sees
  * exactly one consistent version — the spec pins a reader resolved
  * before a swap collecting the OLD version's rows after the swap
  * lands. Time travel is [[readVersion]](n) over retained manifests.
  * [[prune]] bounds retention (keep the last K versions; files
  * referenced only by pruned manifests are deleted) — a reader slower
  * than K successive rewrites of its table is out of contract, exactly
  * Iceberg's `expire_snapshots` semantics.
  *
  * All paths go through the Hadoop FileSystem (hdfs://, s3a://,
  * file://). Single-writer per table (the Registry's scheduler
  * contract); multi-writer coordination is a lock service's job, not
  * this layer's.
  */
object VersionedTable {

  private def fsFor(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private def pointerPath(root: String) = s"$root/_current"
  private def manifestPath(root: String, v: Long) = s"$root/_manifests/v$v"
  private def dataRoot(root: String) = s"$root/data"

  // per-root writer serialization WITHIN this JVM: two concurrent
  // writers would stage the same b<v> batch dir and trash each other's
  // files before either commits. Cross-PROCESS writers remain a
  // declared single-writer contract, with best-effort detection: the
  // commit re-reads the pointer and refuses when another writer
  // advanced it after this op planned its version.
  private val rootLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def withRootLock[T](root: String)(body: => T): T =
    rootLocks.getOrElseUpdate(root, new Object).synchronized(body)

  private def readSmallFile(f: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def writeSmallFile(f: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path,
                             content: String): Unit = {
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** The committed version, if the table exists. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fsFor(spark, root)
    val p = hp(pointerPath(root))
    if (f.exists(p)) Some(readSmallFile(f, p).trim.toLong) else None
  }

  /** All retained (readable) versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fsFor(spark, root)
    val md = hp(s"$root/_manifests")
    if (!f.exists(md)) Nil
    else f.listStatus(md).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted.toSeq
  }

  /** A parsed manifest: the file list plus the version's RECORDED
    * union schema (first line `#schema=<json>`). Recording the schema
    * at commit time makes every read O(1) in metadata — no
    * footer-sampling, no distributed mergeSchema job over all files —
    * and makes ANY file subset (partition-scoped rewrites,
    * readPartitions) read with the same deterministic schema even when
    * the version mixes pre- and post-evolution batches. Manifests
    * written before the schema line existed read via the mergeSchema
    * fallback. */
  private case class Manifest(files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType])

  private def manifest(spark: SparkSession, root: String, v: Long): Manifest = {
    val f = fsFor(spark, root)
    val p = hp(manifestPath(root, v))
    require(f.exists(p), s"version $v of $root is not retained (pruned?)")
    val lines = readSmallFile(f, p).split("\n").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val (schemaLines, files) = lines.partition(_.startsWith("#schema="))
    val schema = schemaLines.headOption.map(l =>
      org.apache.spark.sql.types.DataType.fromJson(
        l.stripPrefix("#schema=")).asInstanceOf[org.apache.spark.sql.types.StructType])
    Manifest(files, schema)
  }

  // read a concrete file list under a version's recorded schema: one
  // consistent result for ANY subset of the version's files
  private def readFiles(spark: SparkSession, root: String,
                        m: Manifest, files: Seq[String]): DataFrame =
    m.schema match {
      case Some(sc) if files.isEmpty =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
      case Some(sc) =>
        spark.read.schema(sc)
          .parquet(files.map(f => s"${dataRoot(root)}/$f"): _*)
      case None => // legacy manifest: deterministic union via mergeSchema
        spark.read.option("mergeSchema", "true")
          .parquet(files.map(f => s"${dataRoot(root)}/$f"): _*)
    }

  /** Read the CURRENT version. The pointer is resolved here, once: the
    * returned DataFrame is bound to version-immutable files and stays
    * consistent across any number of concurrent commits. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no versioned table at $root")))

  /** Time travel: read a specific retained version. Explicit file
    * list, NO basePath (files carry every column — the __pp_* dirs are
    * a pruning index, not a schema source), under the manifest's
    * recorded union schema: deterministic across mixed-evolution
    * batches, pre-evolution rows read as NULL, zero footer-sampling. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val m = manifest(spark, root, v)
    readFiles(spark, root, m, m.files)
  }

  /** Manifest-level partition pruning: read only the files of the
    * current version whose `__pp_<col>=` dir key is in `values` —
    * the scan-side payoff of the duplicated partition key. */
  def readPartitions(spark: SparkSession, root: String, col: String,
                     values: Seq[Any]): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no versioned table at $root"))
    val m = manifest(spark, root, v)
    // same loud contract as merge/deleteKeys (ADVICE r12): a column not
    // in the stored layout, a NULL, or a type whose rendering diverges
    // from Spark's partition paths would silently match zero files and
    // return an empty frame — throw instead
    require(m.files.isEmpty || layoutOf(m.files).contains(col),
      s"readPartitions: '$col' is not a partition column of $root " +
        s"(stored layout ${layoutOf(m.files).mkString("[", ",", "]")})")
    val keys = values.map(x => partitionKey(col, x))
    readFiles(spark, root, m,
      m.files.filter(f => keys.exists(k => f.contains("/" + k))))
  }

  // relative paths of every parquet file under a batch dir
  private def listRelative(f: org.apache.hadoop.fs.FileSystem,
                           root: String, batch: String): Seq[String] = {
    val base = hp(s"${dataRoot(root)}/$batch")
    def rec(p: org.apache.hadoop.fs.Path): Seq[String] =
      f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) rec(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet"))
          Seq(st.getPath.toString.stripPrefix(
            f.makeQualified(hp(dataRoot(root))).toString).stripPrefix("/"))
        else Nil
      }
    rec(f.makeQualified(base))
  }

  // stage a DataFrame as version v's batch dir, return its files
  private def stageBatch(spark: SparkSession, root: String, v: Long,
                         df: DataFrame, partitionBy: Seq[String]): Seq[String] = {
    val f = fsFor(spark, root)
    val dir = s"${dataRoot(root)}/b$v"
    f.delete(hp(dir), true) // heal a crashed attempt at this version
    if (partitionBy.isEmpty) df.write.parquet(dir)
    else {
      // duplicate the partition cols into __pp_* dir keys so the data
      // files RETAIN every column (explicit-file reads skip inference)
      val dup = partitionBy.foldLeft(df)((d, c) =>
        d.withColumn(s"__pp_$c", col(c)))
      dup.write.partitionBy(partitionBy.map(c => s"__pp_$c"): _*).parquet(dir)
    }
    listRelative(f, root, s"b$v")
  }

  // the COMMIT: manifest first, then the pointer via an ATOMIC
  // overwrite rename (FileContext + Rename.OVERWRITE — POSIX/HDFS
  // atomic; a delete-then-rename would open exactly the transient-miss
  // window this layer exists to remove, and a crash between the two
  // would orphan the whole table)
  private def commit(spark: SparkSession, root: String, v: Long,
                     files: Seq[String],
                     schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    // best-effort cross-process conflict detection: another writer
    // advancing the pointer after this op planned its version means
    // the staged batch raced a foreign commit — refuse rather than
    // overwrite its manifest
    val now = currentVersion(spark, root).getOrElse(0L)
    require(now == v - 1,
      s"concurrent writer detected on $root: planned version $v but " +
        s"current is $now — versioned tables are single-writer per table")
    val f = fsFor(spark, root)
    writeSmallFile(f, hp(manifestPath(root, v)),
      (schema.map(sc => s"#schema=${sc.json}").toSeq ++ files).mkString("\n"))
    val tmp = hp(pointerPath(root) + ".tmp")
    writeSmallFile(f, tmp, v.toString)
    val dst = f.makeQualified(hp(pointerPath(root)))
    if (dst.toUri.getScheme == "file") {
      // Hadoop's local OVERWRITE rename is itself delete-then-rename
      // (spec-caught: ~5k pointer misses under a read hammer); POSIX
      // rename(2) via nio IS atomic
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.makeQualified(tmp).toUri),
        java.nio.file.Paths.get(dst.toUri),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      // HDFS: Options.Rename.OVERWRITE is atomic by the FS contract
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(fc.makeQualified(tmp), fc.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    ()
  }

  /** Partition-dir key of one value, rendered EXACTLY as the staged
    * write renders it. Restricted to types whose toString matches
    * Spark's partition-path encoding (strings, integrals, boolean,
    * date); timestamps (Spark renders `2020-01-01 00%3A00%3A00`, JDBC
    * toString appends `.0`) and NULLs (`__HIVE_DEFAULT_PARTITION__`)
    * would silently match NOTHING in the manifest — old rows would
    * survive a merge as duplicate keys — so they fail loudly here. */
  private def partitionKey(c: String, x: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    require(x != null,
      s"null partition value for '$c': the versioned layer cannot match " +
        "Spark's __HIVE_DEFAULT_PARTITION__ rendering — filter NULL " +
        "partition keys upstream or use a sentinel value")
    x match {
      case _: String | _: java.lang.Long | _: java.lang.Integer |
           _: java.lang.Short | _: java.lang.Byte | _: java.lang.Boolean |
           _: java.sql.Date | _: java.time.LocalDate =>
        s"__pp_$c=${escapePathName(String.valueOf(x))}/"
      case other => throw new IllegalArgumentException(
        s"unsupported partition-column type ${other.getClass.getName} for " +
          s"'$c': only string/integral/boolean/date render identically to " +
          "Spark's partition paths (timestamps and fractionals do not — " +
          "partition on a derived date/string column instead)")
    }
  }

  // the __pp_* layout recorded in a manifest (ordered), Nil when the
  // manifest is unpartitioned or empty
  private def layoutOf(files: Seq[String]): Seq[String] =
    files.headOption.toSeq.flatMap(_.split("/").toSeq
      .filter(_.startsWith("__pp_")).map(_.split("=")(0).stripPrefix("__pp_")))

  // partition-scoped ops silently match nothing if the stored layout
  // differs from the caller's partitionBy — fail loudly instead
  private def requireLayout(files: Seq[String], partitionBy: Seq[String],
                            what: String): Unit = {
    val stored = layoutOf(files)
    require(files.isEmpty || stored == partitionBy,
      s"$what: stored layout ${stored.mkString("[", ",", "]")} != " +
        s"requested ${partitionBy.mkString("[", ",", "]")} — a mismatched " +
        "partition-scoped rewrite would keep stale rows silently")
  }

  // distinct partition-dir keys of a (bounded) key relation — the
  // affected set a partition-scoped rewrite touches
  private def affectedPartitionKeys(df: DataFrame,
                                    partitionBy: Seq[String]): Set[String] =
    df.select(partitionBy.map(df(_)): _*).distinct().collect().map { r =>
      partitionBy.zipWithIndex.map { case (c, i) =>
        partitionKey(c, r.get(i))
      }.mkString
    }.toSet

  /** Evolution union: prior columns in order, new columns appended;
    * a type CHANGE for an existing column is refused (the versioned
    * layer null-pads, it does not cast history). All fields read as
    * nullable — pre-evolution files lack the new columns. */
  private def unionSchema(prior: org.apache.spark.sql.types.StructType,
                          next: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.StructType
    prior.fields.foreach { f =>
      next.fields.find(_.name == f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"schema evolution cannot change the type of '${f.name}': " +
            s"${f.dataType.simpleString} -> ${g.dataType.simpleString}")
      }
    }
    val priorNames = prior.fieldNames.toSet
    StructType((prior.fields ++
      next.fields.filterNot(f => priorNames.contains(f.name)))
      .map(_.copy(nullable = true)))
  }

  /** Write a full new version (CTAS / overwrite semantics). Returns the
    * committed version number. */
  def write(spark: SparkSession, root: String, df: DataFrame,
            partitionBy: Seq[String] = Nil): Long = withRootLock(root) {
    val v = currentVersion(spark, root).getOrElse(0L) + 1
    commit(spark, root, v, stageBatch(spark, root, v, df, partitionBy),
      Some(df.schema))
    v
  }

  /** Delete+insert merge by key (the [[Pipeline.mergeIntoParquet]]
    * semantics, versioned): when the table is partitioned and the
    * partition columns are a subset of the key, the new version reuses
    * every file outside the increment's partitions — O(affected
    * partitions), the property that keeps per-batch upserts viable on
    * a 100 TB relation. Otherwise the merged relation is staged in
    * full. Either way, readers of older versions are untouched. */
  def merge(spark: SparkSession, root: String, increment: DataFrame,
            uniqueKey: Seq[String], partitionBy: Seq[String] = Nil): Long =
      withRootLock(root) {
    require(uniqueKey.nonEmpty, "merge needs a key")
    currentVersion(spark, root) match {
      case None => write(spark, root, increment, partitionBy)
      case Some(cur) =>
        val v = cur + 1
        val cm = manifest(spark, root, cur) // one read per op
        val existing = readFiles(spark, root, cm, cm.files)
        val newSchema = unionSchema(existing.schema, increment.schema)
        val partitionScoped =
          partitionBy.nonEmpty && partitionBy.forall(uniqueKey.contains)
        if (!partitionScoped) {
          val keySet = increment.select(uniqueKey.map(increment(_)): _*)
            .distinct()
          val merged = existing.join(broadcast(keySet), uniqueKey, "left_anti")
            .unionByName(increment, allowMissingColumns = true)
          commit(spark, root, v,
            stageBatch(spark, root, v, merged, partitionBy), Some(newSchema))
        } else {
          requireLayout(cm.files, partitionBy, "merge")
          // affected partition dirs, from the increment (bounded)
          val parts = affectedPartitionKeys(increment, partitionBy)
          def affected(rel: String) = parts.exists(p => rel.contains("/" + p))
          val keep = cm.files.filterNot(affected)
          // rewrite ONLY the affected partitions: their old rows minus
          // keyed hits, plus the increment — read under the version's
          // recorded schema, so a subset mixing pre-/post-evolution
          // files can never sample the wrong footer and drop a column
          val affectedFiles = cm.files.filter(affected)
          val oldAffected =
            if (affectedFiles.isEmpty) None
            else Some(readFiles(spark, root, cm, affectedFiles))
          val keySet = increment.select(uniqueKey.map(increment(_)): _*)
            .distinct()
          val rewritten = oldAffected match {
            case None => increment
            case Some(oa) =>
              oa.join(broadcast(keySet), uniqueKey, "left_anti")
                // allowMissingColumns: an increment ADDING a column is
                // the schema-evolution path — survivors null-pad under
                // the recorded union schema
                .unionByName(increment, allowMissingColumns = true)
          }
          val fresh = stageBatch(spark, root, v, rewritten, partitionBy)
          commit(spark, root, v, keep ++ fresh, Some(newSchema))
        }
        v
    }
  }

  /** Physical deletion by key, versioned ([[Pipeline.deleteKeys]]'s
    * semantics): rewrites only the files holding hit partitions when
    * partitioned-by-key, the whole relation otherwise; older versions
    * retain the deleted rows until pruned (the time-travel window IS
    * the recovery window). Returns the new version, or the current one
    * unchanged when nothing matched. */
  def deleteKeys(spark: SparkSession, root: String, keys: DataFrame,
                 keyCols: Seq[String], partitionBy: Seq[String] = Nil): Long =
      withRootLock(root) {
    require(keyCols.nonEmpty, "deleteKeys needs at least one key column")
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no versioned table at $root"))
    val cm = manifest(spark, root, cur) // one read per op
    val existing = readFiles(spark, root, cm, cm.files)
    val keySet = keys.select(keyCols.map(keys(_)): _*).distinct()
      .localCheckpoint(false)
    if (existing.join(broadcast(keySet), keyCols, "left_semi").isEmpty)
      return cur
    val v = cur + 1
    // deletion never changes the schema
    val schema = Some(existing.schema)
    val partitionScoped =
      partitionBy.nonEmpty && partitionBy.forall(keyCols.contains)
    if (!partitionScoped) {
      val kept = existing.join(broadcast(keySet), keyCols, "left_anti")
      commit(spark, root, v, stageBatch(spark, root, v, kept, partitionBy),
        schema)
    } else {
      requireLayout(cm.files, partitionBy, "deleteKeys")
      val parts = affectedPartitionKeys(keySet, partitionBy)
      def affected(rel: String) = parts.exists(p => rel.contains("/" + p))
      val keep = cm.files.filterNot(affected)
      // recorded-schema read: a mixed-evolution affected subset can
      // never sample the wrong footer and drop a column
      val rewritten = readFiles(spark, root, cm, cm.files.filter(affected))
        .join(broadcast(keySet), keyCols, "left_anti")
      val fresh = stageBatch(spark, root, v, rewritten, partitionBy)
      commit(spark, root, v, keep ++ fresh, schema)
    }
    v
  }

  /** Small-file compaction, versioned ([[Pipeline.compact]]'s
    * semantics): stage the current content as one new coalesced batch,
    * commit as a new version. Readers of the old version keep their
    * old (fragmented) files until pruned. */
  def compact(spark: SparkSession, root: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long =
      withRootLock(root) {
    require(targetFileBytes >= 1024 * 1024, s"target too small: $targetFileBytes")
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no versioned table at $root"))
    val f = fsFor(spark, root)
    val cm = manifest(spark, root, cur)
    // PRESERVE the stored layout: compacting a partitioned table into
    // an unpartitioned batch would silently disable every subsequent
    // partition-scoped merge/deleteKeys/readPartitions
    val partitionBy = layoutOf(cm.files)
    val bytes = cm.files
      .map(rel => f.getFileStatus(hp(s"${dataRoot(root)}/$rel")).getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val v = cur + 1
    val content = readFiles(spark, root, cm, cm.files)
    commit(spark, root, v, stageBatch(spark, root, v,
      content.coalesce(n), partitionBy), Some(content.schema))
    v
  }

  /** ROLLBACK: commit a NEW version whose content is retained version
    * `to` — one manifest write referencing `to`'s files verbatim, no
    * data movement (the release-gate undo: a card diff flags a bad
    * publish, rollback restores the previous datasheet's corpus while
    * the bad version stays inspectable in history). Returns the new
    * version number. */
  def rollback(spark: SparkSession, root: String, to: Long): Long =
      withRootLock(root) {
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no versioned table at $root"))
    require(to <= cur, s"cannot roll back to unborn version $to (current $cur)")
    val v = cur + 1
    val m = manifest(spark, root, to)
    commit(spark, root, v, m.files, m.schema)
    v
  }

  /** Expire old snapshots: retain the newest `keep` versions' manifests
    * and delete every data file referenced ONLY by expired ones. The
    * bounded-retention contract every snapshot store has — run it on
    * the maintenance cadence, sized to the longest reader. */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Unit =
      withRootLock(root) {
    require(keep >= 1, "must retain at least the current version")
    val f = fsFor(spark, root)
    // anchor on the COMMITTED pointer, not the manifest listing: a
    // crash between manifest write and pointer rename leaves an orphan
    // manifest NEWER than the pointer, and a listing-anchored prune
    // would retain the orphan while expiring the committed current
    // version — deleting live data
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no versioned table at $root"))
    val vs = versions(spark, root)
    val (committed, orphans) = vs.partition(_ <= cur)
    val retained = committed.takeRight(keep) // always includes cur
    val expired = committed.dropRight(keep)
    if (expired.isEmpty && orphans.isEmpty) return
    val live: Set[String] =
      retained.flatMap(v => manifest(spark, root, v).files).toSet
    (expired ++ orphans).foreach { v =>
      manifest(spark, root, v).files.filterNot(live).foreach { rel =>
        f.delete(hp(s"${dataRoot(root)}/$rel"), false)
      }
      f.delete(hp(manifestPath(root, v)), false)
    }
    // drop batch dirs emptied by the file deletes
    val dr = hp(dataRoot(root))
    if (f.exists(dr)) f.listStatus(dr).foreach { st =>
      if (st.isDirectory && !f.listFiles(st.getPath, true).hasNext)
        f.delete(st.getPath, true)
    }
  }
}
