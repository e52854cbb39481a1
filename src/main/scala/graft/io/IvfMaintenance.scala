package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-index maintenance on the cell-partitioned IVF layout — the
  * production serving loop ([[graft.operators.Similarity]] builds and
  * searches; this module keeps the stored index CURRENT without
  * retraining or rebuilding):
  *
  *  - [[build]]/[[upsert]]: vectors are assigned MAP-ONLY against the
  *    frozen coarse codebook (the literal-codebook compiled pass — no
  *    shuffle beyond the partitioned write) and land in their cell's
  *    directory; an upsert touches only the cell dirs its batch maps
  *    to. No retrain: the e18 recall report is the gate that tells you
  *    WHEN the frozen quantizer has drifted enough to refit.
  *  - [[delete]]: tombstones appended to an underscore-prefixed side
  *    table (invisible to the index scan by parquet discovery rules) —
  *    a delete is O(ids), never a rewrite.
  *  - [[serving]]: index minus tombstones (one anti-join against the
  *    small tombstone relation); probe queries still prune non-probed
  *    cells at the SCAN (IvfStorageSpec's partition-pruning pin).
  *  - [[compact]]: folds tombstones in by rewriting ONLY the cells
  *    that contain deleted ids (dynamic partition overwrite — the
  *    same affected-partitions-only contract as
  *    [[graft.pipeline.Pipeline.deleteKeys]], here scoped by the
  *    index's own cell layout), then clears the tombstone table.
  *
  * At 100 TB: upsert cost tracks the batch, delete cost the id list,
  * compact cost the affected cells' bytes — never the index size.
  */
object IvfMaintenance {

  private def tombDir(dir: String) = s"$dir/_graft_tombstones"

  private def assign(vecs: DataFrame, vecCol: String, idCol: String,
                     codebook: Seq[Seq[Double]]): DataFrame =
    graft.operators.Similarity
      .cellAssignmentsTrained(vecs, vecCol, idCol, codebook)

  /** Initial build: assign the corpus against the (trained, frozen)
    * codebook and write it partitioned by cell. */
  def build(dir: String, corpus: DataFrame, vecCol: String, idCol: String,
            codebook: Seq[Seq[Double]]): Unit =
    assign(corpus, vecCol, idCol, codebook)
      .write.partitionBy("cell").mode("overwrite").parquet(dir)

  /** Upsert a batch: map-only assignment, appended into the batch's
    * cell dirs only. Re-sent ids are handled at read time by
    * [[serving]]'s latest-wins contract ONLY if the caller tombstones
    * the old version first (an id is immutable otherwise — the
    * append-log contract). */
  def upsert(dir: String, batch: DataFrame, vecCol: String, idCol: String,
             codebook: Seq[Seq[Double]]): Unit =
    assign(batch, vecCol, idCol, codebook)
      .write.partitionBy("cell").mode("append").parquet(dir)

  /** Tombstone ids: O(ids) append to the side table; nothing in the
    * index moves. */
  def delete(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("append").parquet(tombDir(dir))
  }

  private def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val td = new java.io.File(tombDir(dir))
    if (td.exists) spark.read.parquet(tombDir(dir))
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("id")
    }
  }

  /** The live index: stored assignments minus tombstones. */
  def serving(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .join(broadcast(tombstones(spark, dir)), Seq("id"), "left_anti")

  /** Fold tombstones into the layout: rewrite ONLY the cells holding
    * deleted ids (dynamic partition overwrite), then drop the
    * tombstone table. Cells without deletions are untouched on disk. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val ts = tombstones(spark, dir)
    if (ts.isEmpty) return
    val stored = spark.read.parquet(dir)
    val affected = stored.join(broadcast(ts), Seq("id"))
      .select("cell").distinct()
    val rewritten = stored
      .join(broadcast(affected), Seq("cell"))
      .join(broadcast(ts), Seq("id"), "left_anti")
      // column order: data columns first, partition column last
      .select(stored.columns.filter(_ != "cell").map(col) :+ col("cell"): _*)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten.write.partitionBy("cell").mode("overwrite").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // tombstones folded in: clear the side table
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(tombDir(dir)))
  }
}
