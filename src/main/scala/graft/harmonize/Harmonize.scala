package graft.harmonize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema harmonization: project N heterogeneous source relations onto one
  * canonical schema and UNION ALL them — the core act of the reference
  * pipeline (models/2_STG___AUX_TLC/AUX_TLC_RIDES.sql:3-31: a Jinja
  * `{dest: src}` dict per source table, `'x'` sentinel for "absent",
  * NULL-padded absent columns, `''` default for vendor_id, cast-to-string
  * unification, then UNION ALL over the four TLC feeds).
  *
  * Spark-native rendering: the rename map is a plain Scala data structure
  * compiled directly into a `select` of Columns, so Catalyst sees an
  * ordinary Project and pushes column pruning down to the parquet scan of
  * each source — at 100 TB each feed scan reads only its mapped columns.
  */
object Harmonize {

  /** One canonical output column: name, type, and per-source resolution.
    * `default` is used when a source has no mapping for this column
    * (typed NULL unless overridden — AUX_TLC_RIDES.sql:22-23 null padding,
    * :16-17 `'' as vendor_id` special case).
    */
  final case class CanonicalCol(
      name: String,
      dataType: DataType,
      default: Column = lit(null)) {
    def absent: Column = default.cast(dataType).as(name)
    def from(src: String): Column = col(src).cast(dataType).as(name)
    def fromExpr(e: Column): Column = e.cast(dataType).as(name)
  }

  /** A source feed: its DataFrame plus the {canonical -> source} mapping.
    * Absent canonical columns are simply omitted from the map (replacing
    * the reference's `'x'` sentinel with type-safe absence). An expression
    * override lets a feed compute a canonical column (e.g. a decode). */
  final case class SourceFeed(
      name: String,
      df: DataFrame,
      mapping: Map[String, String],
      exprs: Map[String, Column] = Map.empty)

  /** Project every feed onto the canonical schema and UNION ALL.
    * Column order is fixed by `canon`, so plain `union` would also be
    * correct; `unionByName` is used for robustness (SURVEY.md §2.5 U1).
    */
  def unionHarmonized(canon: Seq[CanonicalCol], feeds: Seq[SourceFeed]): DataFrame = {
    require(feeds.nonEmpty, "unionHarmonized: at least one source feed required")
    val names = canon.map(_.name).toSet
    feeds.foreach { f =>
      // a mapping/exprs key that names no canonical column is a feed
      // typo: without this check the entry is silently ignored and the
      // real column NULL-pads — the exact silent-data failure the
      // type-safe-absence design exists to prevent
      val unknown = (f.mapping.keySet ++ f.exprs.keySet).diff(names)
      require(unknown.isEmpty,
        s"feed '${f.name}' maps unknown canonical column(s): " +
          s"${unknown.toSeq.sorted.mkString(", ")} " +
          s"(canonical: ${canon.map(_.name).mkString(", ")})")
    }
    val projected = feeds.map { f =>
      val cols = canon.map { c =>
        f.exprs.get(c.name).map(c.fromExpr)
          .orElse(f.mapping.get(c.name).map(c.from))
          .getOrElse(c.absent)
      }
      f.df.select(cols: _*)
    }
    projected.reduce(_ unionByName _)
  }
}
