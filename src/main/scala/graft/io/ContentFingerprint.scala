package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, expr, lit, xxhash64}

/** THE content fingerprint of an input table — single-sourced so the
  * three consumers (Verify's `fingerprints.json` drift dump, the
  * model-sidecar provenance stamp, and the dump-time provenance CHECK)
  * can never drift in formula or format.
  *
  * One row count + one order-insensitive xxhash64 XOR digest over the
  * stringified row: stable across physical layouts, partitionings and
  * row order; sensitive to any value change. Format `rows=N digest=HEX`
  * matches fingerprints.json, so a provenance mismatch diffs one-line
  * against the round's fingerprint record.
  */
object ContentFingerprint {

  def of(s: SparkSession, dataDir: String, table: String): String = {
    val df = graft.catalog.Catalog(s, dataDir).table(table)
    // strings via concat of casts: stable across physical layouts;
    // XOR fold is row-order- and partitioning-invariant
    val hashed = df.select(
      xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
    val r = hashed.agg(count(lit(1)).as("n"),
      expr("coalesce(bit_xor(h), 0)").as("digest")).head
    s"rows=${r.getLong(0)} digest=${java.lang.Long.toHexString(r.getLong(1))}"
  }
}
