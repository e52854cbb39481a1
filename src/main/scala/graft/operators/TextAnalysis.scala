package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table — the per-document
  * feature pass a training-data pipeline runs before filtering/dedup.
  * One narrow projection, no shuffle: at 100 TB this is a single
  * map-only stage over the corpus, and every function is a codegen'd
  * Column expression ([[graft.functions.GraftFunctions]]).
  */
object TextAnalysis {

  /** Full per-document profile: language guess, token counts, quality
    * score, fingerprints. */
  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      langId(col(textCol)).as("lang_pred"),
      tokenCount(col(textCol)).cast(LongType).as("n_tokens"),
      bpeTokenCount(col(textCol)).cast(LongType).as("n_bpe_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      punctCount(col(textCol)).cast(LongType).as("n_punct"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fp"),
      rollingHash(col(textCol)).as("rolling_fp"))

  /** Corpus token statistics grouped by a label column. */
  def tokenStats(df: DataFrame, textCol: String, byCol: String): DataFrame =
    df.groupBy(col(byCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast(LongType)).as("total_tokens"),
        sum(bpeTokenCount(col(textCol)).cast(LongType)).as("total_bpe_tokens"),
        min(length(col(textCol))).cast(LongType).as("min_chars"),
        max(length(col(textCol))).cast(LongType).as("max_chars"))
}
