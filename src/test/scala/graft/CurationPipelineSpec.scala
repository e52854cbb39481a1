package graft

import graft.models.CurationModels
import graft.pipeline.Pipeline._
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The curation DAG end-to-end through the dbt-style Registry: profile
  * -> filter (redacted text) -> dedup -> decontaminate -> pack, with
  * the generic data-test suite green over the materialized outputs. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Stopwords interleaved with per-doc unique tokens: every doc passes
    * the quality gate (length, stopword ratio, punct), and every
    * 5-token shingle contains a doc-unique token — so benchmark overlap
    * flags ONLY the genuinely shared doc, not a common template. */
  private def docText(i: Long): String =
    Seq("the", s"w${i}a", "of", s"w${i}b", "and", s"w${i}c", "to",
      s"w${i}d", "in", s"w${i}e", "is", s"w${i}f", "it", s"w${i}g",
      "that", s"w${i}h", "for", s"w${i}j", "a", s"w${i}k").mkString(" ")

  private def corpus() = {
    val good = (0L until 40L).map(i => (i, docText(i), "en", "web"))
    val dupes = Seq( // exact duplicates of doc 0's text under new ids
      (100L, docText(0), "en", "web"), (101L, docText(0), "en", "web"))
    val junk = Seq( // fails the quality gate (too short / all punct)
      (200L, "!!! ??? !!!", "en", "spam"),
      (201L, "x", "en", "spam"))
    val pii = Seq(
      (300L, docText(300) + " leak@example.com", "en", "web"))
    (good ++ dupes ++ junk ++ pii)
      .toDF("doc_id", "text", "lang", "source")
  }

  test("curation DAG: materialized stages enforce gates; data tests green") {
    val docs = corpus()
    // benchmark shares doc 1's exact text -> doc 1 is contaminated
    val bench = Seq((9001L, docs.filter($"doc_id" === 1L)
      .head.getString(1))).toDF("doc_id", "text")

    val tmp = Files.createTempDirectory("graft-curation").toString
    val cfg = RunConfig(env = Dev, warehouseRoot = tmp)
    val r = CurationModels.registry(spark, docs, bench)
    // profiling is ONE map-only projection — a shuffle here would mean
    // the stage regressed to joining the standalone operators' outputs
    val profPlan = r.resolve(cfg)("DOCS_PROFILED")
      .queryExecution.executedPlan.toString
    assert(!profPlan.contains("Exchange"), s"unexpected shuffle:\n$profPlan")
    val res = r.run(cfg, Seq("DOCS_PACKED", "DOCS_SHARDED"))
    assert(res.order.nonEmpty && res.resolved.contains("DOCS_PACKED"),
      s"pipeline run incomplete: ${res.order}")

    val filtered = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_FILTERED")
    assert(!filtered.select("doc_id").as[Long].collect()
      .exists(id => id >= 200 && id < 300),
      "junk docs fail the quality gate")
    assert(filtered.filter($"doc_id" === 300L).head.getString(1)
      .contains("<EMAIL>"), "only redacted text ships forward")

    val deduped = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_DEDUPED")
    val dupIds = deduped.select("doc_id").as[Long].collect().toSet
    assert(dupIds.contains(0L) && !dupIds.contains(100L) && !dupIds.contains(101L),
      "exact duplicates collapse to the keeper")

    val clean = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_CLEAN")
    val cleanIds = clean.select("doc_id").as[Long].collect().toSet
    assert(!cleanIds.contains(1L), "benchmark-contaminated doc removed")
    assert(cleanIds.contains(2L), "uncontaminated docs kept")

    val packed = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_PACKED")
    assert(packed.count() == clean.count(), "every clean doc gets a packing slot")
    assert(packed.columns.contains("seq_id") && packed.columns.contains("seq_offset"))

    val sharded = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_SHARDED")
    assert(sharded.count() == clean.count(), "every clean doc gets a shard slot")
    // positions dense 0..n-1 within each shard (the loader contract)
    sharded.select("shard", "pos").as[(Long, Long)].collect()
      .groupBy(_._1).foreach { case (s, rows) =>
        val ps = rows.map(_._2).sorted.toSeq
        assert(ps == (0L until rows.length).toSeq, s"shard $s positions: $ps")
      }

    val tests = CurationModels.tests(r, cfg)
    assert(tests.forall(_.passed),
      s"data tests failed: ${tests.filterNot(_.passed)}")
  }

  test("mixture-sampled export: DOCS_SHARDED per-source counts match the t10 budgets") {
    // three sources with very different volumes: abundant web, smaller
    // books, and a scarce source that cannot fill its budget
    val docs = (
      (0L until 60L).map(i => (i, docText(i), "en", "web")) ++
      (100L until 115L).map(i => (i, docText(i), "en", "books")) ++
      Seq((200L, docText(200), "en", "ref"), (201L, docText(201), "en", "ref"))
    ).toDF("doc_id", "text", "lang", "source")
    val bench = Seq((9001L, "nothing shared here at all with anyone"))
      .toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("graft-curation-mix").toString
    val cfg = RunConfig(env = Dev, warehouseRoot = tmp)
    val budget = 30L
    CurationModels.registry(spark, docs, bench, exportBudget = Some(budget))
      .run(cfg, Seq("DOCS_PACKED", "DOCS_SHARDED"))

    val clean = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_CLEAN")
    // the budgets the DAG must have applied: t10's α-tempered weights
    // over the SAME gated relation, times the export budget, floor 1,
    // capped by what the source actually has
    val weights = graft.operators.TextAnalysis
      .domainMixture(clean, "text", "source", alpha = 0.7)
      .select($"source", $"mix_weight").as[(String, Double)].collect().toMap
    val avail = clean.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val expected = weights.map { case (src, w) =>
      src -> math.min(math.max(1L, math.round(w * budget)), avail(src))
    }

    val sharded = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_SHARDED")
    val got = sharded.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(got == expected,
      s"shard export must ship the t10 mixture, got $got expected $expected")
    // the scarce source is capped by availability, not its budget
    assert(got("ref") == 2L)
    // and the mixture genuinely resampled: fewer web docs than gated
    assert(got("web") < avail("web"))
    // packing runs over the SAMPLED set too
    val packed = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_PACKED")
    assert(packed.count() == got.values.sum)
  }

  test("incremental curation: grown corpus gates only unseen docs; global stages rebuild") {
    val tmp = Files.createTempDirectory("graft-curation-inc").toString
    val cfg = RunConfig(env = Dev, warehouseRoot = tmp)
    val bench = Seq((9001L, "nothing shared here at all with anyone"))
      .toDF("doc_id", "text")

    var docs = corpus()
    CurationModels.registry(spark, docs, bench, incrementalFilter = true)
      .run(cfg, Seq("DOCS_PACKED", "DOCS_SHARDED"))
    val path = s"$tmp/DEV/3_MART___CURATION/DOCS_FILTERED"
    val n1 = spark.read.parquet(path).count()

    // the corpus grows: new good docs + one new junk doc; existing rows
    // unchanged (re-running their gates would be wasted work)
    docs = docs.unionByName(
      Seq((400L, docText(400), "en", "web"),
          (401L, docText(401), "en", "web"),
          (402L, "???", "en", "spam")).toDF("doc_id", "text", "lang", "source"))
    val r2 = CurationModels.registry(spark, docs, bench, incrementalFilter = true)
    r2.run(cfg, Seq("DOCS_PACKED", "DOCS_SHARDED"))

    val filtered = spark.read.parquet(path)
    assert(filtered.count() == n1 + 2, "only the two new good docs appended")
    val ids = filtered.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(400L) && ids.contains(401L) && !ids.contains(402L))
    // downstream global stages rebuilt over the grown relation
    val packed = spark.read.parquet(s"$tmp/DEV/3_MART___CURATION/DOCS_PACKED")
    val packedIds = packed.select("doc_id").as[Long].collect().toSet
    assert(packedIds.contains(400L) && packedIds.contains(401L))
    assert(CurationModels.tests(r2, cfg).forall(_.passed))
  }
}
