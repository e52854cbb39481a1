package graft

import graft.harmonize.Harmonize._
import graft.pipeline.Pipeline._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class HarmonizePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("unionHarmonized: typed null padding, '' default, expr override") {
    val canon = Seq(
      CanonicalCol("id", LongType),
      CanonicalCol("amount", DoubleType),
      CanonicalCol("vendor_id", StringType, default = lit("")),
      CanonicalCol("kind", StringType))
    val a = SourceFeed("a", Seq((1L, 10.5, "v1")).toDF("x", "amt", "v"),
      Map("id" -> "x", "amount" -> "amt", "vendor_id" -> "v"),
      Map("kind" -> lit("a")))
    val b = SourceFeed("b", Seq(Tuple1(2L)).toDF("x"),
      Map("id" -> "x"), Map("kind" -> lit("b")))
    val out = unionHarmonized(canon, Seq(a, b)).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getString(2) == "v1" && out(1).getString(2) == "",
      "vendor_id defaults to '' not null")
    assert(out(1).isNullAt(1), "absent double column null-padded")
    assert(out.map(_.getString(3)).toSeq == Seq("a", "b"))
    val sch = unionHarmonized(canon, Seq(a, b)).schema
    assert(sch.map(_.name) == Seq("id", "amount", "vendor_id", "kind"))
    assert(sch("amount").dataType == DoubleType)
  }

  test("unionHarmonized: a mapping key naming no canonical column throws") {
    val canon = Seq(CanonicalCol("id", LongType), CanonicalCol("rate_code", StringType))
    val feed = SourceFeed("a", Seq((1L, "x")).toDF("x", "rc"),
      Map("id" -> "x", "ratecode" -> "rc")) // typo: 'ratecode'
    val e = intercept[IllegalArgumentException] {
      unionHarmonized(canon, Seq(feed))
    }
    assert(e.getMessage.contains("ratecode"),
      "the typo'd key must be named, not silently NULL-padded")
  }

  test("registry: topological order respects deps, cycle throws") {
    val r = new Registry(spark)
    r.register(Model("c", "l", Seq("a", "b")) { d => d("a") })
      .register(Model("b", "l", Seq("a")) { d => d("a") })
      .register(Model("a", "l", Nil) { _ => Seq(1).toDF("x") })
    val order = r.topoOrder(Seq("c"))
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))

    val cyc = new Registry(spark)
    cyc.register(Model("x", "l", Seq("y")) { d => d("y") })
      .register(Model("y", "l", Seq("x")) { d => d("x") })
    intercept[CycleException] { cyc.topoOrder(Seq("x")) }
  }

  test("registry: table materialization writes parquet under env prefix") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val r = new Registry(spark)
    r.register(Model("m1", "2_DIM", Nil, Table) { _ => Seq((1, "a")).toDF("k", "v") })
    val res = r.run(RunConfig(env = Dev, warehouseRoot = tmp), Seq("m1"))
    assert(res.order == Seq("m1"))
    val path = s"$tmp/DEV/2_DIM/m1"
    assert(new java.io.File(path).exists(), s"expected parquet at $path")
    assert(spark.read.parquet(path).count() == 1)
  }

  test("registry: concurrent run resolves a diamond DAG") {
    val r = new Registry(spark)
    r.register(Model("src", "l", Nil) { _ => (1 to 10).toDF("x") })
      .register(Model("left", "l", Seq("src")) { d => d("src").filter($"x" <= 5) })
      .register(Model("right", "l", Seq("src")) { d => d("src").filter($"x" > 5) })
      .register(Model("join", "l", Seq("left", "right")) { d =>
        d("left").union(d("right"))
      })
    val res = r.run(RunConfig(threads = 4))
    assert(res.resolved("join").count() == 10)
  }
}
