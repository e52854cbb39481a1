package graft

import graft.io.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with zero shuffles") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)
    // force a merge join: at test scale the small side would broadcast
    // and bucketing wouldn't matter (the planner even says "Bucketed:
    // false (disabled by query planner)" under BHJ)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      val plain = li.join(o, "l_orderkey")
      assert(joined.count() == plain.count())
      // no SHUFFLE exchange: write-time bucketing replaced the per-query
      // shuffle on both sides
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
      // the same join on raw parquet DOES shuffle under the same conf
      val raw = plain.queryExecution.executedPlan.toString
      assert(raw.contains("Exchange hashpartitioning"),
        "raw-table merge join shuffles both sides")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("dropWithLocation clears a QUALIFIED table's real location (r18, ADVICE r17)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10).select(col("id").as("k"), col("id").as("v"))
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bspec_db")
    try {
      df.write.mode("overwrite").format("parquet")
        .saveAsTable("graft_bspec_db.t1")
      // the real managed location lives under <warehouse>/<db>.db/<tbl>
      // — the old <warehouse>/<tbl> convention computes a WRONG path
      val loc = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst
          .TableIdentifier("t1", Some("graft_bspec_db"))).location.getPath
      assert(new java.io.File(loc).exists())
      Bucketing.dropWithLocation(spark, "graft_bspec_db.t1")
      assert(!spark.catalog.tableExists("graft_bspec_db.t1"))
      assert(!new java.io.File(loc).exists(),
        s"qualified table's location $loc must be removed")
      // and a rebuild under the same name succeeds (the contract the
      // method exists for: no LOCATION_ALREADY_EXISTS on re-create)
      df.write.format("parquet").saveAsTable("graft_bspec_db.t1")
      assert(spark.table("graft_bspec_db.t1").count() === 10L)
      Bucketing.dropWithLocation(spark, "graft_bspec_db.t1")
      // cross-JVM fallback path still works for unqualified names: an
      // orphan location with NO catalog entry is cleared by convention
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val orphan = new java.io.File(
        new java.net.URI(wh).getPath, "graft_bspec_orphan")
      orphan.mkdirs()
      assert(orphan.exists())
      Bucketing.dropWithLocation(spark, "graft_bspec_orphan")
      assert(!orphan.exists(), "conventional fallback must clear orphans")
    } finally
      spark.sql("DROP DATABASE IF EXISTS graft_bspec_db CASCADE")
  }

  test("q63 gate shape: bucketed-join mart equals the plain join (r17)") {
    // the layout must be invisible in results — the q63 oracle's claim,
    // re-derived here engine-side; the no-Exchange property is enforced
    // INSIDE bucketedJoin (a planned shuffle throws and the driver key
    // goes red), so this spec only needs the equality
    val dir = "/root/testdata/sf0.001"
    try {
      val got = graft.queries.ExtQueries.q63BucketedJoin(spark, dir)
        .collect().map(_.toSeq)
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val c = spark.read.parquet(s"$dir/customer.parquet")
      val want = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.GraftFunctions.exactSum(col("o_totalprice"))
            .as("revenue"))
        .orderBy(col("c_mktsegment"))
        .collect().map(_.toSeq)
      assert(got.nonEmpty && got.toSeq === want.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_q63_orders")
      spark.sql("DROP TABLE IF EXISTS graft_q63_cust")
    }
  }
}
