package graft

import graft.io.DictionaryIngest
import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class IngestExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("dictionary-driven CSV: schema from dict, corrupt-row quarantine, renames") {
    val dir = Files.createTempDirectory("graft-dict")
    Files.writeString(dir.resolve("dict.csv"),
      """column_name,type,units
        |CAMIS,integer,id
        |DBA,Plain Text,name
        |SCORE,decimal,points
        |GRADE DATE,date,
        |Latitude,double,deg
        |""".stripMargin)
    Files.writeString(dir.resolve("data.csv"),
      """CAMIS,DBA,SCORE,GRADE DATE,Latitude
        |100,Cafe A,12.5,2023-05-01,40.71
        |101,Cafe B,not_a_number,2023-06-01,40.72
        |102,Cafe C,7,2023-07-02,40.73
        |""".stripMargin)
    val dict = DictionaryIngest.readDictionary(spark, dir.resolve("dict.csv").toString)
    assert(dict.map(_._1) == Seq("CAMIS", "DBA", "SCORE", "GRADE DATE", "Latitude"))
    val schema = DictionaryIngest.schemaFromDictionary(dict)
    assert(schema("CAMIS").dataType == LongType)
    assert(schema("SCORE").dataType == DecimalType(38, 9))
    assert(schema("GRADE DATE").dataType == DateType)

    val df = DictionaryIngest.readWithDictionary(
      spark, dir.resolve("data.csv").toString, dict).cache()
    assert(df.count() == 3)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() == 1, "bad SCORE row quarantined, not dropped")
    assert(corrupt.head.getString(corrupt.head.fieldIndex("_corrupt_record"))
      .contains("not_a_number"))
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 2)

    val renamed = DictionaryIngest.applyRenames(good.drop("_corrupt_record"),
      Map("CAMIS" -> "camis_id", "GRADE DATE" -> "grade_date"))
    assert(renamed.columns.toSeq ==
      Seq("camis_id", "DBA", "SCORE", "grade_date", "Latitude"))
  }

  test("salted join equals plain join on skewed data") {
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot: 90% of rows
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("GraftExtensions: SQL functions usable after runtime registration") {
    // the spark.sql.extensions conf is static (new sessions only); the
    // runtime path registers on the live session
    GraftExtensions.register(spark)
    Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val cos = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs").head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    Seq("x y z w").toDF("t").createOrReplaceTempView("docs")
    val sh = spark.sql("SELECT graft_word_shingles(t, 3) AS s FROM docs")
      .head.getSeq[String](0)
    assert(sh.toSet == Set("x y z", "y z w"))
    // non-literal n is rejected at plan time with a clear message
    intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(t, length(t)) FROM docs").collect()
    }
    // the sketch expressions match their DataFrame-path twins
    val sim = spark.sql("SELECT graft_simhash(t, 48) AS h FROM docs").head.getLong(0)
    val simDf = graft.operators.Dedup.simhash(
      Seq((1L, "x y z w")).toDF("id", "t"), "t", "id").head.getLong(1)
    assert(sim == simDf)
    val sig = spark.sql(
      "SELECT graft_minhash_sig(graft_word_shingles(t, 3), 4) AS s FROM docs")
      .head.getSeq[Long](0)
    assert(sig.length == 4 && sig.forall(_ >= 0))
    val mmin = spark.sql(
      "SELECT graft_md5_min(graft_word_shingles(t, 3)) AS m FROM docs")
      .head.getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Seq("x y z", "y z w")
      .map(g => graft.expressions.HashExpressions.md5Long60(md, g.getBytes("UTF-8")))
      .min
    assert(mmin == expected)
  }
}
