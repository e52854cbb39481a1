package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("distLatLng: known distances, both units") {
    // NYC (40.7128,-74.0060) <-> LA (34.0522,-118.2437) ~ 3936 km / 2446 mi
    val df = Seq((40.7128, -74.0060, 34.0522, -118.2437)).toDF("a", "b", "c", "d")
    val Row(km: Double, mi: Double) = df.select(
      distLatLng($"a", $"b", $"c", $"d", "km"),
      distLatLng($"a", $"b", $"c", $"d", "mi")).head
    assert(math.abs(km - 3936) < 10, s"km=$km")
    assert(math.abs(mi - 2446) < 10, s"mi=$mi")
  }

  test("distLatLng: identical points ~0, never NaN (acos clamp)") {
    val df = Seq((40.0, -74.0)).toDF("lat", "lng")
    val d = df.select(distLatLng($"lat", $"lng", $"lat", $"lng", "km"))
      .head.getDouble(0)
    // spherical-law-of-cosines float error leaves ~1e-4 km residue for
    // identical points; the clamp guarantees it is finite, not NaN.
    assert(!d.isNaN && d >= 0.0 && d < 0.001, s"d=$d")
  }

  test("distLatLng: invalid unit raises at plan build (macro guard parity)") {
    val df = Seq((1.0, 1.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      distLatLng(df("a"), df("b"), df("a"), df("b"), "furlong")
    }
  }

  test("tlcPaymentType: codes 1-6 decode, 7 and null -> null") {
    val df = Seq[Integer](1, 2, 3, 4, 5, 6, 7, null).toDF("c")
    val got = df.select(tlcPaymentType($"c")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("Credit card", "Cash", "No charge", "Dispute",
      "Unknown", "Voided trip", null, null))
  }

  test("replaceLit: literal, not regex") {
    val df = Seq("Boro Zone a.c").toDF("s")
    assert(df.select(replaceLit($"s", "Boro", "Green")).head.getString(0)
      == "Green Zone a.c")
    // '.' must not behave as a regex wildcard
    assert(df.select(replaceLit($"s", "a.c", "X")).head.getString(0)
      == "Boro Zone X")
  }

  test("md5Long: matches DuckDB's CAST('0x'||substr(md5(x),1,15) AS BIGINT)") {
    // md5('abc') = 900150983cd24fb0...; first 15 hex = 900150983cd24fb
    val expected = java.lang.Long.parseLong("900150983cd24fb", 16)
    val got = Seq("abc").toDF("s").select(md5Long($"s")).head.getLong(0)
    assert(got == expected)
  }

  test("tokens/tokenCount: empty strings and runs of whitespace") {
    val df = Seq(("a  b\tc", 3), ("  leading", 1), ("", 0), ("   ", 0))
      .toDF("s", "n")
    val bad = df.filter(tokenCount($"s") =!= $"n").count()
    assert(bad == 0)
  }

  test("langId: marker-word majority with priority tiebreak and und fallback") {
    val rows = Seq(
      "the cat and the dog is big" -> "en",
      "der hund und die katze ist nicht" -> "de",
      "el perro de los gatos es que" -> "es",
      "xyzzy plugh qwert" -> "und",
      // 'la' is both es and fr marker; fr 'le la et' outweighs
      "le chien la et les des" -> "fr")
    rows.foreach { case (text, want) =>
      val got = Seq(text).toDF("t").select(langId($"t")).head.getString(0)
      assert(got == want, s"'$text' -> $got, want $want")
    }
  }

  test("qualityScore: all-criteria doc scores 1.0, junk scores low") {
    val good = ("the quick brown fox jumps over the lazy dog and runs " * 3).trim
    val junk = "!!! ??? *** !!!"
    val g = Seq(good).toDF("t").select(qualityScore($"t")).head.getDouble(0)
    val j = Seq(junk).toDF("t").select(qualityScore($"t")).head.getDouble(0)
    assert(g == 1.0, s"good=$g")
    assert(j <= 0.25, s"junk=$j")
  }

  test("rollingHash: deterministic, order-sensitive, empty -> 0") {
    val h1 = Seq("a b c").toDF("t").select(rollingHash($"t")).head.getLong(0)
    val h1b = Seq("a b c").toDF("t").select(rollingHash($"t")).head.getLong(0)
    val h2 = Seq("c b a").toDF("t").select(rollingHash($"t")).head.getLong(0)
    val h0 = Seq("").toDF("t").select(rollingHash($"t")).head.getLong(0)
    assert(h1 == h1b && h1 != h2 && h0 == 0L)
  }

  test("exactSum: decimal-exact and order-independent") {
    val df = (1 to 1000).map(i => i * 0.01).toDF("x")
    val s1 = df.select(exactSum($"x")).head.getDouble(0)
    val s2 = df.repartition(7).select(exactSum($"x")).head.getDouble(0)
    assert(s1 == s2 && s1 == 5005.0)
  }
}
