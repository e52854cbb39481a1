package graft

import graft.expressions.HashExpressions
import graft.functions.GraftFunctions._
import graft.harmonize.Harmonize._
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** Property-style invariants (SURVEY §5.4), evaluated SET-wise: each
  * property generates hundreds of seeded-random cases into ONE
  * DataFrame and asserts the invariant over all rows in one job —
  * property coverage without per-sample Spark-job overhead.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("zValue: bijective on the bit grid — even/odd bit extraction inverts it") {
    import org.apache.spark.sql.functions._
    val bits = 8
    val pairs = (1 to 300).map(_ =>
      (rnd.nextInt(1 << bits).toLong, rnd.nextInt(1 << bits).toLong)).distinct
    val out = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.GraftFunctions.zValue(col("x"), col("y"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def unzip(z: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (i <- 0 until bits) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    out.foreach { case (x, y, z) =>
      assert(unzip(z) == ((x, y)), s"z=$z did not invert to ($x,$y)")
      assert(z >= 0 && z < (1L << (2 * bits)))
    }
    assert(out.map(_._3).distinct.length == out.length, "z must be injective")
  }

  test("gapFillDaily: gaps become rows, forward fill carries the last value") {
    import org.apache.spark.sql.functions._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    val ev = Seq(
      (7L, ts(1), 10.0), (7L, ts(1), 2.5), // day 1: two events
      (7L, ts(4), 1.0),                    // days 2-3 are a gap
      (8L, ts(2), 5.0)                     // single-day key: no gaps
    ).toDF("user_id", "ts", "value")
    val out = graft.operators.TimeSeries
      .gapFillDaily(ev, "ts", "user_id", "value")
      .orderBy("key", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (7L, "2024-03-01", 2L, Some(12.5), 12.5),
      (7L, "2024-03-02", 0L, None, 12.5), // gap row, filled forward
      (7L, "2024-03-03", 0L, None, 12.5),
      (7L, "2024-03-04", 1L, Some(1.0), 1.0),
      (8L, "2024-03-02", 1L, Some(5.0), 5.0)))
    // densification is per-key span: no row outside [min, max] day
    assert(out.count(_._1 == 8L) == 1)
  }

  test("haversine: symmetry, zero at identical points, km/mi radius ratio") {
    val rows = Seq.fill(500)((
      rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179,
      rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179))
      .toDF("lat1", "lng1", "lat2", "lng2")
    val checked = rows.select(
      distLatLng(col("lat1"), col("lng1"), col("lat2"), col("lng2"), "km").as("ab"),
      distLatLng(col("lat2"), col("lng2"), col("lat1"), col("lng1"), "km").as("ba"),
      distLatLng(col("lat1"), col("lng1"), col("lat1"), col("lng1"), "km").as("self"),
      distLatLng(col("lat1"), col("lng1"), col("lat2"), col("lng2"), "mi").as("ab_mi"))
    val bad = checked.filter(
      abs(col("ab") - col("ba")) > 1e-9 ||
      // acos near 1.0 amplifies float error to sqrt scale: ~2e-8 rad
      // -> ~1e-4 km; assert "within a meter", not exact zero
      abs(col("self")) > 1e-3 ||
      // d_km / d_mi must equal R_km / R_mi everywhere (same central angle)
      (col("ab_mi") > 1e-3 &&
        abs(col("ab") / col("ab_mi") - lit(6371.0 / 3959.0)) > 1e-9))
    assert(bad.count() == 0)
  }

  test("minhash signature: sig(A ∪ B) = elementwise min(sig(A), sig(B))") {
    def randToks(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(40)}")
    val rows = Seq.fill(200)((randToks(rnd.nextInt(8) + 1), randToks(rnd.nextInt(8) + 1)))
      .toDF("a", "b")
    val k = 8
    val sig = (c: org.apache.spark.sql.Column) =>
      HashExpressions.minhashSignature(c, k)
    val bad = rows.select(
        sig(concat(col("a"), col("b"))).as("su"),
        zip_with(sig(col("a")), sig(col("b")), (x, y) => least(x, y)).as("sm"))
      .filter(col("su") =!= col("sm"))
    assert(bad.count() == 0)
  }

  test("householder rotation: orthogonality (norms and pairwise dots preserved)") {
    import graft.expressions.VectorExpressions
    import graft.operators.Opq
    val dim = 16
    val refl = Opq.reflectors(4, dim)
    val rows = Seq.fill(300)((
      Seq.fill(dim)(rnd.nextDouble() * 4 - 2),
      Seq.fill(dim)(rnd.nextDouble() * 4 - 2)))
      .toDF("a", "b")
    val ra = VectorExpressions.householderRotate(col("a"), refl, dp = 9)
    val rb = VectorExpressions.householderRotate(col("b"), refl, dp = 9)
    // an orthogonal R preserves every inner product; the 1e-6 slack
    // covers the dp=9 output grid plus float noise in the chain
    val bad = rows.select(
        (VectorExpressions.dot(col("a"), col("a")) -
          VectorExpressions.dot(ra, ra)).as("dnorm"),
        (VectorExpressions.dot(col("a"), col("b")) -
          VectorExpressions.dot(ra, rb)).as("ddot"))
      .filter(abs(col("dnorm")) > 1e-6 || abs(col("ddot")) > 1e-6)
    assert(bad.count() == 0)
  }

  test("sq8: codes in [0,255] and per-dim reconstruction error <= scale/510") {
    import graft.operators.Similarity
    val dim = 8
    val vecs = Seq.tabulate(400)(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextDouble() * 10 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val (mins, scales) = Similarity.sqTrain(vecs, "embedding", "vec_id")
    assert(mins.length == dim && scales.forall(_ >= 0))
    // round-trip through the search path: the reconstruction the
    // operator ranks by can be off per dim by at most half a code step
    val mnLit = typedlit(mins)
    val scLit = typedlit(scales)
    val codes = transform(col("v"), (x, i) =>
      when(element_at(scLit, i + 1) === 0.0, lit(0L))
        .otherwise(round((x - element_at(mnLit, i + 1)) /
          element_at(scLit, i + 1) * lit(255.0), 0).cast(LongType)))
    val checked = vecs
      .select(expr("cast(embedding as array<double>)").as("v"))
      .select(col("v"), codes.as("codes"))
      .select(col("v"), col("codes"),
        transform(col("codes"), (cd, i) =>
          element_at(mnLit, i + 1) +
            cd.cast(DoubleType) / lit(255.0) * element_at(scLit, i + 1))
          .as("rv"))
    val bad = checked.filter(
      exists(col("codes"), c => c < 0 || c > 255) ||
        exists(zip_with(col("v"), col("rv"), (a, b) => abs(a - b)),
          // half a code step per dim, + float slack
          d => d > lit(scales.max / 510.0 + 1e-9)))
    assert(bad.count() == 0)
  }

  test("delta connected components == full rebuild on random graphs") {
    // seeded-random edge sets sliced arbitrarily into old/new — the
    // delta fold must reproduce the full closure regardless of slicing
    // or id order (keeper-stability is a non-goal here: labels are
    // global min ids by contract)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val (oldE, newE) = edges.splitAt(edges.length / 2)
    val labels = Dedup.connectedComponents(oldE.toDF("id1", "id2"))
    def rel(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val delta = rel(Dedup.connectedComponentsDelta(labels, newE.toDF("id1", "id2")))
    val full = rel(Dedup.connectedComponents(edges.toDF("id1", "id2")))
    assert(delta == full)
  }

  test("rolling hash and md5 hashes stay in their documented ranges") {
    val docs = Seq.fill(300)(
      Seq.fill(rnd.nextInt(20))(s"t${rnd.nextInt(100)}").mkString(" "))
      .toDF("text")
    val bad = docs.select(
        rollingHash(col("text")).as("rh"),
        md5Long(col("text")).as("h"))
      .filter(col("rh") < 0 || col("rh") >= 1000000007L ||
              col("h") < 0 || col("h") >= (1L << 60))
    assert(bad.count() == 0)
  }

  test("union harmonization: row count = Σ inputs, schema canonical under permutation/absence") {
    val canon = Seq(
      CanonicalCol("id", LongType),
      CanonicalCol("v", DoubleType),
      CanonicalCol("tag", StringType, default = lit("")))
    val f1 = Seq((1L, 0.5, "x"), (2L, 1.5, "y")).toDF("id0", "v0", "tag0")
    val f2 = Seq((7.25, 3L), (8.5, 4L), (9.0, 5L)).toDF("vv", "idx") // permuted, tag absent
    val out = unionHarmonized(canon, Seq(
      SourceFeed("f1", f1, Map("id" -> "id0", "v" -> "v0", "tag" -> "tag0"), Map.empty),
      SourceFeed("f2", f2, Map("id" -> "idx", "v" -> "vv"), Map.empty)))
    assert(out.count() == f1.count() + f2.count())
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      Seq(("id", LongType), ("v", DoubleType), ("tag", StringType)))
    // absent-with-default lands '' not null
    assert(out.filter(col("tag").isNull).count() == 0)
  }

  test("connected components: every edge's endpoints share a group, label = component min") {
    val n = 60
    val pairs = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val cc = Dedup.connectedComponents(pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge internal to one group
    pairs.foreach { case (a, b) =>
      assert(cc(a) == cc(b), s"edge ($a,$b) split across groups")
    }
    // label is a member of the component and <= every member
    cc.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keySet.contains(lab) && lab == members.keySet.min)
    }
  }

  test("exact dedup drop: keeps exactly one doc per fingerprint, the min id") {
    val texts = Seq.fill(120)(s"doc ${rnd.nextInt(25)}") // forced collisions
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val kept = Dedup.dropExactDuplicates(df, "text", "id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = texts.zipWithIndex.groupBy(_._1).map { case (_, g) => g.map(_._2).min.toLong }.toSet
    assert(kept.map(_._1).toSet == expected)
  }

  test("repetition stats: count bounds hold on random token streams") {
    val docs = Seq.fill(400)(
      Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(8)}").mkString(" "))
      .toDF("text")
    val st = graft.expressions.TextExpressions.repetitionStats(col("text"))
    val bad = docs.select(st.as("st")).filter(
      col("st.n_distinct") > col("st.n_tokens") ||
      col("st.top_token") > col("st.n_tokens") ||
      // the top token appears at least ceil(n/distinct) times (pigeonhole)
      (col("st.n_tokens") > 0 &&
        col("st.top_token") * col("st.n_distinct") < col("st.n_tokens")) ||
      col("st.top_bigram") > greatest(col("st.n_tokens") - 1, lit(0L)) ||
      (col("st.n_tokens") === 0 &&
        (col("st.n_distinct") =!= 0 || col("st.top_token") =!= 0 ||
         col("st.top_bigram") =!= 0)))
    assert(bad.count() == 0)
  }

  test("PII redaction: a redacted text contains no remaining matches; counts non-negative") {
    def piiish(): String = {
      val bits = Seq(
        s"user${rnd.nextInt(99)}@ex${rnd.nextInt(9)}.org",
        s"${100 + rnd.nextInt(900)}-${100 + rnd.nextInt(900)}-${1000 + rnd.nextInt(9000)}",
        s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
        s"word${rnd.nextInt(50)}", s"x@y.io${rnd.nextInt(256)}.0.0.1") // adjacent PII
      Seq.fill(rnd.nextInt(8))(bits(rnd.nextInt(bits.size))).mkString(" ")
    }
    val docs = Seq.fill(300)(piiish()).toDF("text")
    val red = docs.select(redactPii(col("text")).as("r"),
      patternCount(col("text"), emailRe).as("ne"),
      patternCount(col("text"), phoneRe).as("np"),
      patternCount(col("text"), ipv4Re).as("ni"))
    val bad = red.filter(
      patternCount(col("r"), emailRe) =!= 0 ||
      patternCount(col("r"), phoneRe) =!= 0 ||
      patternCount(col("r"), ipv4Re) =!= 0 ||
      col("ne") < 0 || col("np") < 0 || col("ni") < 0)
    assert(bad.count() == 0)
  }

  test("LM score: fully-OOV text scores exactly the floor; sum bounded by n * floor") {
    val lm = Map("a" -> -100L, "b" -> -200L)
    val oov = -5000L
    val docs = Seq.fill(300)(
      Seq.fill(rnd.nextInt(20))(
        Seq("a", "b", "zz", "qq")(rnd.nextInt(4))).mkString(" "))
      .toDF("text")
    val st = graft.expressions.TextExpressions.lmScore(col("text"), lm, oov)
    // every token contributes in [oov, max(lm)] (all logps negative);
    // n_tokens * oov is the worst case, n_tokens * -100 the best
    val bad = docs.select(st.as("st")).filter(
      col("st.sum_logp_u") < col("st.n_tokens") * oov ||
      col("st.sum_logp_u") > col("st.n_tokens") * -100L)
    assert(bad.count() == 0)
  }

  test("BpeEncodeExpr == replace chain on random merge tables over random words") {
    // 40 seeded-random merge tables (pairs drawn from a 3-symbol
    // alphabet so collisions, overlaps, duplicate re-learned pairs and
    // merged-symbol reuse all occur constantly), each applied to 60
    // random words — evaluated SET-wise: one DataFrame carrying the
    // kernel and the chain columns, one filter for any divergence.
    val alpha = Seq("a", "b", "c")
    (1 to 40).foreach { t =>
      val nMerges = 1 + rnd.nextInt(6)
      // later merges may reference symbols created by earlier ones
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      (1 to nMerges).foreach { _ =>
        def sym() =
          if (merges.nonEmpty && rnd.nextBoolean()) {
            val (a, b) = merges(rnd.nextInt(merges.size)); a + b
          } else alpha(rnd.nextInt(3))
        merges += ((sym(), sym()))
      }
      val words = (1 to 60).map(_ =>
        (1 to (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(3))).mkString)
      val diff = words.toDF("w")
        .select(col("w"),
          array_join(graft.operators.TextAnalysis
            .bpeEncode(col("w"), merges.toSeq), " ").as("k"),
          trim(graft.operators.TextAnalysis
            .bpeSymbols(col("w"), merges.toSeq)).as("c"))
        .filter(col("k") =!= col("c"))
        .collect()
      assert(diff.isEmpty,
        s"table $t: kernel != chain with merges=${merges.toSeq} on " +
          diff.take(3).map(_.getString(0)).mkString(","))
    }
  }
}
