package graft

import java.nio.file.{Files, Paths}

import graft.io.ModelSidecar
import graft.operators.TextAnalysis.NbModel
import org.scalatest.funsuite.AnyFunSuite

/** [[ModelSidecar]] — the cross-JVM delivery mechanism of the t21/t23
  * literal-oracle contract (VERDICT r12 next-#1). The r12 driver miss
  * was delivery, not math: literals lived only in an in-JVM map, so a
  * fresh-JVM oracle dump silently shipped the hazard replay SQL. These
  * pin the sidecar's three load-bearing properties: exact round-trip
  * (including tokens with spaces/quotes/unicode — URL-encoded fields),
  * the staleness guard (content-token mismatch → absent, never stale
  * literals), and corrupt-file tolerance (treated as absent, refit). */
class ModelSidecarSpec extends AnyFunSuite {

  private def tmpDataDir(): String = {
    val d = Files.createTempDirectory("graft-sidecar")
    val docs = d.resolve("documents.parquet")
    Files.createDirectories(docs)
    Files.writeString(docs.resolve("part-0.parquet"), "fake-bytes")
    d.toString
  }

  private val model = NbModel(
    priors = Seq("de" -> -1098612289L, "en" -> -405465108L),
    grid = Seq(
      ("de", "der", -3044522438L),
      ("de", "tok with spaces", -5703782475L),
      ("en", "quote'and\"back\\slash", -5703782475L),
      ("en", "unicode-émöji-日本", -4317488114L)),
    minBoundaryDist = 3.7e-4)

  test("round-trip is exact, including hostile token characters") {
    val dir = tmpDataDir()
    ModelSidecar.writeNb(dir, model, "rows=4 digest=feed")
    val back = ModelSidecar.readNb(dir)
    assert(back.map(_._1.priors) === Some(model.priors))
    assert(back.map(_._1.grid) === Some(model.grid))
    assert(back.map(_._1.minBoundaryDist) === Some(model.minBoundaryDist))
    assert(back.map(_._2) === Some("rows=4 digest=feed"))
  }

  test("staleness guard: a changed documents table invalidates the sidecar") {
    val dir = tmpDataDir()
    ModelSidecar.writeNb(dir, model, "rows=4 digest=feed")
    assert(ModelSidecar.readNb(dir).isDefined)
    // regenerate the table under the engine (the r9/r11 incident class):
    // content length changes -> token mismatch -> sidecar treated absent
    Files.writeString(
      Paths.get(dir, "documents.parquet", "part-0.parquet"),
      "regenerated-different-bytes")
    assert(ModelSidecar.readNb(dir).isEmpty,
      "stale sidecar must never serve literals for regenerated data")
  }

  test("new part file also invalidates; rewrite re-validates") {
    val dir = tmpDataDir()
    ModelSidecar.writeNb(dir, model, "rows=4 digest=feed")
    Files.writeString(
      Paths.get(dir, "documents.parquet", "part-1.parquet"), "more")
    assert(ModelSidecar.readNb(dir).isEmpty)
    ModelSidecar.writeNb(dir, model, "rows=4 digest=feed") // refit path rewrites with fresh token
    assert(ModelSidecar.readNb(dir).isDefined)
  }

  test("corrupt or truncated sidecar reads as absent, never throws") {
    val dir = tmpDataDir()
    ModelSidecar.writeNb(dir, model, "rows=4 digest=feed")
    val p = ModelSidecar.nbPath(dir)
    Files.writeString(p, "graft-nb-v1\ntoken x\nprior en not-a-long\n")
    assert(ModelSidecar.readNb(dir).isEmpty)
    Files.writeString(p, "totally unrelated file")
    assert(ModelSidecar.readNb(dir).isEmpty)
    Files.writeString(p, "") // empty
    assert(ModelSidecar.readNb(dir).isEmpty)
  }

  test("missing documents table: sidecar for it never validates") {
    val d = Files.createTempDirectory("graft-sidecar-empty").toString
    assert(ModelSidecar.readNb(d).isEmpty)
  }

  test("pre-r14 sidecar without a provenance stamp reads as absent") {
    val dir = tmpDataDir()
    ModelSidecar.writeNb(dir, model, "rows=4 digest=feed")
    val p = ModelSidecar.nbPath(dir)
    // strip the cfp line: the un-stamped format must force a refit, not
    // serve literals whose fit content is unknowable
    val kept = Files.readAllLines(p)
    val sb = new StringBuilder
    kept.forEach { l => if (!l.startsWith("cfp ")) sb.append(l).append('\n') }
    Files.writeString(p, sb.toString)
    assert(ModelSidecar.readNb(dir).isEmpty,
      "a sidecar with no content-fingerprint stamp must not validate")
  }
}
