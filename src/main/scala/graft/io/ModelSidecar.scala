package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import graft.operators.TextAnalysis.NbModel

/** Cross-JVM persistence for fitted-model LITERALS (VERDICT r12 next-#1).
  *
  * The r12 t21 driver miss was a DELIVERY failure, not a math failure: the
  * literal NB model lived in an in-JVM TrieMap, so any oracle dump from a
  * fresh JVM silently fell back to the floor(ln·1e9+0.5) replay SQL whose
  * cross-libm boundary hazard the literal contract exists to kill. This
  * sidecar removes the runtime-state dependency: the fit WRITES its integer
  * parameters to a file keyed by the data dir, and the oracle builders READ
  * that file from any JVM, any ordering.
  *
  * Staleness guard: the sidecar records a token folded over the (name,
  * length, mtime) of every file in `<dir>/documents.parquet`. A sidecar
  * whose token no longer matches the on-disk table (the r9/r11 "testdata
  * changed under the engine" class) is treated as absent, forcing a refit —
  * never a silent stale-literal oracle.
  *
  * Format: a line-oriented text file (URL-encoded fields — vocab tokens
  * come from corpus text and may contain quotes/whitespace), written
  * atomically via temp-file + ATOMIC_MOVE so a concurrent reader never
  * sees a torn model. Longs round-trip exactly; `minBoundaryDist` is
  * informational only (re-audited on refit).
  *
  * Location: `$GRAFT_MODEL_DIR` (default `java.io.tmpdir/graft_models`) —
  * NOT inside the read-only data dir and NOT inside the repo (keeps round
  * diffs clean). The data files themselves are never copied: the sidecar
  * is bounded by model size (|classes| + |classes|·|vocab| lines).
  */
object ModelSidecar {

  private val Magic = "graft-nb-v1"

  def modelRoot: Path = Paths.get(
    sys.env.getOrElse("GRAFT_MODEL_DIR",
      sys.props("java.io.tmpdir") + "/graft_models"))

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** One sidecar file per canonical data dir. */
  def nbPath(dataDir: String): Path = {
    val canon = Paths.get(dataDir).toAbsolutePath.normalize.toString
    modelRoot.resolve(s"nb-${md5Hex(canon)}.model")
  }

  /** Content token for the NB fit's input table: fold (relative name,
    * length, mtime) over every regular file under `<dir>/documents.parquet`
    * (a file or a directory of part files), sorted by name. Pure-JVM (no
    * Spark) so a fresh oracle-dump process can validate without a session.
    * An mtime-only change costs at most a spurious (cheap, deterministic)
    * refit — the safe direction. */
  def dirToken(dataDir: String): String = {
    val root = Paths.get(dataDir, "documents.parquet")
    if (!Files.exists(root)) return "absent"
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val stream = Files.walk(root)
    try {
      stream.filter(p => Files.isRegularFile(p)).forEach { p =>
        val rel = root.relativize(p).toString
        entries += s"$rel|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"
      }
    } finally stream.close()
    md5Hex(entries.sorted.mkString("\n"))
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Persist a fitted model for `dataDir` (atomic replace). `cfp` is
    * the CONTENT fingerprint of the documents table the fit consumed
    * ([[ContentFingerprint.of]]) — the provenance stamp the dump-time
    * check verifies against the dir it resolved (VERDICT r13 next-#1c:
    * the three-round t21 red is explained by a dump JVM resolving a
    * dir whose CONTENT differs from the fit's; mtime tokens can't see
    * that across hosts, a content digest can). */
  def writeNb(dataDir: String, m: NbModel, cfp: String): Unit = {
    Files.createDirectories(modelRoot)
    val sb = new StringBuilder
    sb.append(Magic).append('\n')
    sb.append("token ").append(dirToken(dataDir)).append('\n')
    sb.append("cfp ").append(enc(cfp)).append('\n')
    sb.append("mindist ").append(m.minBoundaryDist).append('\n')
    m.priors.foreach { case (l, p) =>
      sb.append("prior ").append(enc(l)).append(' ').append(p).append('\n') }
    m.grid.foreach { case (l, t, p) =>
      sb.append("grid ").append(enc(l)).append(' ').append(enc(t))
        .append(' ').append(p).append('\n') }
    val tmp = Files.createTempFile(modelRoot, "nb-", ".tmp")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, nbPath(dataDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the model persisted for `dataDir`, with its stored content
    * fingerprint; None if the sidecar is absent, malformed, missing
    * the provenance stamp (pre-r14 format), or its mtime token no
    * longer matches the on-disk documents table (stale → caller
    * refits). The returned cfp is what the DUMP path must verify
    * against a recomputed [[ContentFingerprint.of]] before inlining
    * these literals into an oracle. */
  def readNb(dataDir: String): Option[(NbModel, String)] = {
    val p = nbPath(dataDir)
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p)
    if (lines.isEmpty || lines.get(0) != Magic) return None
    var token = ""
    var cfp = ""
    var minDist = 0.0
    val priors = Seq.newBuilder[(String, Long)]
    val grid = Seq.newBuilder[(String, String, Long)]
    try {
      lines.forEach { line =>
        line.split(" ", -1) match {
          case Array("token", t) => token = t
          case Array("cfp", v) => cfp = dec(v)
          case Array("mindist", d) => minDist = d.toDouble
          case Array("prior", l, v) => priors += (dec(l) -> v.toLong)
          case Array("grid", l, t, v) => grid += ((dec(l), dec(t), v.toLong))
          case _ => // magic line / unknown-tag forward-compat: skip
        }
      }
    } catch { case _: IllegalArgumentException | _: NumberFormatException =>
      return None // torn/corrupt file -> treat as absent, refit
    }
    val m = NbModel(priors.result(), grid.result(), minDist)
    if (token == dirToken(dataDir) && cfp.nonEmpty &&
        m.priors.nonEmpty && m.grid.nonEmpty)
      Some((m, cfp))
    else None
  }

  // --- logistic-distillation model (t28) — same contract as the NB
  // sidecar: fit writes, any JVM's oracle builder reads, a stale
  // content token forces a refit, a torn file reads as absent.

  private val LrMagic = "graft-lr-v1"

  def lrPath(dataDir: String): Path = {
    val canon = Paths.get(dataDir).toAbsolutePath.normalize.toString
    modelRoot.resolve(s"lr-${md5Hex(canon)}.model")
  }

  def writeLr(dataDir: String, m: graft.operators.TextAnalysis.LrModel,
              cfp: String): Unit = {
    Files.createDirectories(modelRoot)
    val sb = new StringBuilder
    sb.append(LrMagic).append('\n')
    sb.append("token ").append(dirToken(dataDir)).append('\n')
    sb.append("cfp ").append(enc(cfp)).append('\n')
    sb.append("iters ").append(m.iters).append('\n')
    sb.append("b ").append(m.bNano).append('\n')
    m.wNano.zipWithIndex.foreach { case (v, j) =>
      sb.append("w ").append(j).append(' ').append(v).append('\n') }
    val tmp = Files.createTempFile(modelRoot, "lr-", ".tmp")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, lrPath(dataDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readLr(dataDir: String)
      : Option[(graft.operators.TextAnalysis.LrModel, String)] = {
    val p = lrPath(dataDir)
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p)
    if (lines.isEmpty || lines.get(0) != LrMagic) return None
    var token = ""
    var cfp = ""
    var iters = 0
    var b = 0L
    val ws = scala.collection.mutable.SortedMap.empty[Int, Long]
    try {
      lines.forEach { line =>
        line.split(" ", -1) match {
          case Array("token", t) => token = t
          case Array("cfp", v) => cfp = dec(v)
          case Array("iters", v) => iters = v.toInt
          case Array("b", v) => b = v.toLong
          case Array("w", j, v) => ws(j.toInt) = v.toLong
          case _ => // magic / forward-compat: skip
        }
      }
    } catch { case _: IllegalArgumentException | _: NumberFormatException =>
      return None
    }
    // the weight VECTOR LENGTH is part of the format: a sidecar from a
    // build with a different feature list must read as absent (refit),
    // not silently zip-truncate against lrFeatureNames downstream
    if (token == dirToken(dataDir) && cfp.nonEmpty &&
        ws.size == graft.operators.TextAnalysis.lrFeatureNames.size &&
        ws.keys.toSeq == (0 until ws.size))
      Some((graft.operators.TextAnalysis.LrModel(ws.values.toSeq, b, iters),
        cfp))
    else None
  }
}
