package graft.io

/** One BOUNDED temp dir per (JVM, call site) — the storage-gate
  * invocation pattern (q62/q66/s01): a gated query that rebuilds its
  * table/landing dir per invocation sweeps the PREVIOUS invocation's
  * dir lazily at the NEXT one, by which point its DataFrame was
  * materialized (the driver runs queries sequentially) — temp growth
  * stays at one live copy per JVM instead of one per run (review r17;
  * factored from three hand-rolled copies, review r18). */
object PerJvmTemp {

  final class Slot(prefix: String) {
    private val prev =
      new java.util.concurrent.atomic.AtomicReference[String]()

    /** Create a fresh temp dir, sweeping this slot's previous one. */
    def fresh(): java.nio.file.Path = {
      val tmp = java.nio.file.Files.createTempDirectory(prefix)
      Option(prev.getAndSet(tmp.toString))
        .foreach(p => rmrf(new java.io.File(p)))
      tmp
    }
  }

  private def rmrf(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(rmrf)
    f.delete(): Unit
  }
}
