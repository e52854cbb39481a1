package graft

import graft.io.Scratch
import org.scalatest.funsuite.AnyFunSuite

/** Scratch-base resolution contract: single-JVM masters may use local
  * tmp; multi-JVM masters must have an EXPLICIT shared base or fail
  * fast (ADVICE r4 — the default warehouse dir is driver-local on a
  * real cluster, so silently using it corrupts the d02/d08 cut-point). */
class ScratchSpec extends AnyFunSuite {

  private val defaultWh = "file:/home/user/work/spark-warehouse"

  test("spark.graft.tmp wins on any master") {
    assert(Scratch.resolveBase("yarn", Some("hdfs:///tmp/graft"),
      sys.error("must not touch warehouse"), sys.error("unused")) ==
      "hdfs:///tmp/graft")
    assert(Scratch.resolveBase("local[32]", Some("/scratch"),
      sys.error("unused"), sys.error("unused")) == "/scratch")
  }

  test("single-JVM masters use java.io.tmpdir") {
    val tmp = sys.props("java.io.tmpdir")
    assert(Scratch.resolveBase("local", None, defaultWh, false) == tmp)
    assert(Scratch.resolveBase("local[8]", None, defaultWh, false) == tmp)
    assert(Scratch.resolveBase("local[*]", None, defaultWh, false) == tmp)
  }

  test("multi-JVM master + default warehouse dir fails fast with the conf hint") {
    Seq("yarn", "local-cluster[2,4,2048]", "spark://host:7077", "k8s://api")
      .foreach { m =>
        val e = intercept[IllegalStateException] {
          Scratch.resolveBase(m, None, defaultWh, false)
        }
        assert(e.getMessage.contains("spark.graft.tmp"), m)
        assert(e.getMessage.contains(m), "names the master")
      }
  }

  test("multi-JVM master + explicitly-set warehouse dir is accepted") {
    assert(Scratch.resolveBase("yarn", None, "s3a://bucket/warehouse", true) ==
      "s3a://bucket/warehouse")
    // explicit flag wins even if the path HAPPENS to end in the default
    // suffix — the user set it, the user owns the shared-storage claim
    assert(Scratch.resolveBase("yarn", None,
      "hdfs:///shared/spark-warehouse", true) == "hdfs:///shared/spark-warehouse")
  }

  test("multi-JVM master + non-default un-flagged warehouse dir passes the shape check") {
    // conf propagation quirks can lose the explicit flag; a path that is
    // NOT the default shape is still accepted (only the known-local
    // default is refused)
    assert(Scratch.resolveBase("yarn", None, "hdfs:///warehouse", false) ==
      "hdfs:///warehouse")
  }
}
