package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Par

/** Pins the contract the r19 job-overlap optimization leans on: input-
  * order results (so grid row assembly is byte-identical to the
  * sequential loop), inline execution for degenerate sizes, original
  * exceptions rethrown (loud requires/audits unchanged), and nested
  * fan-out (a choice operator's family builders each fan out their own
  * probe sweeps) completing without pool starvation. */
class ParSpec extends AnyFunSuite {

  test("results return in input order regardless of completion order") {
    val out = Par.all((0 until 8).map { i => () =>
      // later thunks finish first — order must still be input order
      Thread.sleep((8 - i) * 10L); i
    })
    assert(out == (0 until 8))
  }

  test("empty and single-thunk inputs run inline") {
    assert(Par.all(Seq.empty[() => Int]) == Seq.empty)
    val t = Thread.currentThread()
    val ran = Par.all(Seq(() => Thread.currentThread() eq t))
    assert(ran == Seq(true), "a single thunk must run on the caller thread")
  }

  test("the original exception is rethrown, not the pool wrapper") {
    val boom = intercept[IllegalArgumentException] {
      Par.all(Seq[() => Int](
        () => 1,
        () => throw new IllegalArgumentException("bad grid axis"),
        () => 3))
    }
    assert(boom.getMessage == "bad grid axis")
  }

  test("nested fan-out does not deadlock and keeps both levels ordered") {
    val out = Par.all((0 until 4).map { i => () =>
      Par.all((0 until 4).map { j => () => i * 10 + j })
    })
    assert(out == (0 until 4).map(i => (0 until 4).map(j => i * 10 + j)))
  }

  test("two() returns both branches' values") {
    val (a, b) = Par.two({ Thread.sleep(20); "left" }, "right")
    assert(a == "left" && b == "right")
  }
}
