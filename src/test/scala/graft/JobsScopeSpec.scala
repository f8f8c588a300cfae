package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jobs

/** The conf-window × fan-out mutual-exclusion guard: a session-conf
  * mutation window overlapping a Jobs.concurrently fan-out from another
  * thread is the silent-inheritance race the Jobs caller contract
  * forbids — under strict scope it must THROW (so it can never be
  * introduced silently), and legitimate same-thread composition must
  * pass. */
class JobsScopeSpec extends AnyFunSuite {

  private def strictly[A](body: => A): A = {
    sys.props("graft.strictConfScope") = "1"
    try body finally sys.props.remove("graft.strictConfScope")
  }

  test("conf window with no fan-out live passes; value returned") {
    strictly {
      assert(Jobs.confWindow("spec")(41 + 1) == 42)
    }
  }

  test("same-thread fan-out inside a conf window is deliberate composition — passes") {
    strictly {
      var a = 0
      var b = 0
      Jobs.confWindow("spec") {
        Jobs.concurrently(() => a = 1, () => b = 2)
      }
      assert(a == 1 && b == 2)
    }
  }

  test("strict scope: opening a conf window while a foreign fan-out is live throws") {
    strictly {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val entered = new java.util.concurrent.CountDownLatch(1)
      val bg = new Thread(() => Jobs.concurrently(
        () => { entered.countDown(); gate.await() },
        () => ()))
      bg.start()
      try {
        entered.await()
        val e = intercept[IllegalStateException] {
          Jobs.confWindow("spec")(())
        }
        assert(e.getMessage.contains("fan-out"))
      } finally {
        gate.countDown()
        bg.join()
      }
    }
  }

  test("strict scope: fanning out while a foreign conf window is open throws") {
    strictly {
      val open = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      @volatile var bgErr: Throwable = null
      val bg = new Thread(() => {
        try Jobs.confWindow("spec") { open.countDown(); release.await() }
        catch { case t: Throwable => bgErr = t; open.countDown() }
      })
      bg.start()
      try {
        open.await()
        assert(bgErr == null)
        val e = intercept[IllegalStateException] {
          Jobs.concurrently(() => (), () => ())
        }
        assert(e.getMessage.contains("conf"))
      } finally {
        release.countDown()
        bg.join()
        assert(bgErr == null)
      }
    }
  }

  test("default (non-strict) scope: the overlap is reported, not thrown") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val bg = new Thread(() => Jobs.concurrently(
      () => { entered.countDown(); gate.await() },
      () => ()))
    bg.start()
    try {
      entered.await()
      // must NOT throw — parallel test suites may brush windows together
      Jobs.confWindow("spec")(())
    } finally {
      gate.countDown()
      bg.join()
    }
  }
}
