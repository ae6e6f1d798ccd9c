package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.streaming.Periodic

/** gossip.at / gossip.del parity (reference all/gossip.js:168-175 +
  * test usage): a registered task fires repeatedly until cleared.
  */
class PeriodicSpec extends SparkSessionSpec {

  test("periodic task fires repeatedly and stops on del") {
    val fired = new AtomicInteger(0)
    val q = Periodic.at(spark, intervalMs = 100) { _ =>
      fired.incrementAndGet(): Unit
    }
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (fired.get() < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(fired.get() >= 3, s"task fired only ${fired.get()} times in 30s")
    } finally Periodic.stop(q)
    // del semantics: after stop, no further firings
    val after = fired.get()
    Thread.sleep(500)
    assert(fired.get() === after)
  }
}
