package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RotationTrigger._

/** T1 property test (reference: time-to-save?, core.clj:113-120):
  * fires iff count>0 AND (deadline passed OR count >= batch cap).
  * Seeded random cases — scalacheck's scalatest bridge isn't in the
  * offline cache, so properties are checked with a deterministic loop. */
class RotationTriggerSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def pos(max: Long = 1000000L): Long = 1 + math.abs(rnd.nextLong()) % max

  test("never fires on an empty buffer") {
    for (_ <- 1 to 500) {
      val (batch, last, interval) = (pos(), pos(), pos())
      assert(!timeToSave(batch, 0L, last, interval, last + interval + 1))
    }
  }

  test("fires when the batch cap is reached, regardless of clock") {
    for (_ <- 1 to 500) {
      val (batch, last) = (pos(), pos())
      assert(timeToSave(batch, batch + pos(10), last, Long.MaxValue / 2, last))
    }
  }

  test("fires when the interval elapses with any non-empty buffer") {
    for (_ <- 1 to 500) {
      val (count, last, interval) = (pos(999), pos(), pos(100000))
      assert(timeToSave(1000L, count, last, interval, last + interval + pos(10)))
    }
  }

  test("holds (does not fire) below cap and before deadline") {
    for (_ <- 1 to 500) {
      val (count, last, interval) = (pos(999), pos(), 1 + pos(100000))
      assert(!timeToSave(1000L, count, last, interval, last + interval - 1))
    }
  }

  test("reference defaults: 1e6 batch, 180 s interval (core.clj:207-209)") {
    assert(DefaultBatchSize == 1000000L && DefaultIntervalMs == 180000L)
    assert(timeToSave(DefaultBatchSize, 1L, 0L, DefaultIntervalMs, 180000L))
    assert(!timeToSave(DefaultBatchSize, 999999L, 0L, DefaultIntervalMs, 179999L))
  }
}
