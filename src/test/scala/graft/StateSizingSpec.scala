package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateSizing

/** Pins the keyspace → state-partition sizing rule at the two corpus
  * scales SCALING.md discusses: the graded sf0.1 drains (~10⁵ keys) keep
  * the 2-partition shape their recorded numbers were measured at, and
  * the sf1 keyspace (~10⁶ keys — the regime where 2 partitions measurably
  * throttled st7) gets more stores. The cap keeps store count
  * proportional to cores.
  */
class StateSizingSpec extends AnyFunSuite {

  test("graded-scale keyspaces keep the 2-partition floor") {
    // sf0.001 .. sf0.1: documents 500-5k, events 1k-100k
    assert(StateSizing.forKeyspace(500L, 32) === 2)
    assert(StateSizing.forKeyspace(100000L, 32) === 2)
  }

  test("the sf1 keyspace that throttled st7 gets more partitions") {
    val sf01 = StateSizing.forKeyspace(100000L, 32)
    val sf1 = StateSizing.forKeyspace(1000000L, 32)
    assert(sf1 > sf01, s"1M keys should size above 100k keys (got $sf1)")
    assert(sf1 === 4) // ceil(1M / 2^18)
  }

  test("scales linearly with the keyspace, capped at 4x parallelism") {
    assert(StateSizing.forKeyspace(10L * 1000 * 1000, 32) ===
      (10L * 1000 * 1000 / StateSizing.KeysPerPartition).toInt + 1)
    assert(StateSizing.forKeyspace(Long.MaxValue / 4, 32) === 128)
    assert(StateSizing.forKeyspace(Long.MaxValue / 4, 4) === 16)
  }
}
