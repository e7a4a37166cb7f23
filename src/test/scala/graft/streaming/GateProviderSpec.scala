package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventQueries

/** Pins the data-proportional state-store provider decision boundary
  * (EventQueries.gateProvider — round-8 A/B in
  * probes/state_store_round8.jsonl): HDFS-backed below 64 MiB of
  * events fixture, RocksDB at and above. Same discipline as the
  * spatial salt-plan boundary spec: a future edit that moves the
  * crossover (or flips a catalogue fixture onto RocksDB, changing
  * gate economics) fails HERE, not in the next driver bench.
  */
class GateProviderSpec extends AnyFunSuite {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("provider boundary: HDFS below 64 MiB, RocksDB at and above") {
    // catalogue fixtures (sf0.1 events.parquet is ~2 MB) stay HDFS
    assert(EventQueries.gateProvider(0L).isEmpty)
    assert(EventQueries.gateProvider(2L << 20).isEmpty)
    assert(EventQueries.gateProvider(18L << 20).isEmpty) // grow_sf1 size
    assert(EventQueries.gateProvider((64L << 20) - 1).isEmpty)
    // the measured-crossover side
    assert(EventQueries.gateProvider(64L << 20).contains(Rocks))
    assert(EventQueries.gateProvider(206L << 20).contains(Rocks)) // grow_sf10
    assert(EventQueries.gateProvider(Long.MaxValue / 2).contains(Rocks))
  }

  test("every driver-gated fixture is below the RocksDB crossover") {
    // the oracle-gated results were measured on the HDFS provider;
    // if a regenerated testdata fixture ever crosses 64 MiB this
    // fails loudly instead of silently changing gate provider
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val f = new java.io.File(s"/root/testdata/$sf/events.parquet")
      assume(f.exists(), s"$sf fixture absent on this machine")
      assert(EventQueries.gateProvider(f.length()).isEmpty,
        s"$sf events fixture (${f.length()} bytes) crossed the RocksDB boundary")
    }
  }
}
