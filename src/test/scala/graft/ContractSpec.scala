package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants that the correctness gate depends on
  * but nothing else would catch at compile time. */
class ContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle except the sanctioned rows-only check") {
    // a new queries() entry without an oracle silently downgrades to a
    // rows-only check in the driver's correctness record — pin the one
    // sanctioned exception (binary decode is not SQL-expressible; its
    // rows gate on in-plan verification counters instead)
    assert(Queries.all.keySet -- Queries.oracles.keySet ==
      Set("q_multimodal_pipeline"))
    // and no orphan oracles for queries that no longer exist
    assert(Queries.oracles.keySet.subsetOf(Queries.all.keySet))
  }

  test("SparkEntry delegates the full registries (the driver's surface)") {
    assert(SparkEntry.queries.keySet == Queries.all.keySet)
    assert(SparkEntry.oracleSql.keySet == Queries.oracles.keySet)
  }
}
