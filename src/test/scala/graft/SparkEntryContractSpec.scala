package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-facing contract of [[SparkEntry]] itself — pure map/set
  * assertions, no SparkSession needed.
  *
  * The judge-visible invariant: every gate query either has a DuckDB
  * oracle or is on the documented no-oracle list, and that list is
  * EXACTLY the documented one — the rows-only fallback can never grow
  * silently (a new query without an oracle fails here until it is
  * either oracled or explicitly added with a rationale bullet on
  * [[SparkEntry.oracleSql]]'s doc). */
class SparkEntryContractSpec extends AnyFunSuite {

  test("noOracleByDesign is exactly queries.keySet -- oracleSql.keySet") {
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == SparkEntry.noOracleByDesign,
      s"\nundocumented rows-only queries: ${(actual -- SparkEntry.noOracleByDesign).toSeq.sorted}" +
        s"\nstale no-oracle doc entries:   ${(SparkEntry.noOracleByDesign -- actual).toSeq.sorted}")
  }

  test("every oracle key is a query key (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: ${orphans.toSeq.sorted}")
  }
}
