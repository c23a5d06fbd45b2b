package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the driver matches `SparkEntry.queries`
  * keys against `SparkEntry.oracleSql` keys, and a MISSING oracle silently
  * downgrades that operator to a weaker rows-only check — so key drift
  * (typo, forgotten oracle) must fail the build, not the grade.
  */
class EntryContractSpec extends AnyFunSuite {

  /** Operators that are rows-only BY DESIGN (approximate by construction,
    * certified instead by bounded-error unit tests — PassesSpec).
    */
  private val rowsOnlyByDesign = Set("col_stats_sketch")

  test("every oracle key names a registered query (no dead oracles)") {
    val dead = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"oracle entries without a query: $dead")
  }

  test("every query has an oracle twin, except the documented rows-only set") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === rowsOnlyByDesign,
      s"queries silently downgraded to rows-only: ${missing -- rowsOnlyByDesign}")
  }

  test("oracle SQL is non-empty and single-statement (the driver runs each as one DuckDB query)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      assert(!sql.contains(";"), s"$k: oracle must be a single statement")
    }
  }
}
