package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: [[SparkEntry.entry]] must return rows (the
  * driver's smoke check), every query must have either an oracle or a
  * documented rows-only exemption, and oracle keys must be a subset of
  * query keys (an orphan oracle would silently never run).
  */
class SparkEntrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows on the sf0.001 smoke data") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are exactly the query keys minus the documented rows-only set") {
    // r7: the two approximate-WAU queries became self-validating (exact count
    // + tolerance boolean), so the rows-only set is now empty — every
    // declared query has a hash-checked oracle.
    val rowsOnly = Set.empty[String]
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      s"orphan oracles: ${(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted}")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == rowsOnly,
      s"queries without oracles beyond the documented rows-only set: ${(unoracled -- rowsOnly).toSeq.sorted}")
  }
}
