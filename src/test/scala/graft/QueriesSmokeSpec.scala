package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query runs at sf0.001 and the oracle map stays in
  * sync with the catalog (the driver's correctness gate requires both
  * entries per operator). */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      df.count() // materialize; row counts may legitimately vary per query
    }
  }
}
