package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** Extension registration: custom expressions reachable from plain
  * SQL. The shared test JVM already holds a session (getOrCreate
  * would reuse it and skip extensions), so the SQL-surface check goes
  * through the same registry path `injectFunction` feeds, and the
  * extensions class itself is applied to a fresh
  * `SparkSessionExtensions` to validate registration wiring. A
  * from-scratch `withExtensions` session is driven end-to-end in
  * `graft.tools.Demo` (own JVM). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("sorted_intersect_count is callable from SQL once registered") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => graft.expressions.SortedIntersectCount(exprs.head, exprs(1)),
      "scala_udf")
    val got = spark.sql(
      "SELECT sorted_intersect_count(array(1,3,5), array(3,4,5)) AS c")
      .head().getInt(0)
    assert(got === 2)
  }

  test("GraftExtensions applies without error to fresh extensions") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
