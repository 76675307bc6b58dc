package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Extension registration: custom expressions reachable from plain
  * SQL in a session built withExtensions. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("sorted_intersect_count is callable from SQL") {
    // active session in this JVM already exists (shared test session);
    // extensions apply per-session, so build one with them installed
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val got = spark.sql(
      "SELECT sorted_intersect_count(array(1,3,5), array(3,4,5)) AS c")
      .head().getInt(0)
    assert(got === 2)
  }
}
