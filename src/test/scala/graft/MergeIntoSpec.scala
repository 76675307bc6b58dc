package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MergeInto

/** MERGE INTO (q177's operator): latest-change-wins over all four
  * outcomes — update, insert, delete, pass-through — with ties
  * broken by the unique change id; delete-then-reinsert within one
  * batch resolves to the later change. */
class MergeIntoSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "seg", "bal")

  private def run(changes: Seq[(Long, String, String, Double, Int, Long)]) =
    MergeInto(base,
        changes.toDF("k", "op", "seg", "bal", "ts", "id"),
        "k", "ts", "id", "op", Seq("seg", "bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap

  test("update, insert, delete, pass-through — all in one batch") {
    val got = run(Seq(
      (1L, "U", "a2", 11.0, 1, 100L),   // update key 1
      (2L, "D", "-", 0.0, 1, 101L),     // delete key 2
      (9L, "U", "new", 99.0, 1, 102L))) // insert key 9
    assert(got === Map(
      1L -> ("a2", 11.0), 3L -> ("c", 30.0), 9L -> ("new", 99.0)), got)
  }

  test("latest change wins by ts, then by change id on ties") {
    val got = run(Seq(
      (1L, "U", "old", 1.0, 1, 100L),
      (1L, "U", "mid", 2.0, 2, 50L),   // later ts beats bigger id
      (1L, "U", "new", 3.0, 2, 51L)))  // same ts: bigger id wins
    assert(got(1L) === ("new", 3.0), got)
    // delete then re-insert in one batch: the later change survives
    val re = run(Seq(
      (2L, "D", "-", 0.0, 1, 100L),
      (2L, "U", "back", 7.0, 2, 101L)))
    assert(re(2L) === ("back", 7.0), re)
    // ...and the reverse order of arrival deletes
    val del = run(Seq(
      (2L, "U", "back", 7.0, 1, 100L),
      (2L, "D", "-", 0.0, 2, 101L)))
    assert(!del.contains(2L), del)
  }
}
