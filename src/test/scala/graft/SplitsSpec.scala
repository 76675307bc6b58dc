package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Splits

/** Deterministic hash split: stability under repartitioning (the
  * property randomSplit lacks), correct cumulative label ranges, and
  * near-nominal proportions from md5 uniformity. */
class SplitsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val splits = Seq(("train", 90), ("val", 5), ("test", 5))

  test("assignment is a pure function of id: stable across partitioning and order") {
    val ids = (0L until 2000L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Splits.hashSplit(df, "id", "s42", splits)
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(ids.repartition(1))
    val b = assign(ids.repartition(16, col("id")))
    val c = assign(ids.orderBy(col("id").desc))
    assert(a === b)
    assert(a === c)
  }

  test("labels follow cumulative bucket ranges; proportions near nominal") {
    val df = Splits.hashSplit((0L until 10000L).toDF("id"), "id", "s42", splits)
    // label is determined by the bucket's cumulative range
    val bad = df.where(
      (col("bucket") < 90 && col("split") =!= "train") ||
      (col("bucket") >= 90 && col("bucket") < 95 && col("split") =!= "val") ||
      (col("bucket") >= 95 && col("split") =!= "test")).count()
    assert(bad === 0L)
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 9000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 500L) < 150, counts.toString)
    assert(math.abs(counts("test") - 500L) < 150, counts.toString)
  }

  test("a different salt re-deals the assignment") {
    val ids = (0L until 2000L).toDF("id")
    val a = Splits.hashSplit(ids, "id", "s42", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Splits.hashSplit(ids, "id", "other", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a.count { case (id, l) => b(id) != l } > 100,
      "independent salts should reassign a nontrivial fraction")
  }

  test("stratified sample keeps per-stratum rates, absent strata drop, membership stable") {
    val rows = (0L until 6000L).map(i => (i, Seq("web", "code", "logs")(i.toInt % 3)))
      .toDF("id", "kind")
    val mix = Map("web" -> 50, "code" -> 100)
    def keep(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Splits.stratifiedSample(df, "kind", "id", "mix", mix)
        .select("id").as[Long].collect().toSet
    val a = keep(rows.repartition(1))
    val b = keep(rows.repartition(16, col("id")))
    assert(a === b, "membership must be a pure function of id")
    val byKind = rows.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = a.groupBy(byKind).view.mapValues(_.size).toMap
    assert(!counts.contains("logs"), "absent stratum must drop entirely")
    assert(counts("code") === 2000, "100% stratum keeps every row")
    assert(math.abs(counts("web") - 1000) < 150, s"~50% of web expected: $counts")
    // growing the corpus never evicts a kept row
    val grown = keep(((0L until 9000L).map(i => (i, Seq("web", "code", "logs")(i.toInt % 3)))
      .toDF("id", "kind")))
    assert(a.subsetOf(grown))
  }

  test("percent validation") {
    val ids = (0L until 10L).toDF("id")
    intercept[IllegalArgumentException] {
      Splits.hashSplit(ids, "id", "s", Seq(("a", 50), ("b", 40)))
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(ids, "id", "s", Seq(("a", 100), ("b", 0)))
    }
  }
}
