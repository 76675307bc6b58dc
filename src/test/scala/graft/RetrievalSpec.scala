package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** BM25 retrieval: exact scores vs a hand-rolled reference on a tiny
  * corpus, plus the ranking-contract properties (k bound, tiebreak,
  * self exclusion). */
class RetrievalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "the lazy dog"),
    (3L, "quick quick fox jumps"),
    (4L, "a dog barks at the fox"),
    (5L, "lorem ipsum dolor")).toDF("doc_id", "text")

  /** Reference BM25 (Lucene idf variant), straight from the formula. */
  private def reference(query: String, k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Double] = {
    val docs = Map(
      1L -> "the quick brown fox", 2L -> "the lazy dog",
      3L -> "quick quick fox jumps", 4L -> "a dog barks at the fox",
      5L -> "lorem ipsum dolor").map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val qTerms = query.split(" ").distinct
    docs.flatMap { case (id, toks) =>
      val score = qTerms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = docs.values.count(_.contains(t)).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * toks.size / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> math.rint(score * 1e6) / 1e6) else None
    }
  }

  test("scores match the formula exactly on a tiny corpus") {
    val queries = Seq((100L, "quick fox"), (200L, "lazy dog")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(queries, corpus, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = reference("quick fox").map { case (d, s) => (100L, d) -> s } ++
      reference("lazy dog").map { case (d, s) => (200L, d) -> s }
    assert(got.keySet === want.keySet)
    want.foreach { case (key, s) =>
      assert(math.abs(got(key) - s) < 1e-9, s"$key: ${got(key)} vs $s")
    }
  }

  test("rank is dense 1..min(k, matches) ordered by (score desc, id)") {
    val queries = Seq((100L, "the fox")).toDF("doc_id", "text")
    val rows = Retrieval.bm25TopK(queries, corpus, "doc_id", "text", k = 2)
      .orderBy("rank").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(3)).toSeq === Seq(1L, 2L))
    assert(rows(0).getDouble(2) >= rows(1).getDouble(2))
  }

  test("excludeSelf drops the query document before ranking") {
    val got = Retrieval.bm25TopK(
      corpus.where(col("doc_id") === 3), corpus,
      "doc_id", "text", k = 5, excludeSelf = true).collect()
    assert(got.nonEmpty)
    assert(!got.exists(r => r.getLong(1) == 3L))
  }

  test("rrfFuse: scores, membership counts and ranks on a known fusion") {
    // query 9: list A ranks (1,2,3), list B ranks (2,1,4) — doc 2 is
    // in both lists, docs 3 and 4 in one each
    val a = Seq((9L, 1L, 1L), (9L, 2L, 2L), (9L, 3L, 3L))
      .toDF("query_id", "cand_id", "rank")
    val b = Seq((9L, 2L, 1L), (9L, 1L, 2L), (9L, 4L, 4L))
      .toDF("query_id", "cand_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    def rr(r: Long) = 1.0 / (60.0 + r)
    assert(got(1L) === ((rr(1) + rr(2), 2L, 1L)))
    assert(got(2L) === ((rr(2) + rr(1), 2L, 2L))) // tie with doc 1 → cand_id tiebreak
    assert(got(3L) === ((rr(3) + 0.0, 1L, 3L)))
    assert(got(4L) === ((rr(4) + 0.0, 1L, 4L)))
  }

  test("rrfFuse: k bounds the output per query and queries stay separate") {
    val a = (1L to 30L).map(i => (1L, i, i)).toDF("query_id", "cand_id", "rank")
    val b = (1L to 30L).map(i => (2L, i, i)).toDF("query_id", "cand_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 7).collect()
    val byQ = got.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byQ === Map(1L -> 7, 2L -> 7))
    assert(got.forall(r => r.getLong(4) <= 7))
  }

  test("repeated query terms count once") {
    val q1 = Seq((1L, "fox")).toDF("doc_id", "text")
    val q2 = Seq((1L, "fox fox fox")).toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(q1, corpus, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val b = Retrieval.bm25TopK(q2, corpus, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(a === b)
  }
}
