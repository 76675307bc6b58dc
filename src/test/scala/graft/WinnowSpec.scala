package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Winnowing fingerprints: the paper's selection rule against a naive
  * reference, the shared-substring detection guarantee, density, and
  * partitioning stability. */
class WinnowSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Naive winnowing reference: for each w-window of k-gram hashes pick
    * the min hash (rightmost on ties), return the distinct (pos, hash)
    * selections. */
  private def reference(text: String, k: Int, w: Int): Set[(Long, String)] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val hashes = toks.sliding(k).filter(_.length == k)
      .map(g => md5hex(g.mkString(" "))).toVector
    hashes.zipWithIndex.sliding(w).filter(_.length == w).map { win =>
      win.minBy { case (h, p) => (h, -p) }
    }.map { case (h, p) => (p.toLong, h) }.toSet
  }

  test("matches the naive reference on real documents") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where($"doc_id" < 40)
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getString(2))).toSet).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      val ref = reference(t, 3, 4)
      if (ref.isEmpty) assert(!got.contains(id))
      else assert(got(id) === ref, s"doc $id")
    }
  }

  test("any shared run of >= w+k-1 tokens shares a fingerprint") {
    // two docs sharing exactly 6 = w+k-1 tokens (k=3, w=4) amid
    // otherwise-disjoint vocabulary
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(2)).toSet).toMap
    assert((fp(1L) intersect fp(2L)).nonEmpty)
  }

  test("selection is stable under repartitioning") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where($"doc_id" < 40)
    def s(df: org.apache.spark.sql.DataFrame) =
      Dedup.winnowFingerprints(df, "doc_id", "text", k = 3, w = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(s(docs) === s(docs.repartition(13)))
  }
}
