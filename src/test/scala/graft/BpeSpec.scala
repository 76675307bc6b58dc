package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE training: the distributed histogram/fold pipeline must equal a
  * straightforward sequential reference implementation, including the
  * greedy left-to-right merge semantics ("aaaa" + (a,a) -> "aa","aa",
  * never a re-merge within the pass). */
class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Sequential reference BPE over a word histogram. */
  private def refBpe(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    var hist: Seq[(Vector[String], Long)] = texts
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).toSeq
      .map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
    (1 to k).map { it =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      hist.foreach { case (syms, f) =>
        syms.indices.dropRight(1).foreach { i =>
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((l, r), c) = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head
      hist = hist.map { case (syms, f) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toVector, f)
      }
      (it, l, r, c)
    }
  }

  private def trained(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(texts.toDF("text"), "text", k)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("matches the sequential reference on the classic corpus") {
    val texts = Seq(
      "low low low low low", "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    assert(trained(texts, 8) === refBpe(texts, 8))
  }

  test("greedy pass semantics: aaaa merges to two disjoint pairs") {
    val texts = Seq("aaaa aaaa aab")
    val m = trained(texts, 2)
    assert(m === refBpe(texts, 2))
    // first rule must be (a, a) and its count must be computed over
    // ADJACENT pairs (aaaa has 3, aab has 1 -> 7 total over the doc)
    assert(m.head._2 === "a" && m.head._3 === "a")
  }

  test("encode histogram equals reference tokenization of the corpus") {
    val texts = Seq(
      "low low low low low", "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    val k = 5
    val rules = refBpe(texts, k).map { case (_, l, r, _) => (l, r) }
    val refCounts = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .foreach { w =>
        var syms = w.map(_.toString).toVector
        rules.foreach { case (l, r) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toVector
        }
        syms.foreach(t => refCounts(t) = refCounts.getOrElse(t, 0L) + 1L)
      }
    val got = Bpe.encodeHistogram(texts.toDF("text"), "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refCounts.toMap)
  }

  test("matches the reference on real documents (deep k stresses the lazy heap)") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val texts = docs.select("text").as[String].collect().toSeq
    assert(trained(texts, 40) === refBpe(texts, 40))
  }
}
