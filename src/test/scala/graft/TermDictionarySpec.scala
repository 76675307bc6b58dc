package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TermDictionary

/** Term dictionary / autocomplete (TermDictionary class doc): the
  * letter-bucketed dictionary must reproduce the plain LIKE
  * aggregation for any batch split, screen replays, and serve a
  * prefix from ONE first-letter bucket. */
class TermDictionarySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark scan scan sort"),
    (2L, "spark stream sort merge"),
    (3L, "scan filter merge"),
    (4L, "sort sort sort spark"),
    (5L, ""),
    (6L, "zeta zebra spark")).toDF("doc_id", "text")

  private def fresh(name: String, nBatches: Int): TermDictionary = {
    val base = s"/tmp/graft_termdict_spec_$name"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val dict = TermDictionary(base, buckets = 8)
    dict.init(spark)
    (0 until nBatches).foreach { b =>
      dict.ingest(corpus.where(pmod(col("doc_id"), lit(nBatches)) === b),
        "doc_id", "text", b.toLong)
    }
    dict
  }

  private def got(dict: TermDictionary, prefix: String, k: Int = 10) =
    dict.prefixTopK(spark, prefix, k).orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  // brute force over the corpus: (term, df, cf) for a prefix, ranked
  private def brute(prefix: String, k: Int = 10) = corpus.collect()
    .flatMap { r =>
      r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, o) => (r.getLong(0), t, o.length) }
    }
    .filter(_._2.startsWith(prefix))
    .groupBy(_._2).map { case (t, rows) =>
      (t, rows.length.toLong, rows.map(_._3).sum.toLong)
    }
    .toSeq.sortBy { case (t, df, _) => (-df, t) }.take(k)
    .zipWithIndex.map { case ((t, df, cf), i) => (t, df, cf, i + 1L) }

  test("prefix lookup == the plain aggregation, for any batch split") {
    Seq(1, 2, 3).foreach { nb =>
      val dict = fresh(s"split$nb", nb)
      assert(got(dict, "s") === brute("s"), s"diverged at $nb batches")
      assert(got(dict, "sort") === brute("sort"))
      assert(got(dict, "nosuch") === Seq.empty)
    }
  }

  test("a poisoned replayed batch is a no-op by the #batch= watermark") {
    val dict = fresh("replay", 2)
    dict.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === 1)
        .withColumn("text", concat(col("text"), lit(" "), col("text"))),
      "doc_id", "text", 1L)
    assert(dict.coveredBatch(spark) === 1L)
    assert(got(dict, "s") === brute("s"))
  }

  test("k truncates, ranking is (df desc, term)") {
    val dict = fresh("rank", 2)
    val top2 = got(dict, "s", k = 2)
    assert(top2 === brute("s", k = 2))
    assert(top2.map(_._4) === Seq(1L, 2L))
  }

  test("the lookup reads only the prefix's first-letter bucket") {
    val dict = fresh("prune", 1)
    // the letter bucket is a strict subset of the dictionary: terms
    // under other letters must not be read back by the slice (the
    // readFor prune is the layout's whole point). Co-bucketed
    // letters may ride along (hash collision), but 'z' and 's' land
    // apart here — 'z*' terms must not appear in an 's' lookup even
    // at k = 100, and vice versa
    val s = got(dict, "s", k = 100).map(_._1).toSet
    assert(s === brute("s", k = 100).map(_._1).toSet)
    val z = got(dict, "z", k = 100).map(_._1).toSet
    assert(z === Set("zeta", "zebra"))
  }
}
