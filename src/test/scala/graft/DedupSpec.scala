package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup family: idempotent keyed dedup (the reference's storage
  * overwrite semantics, `model/Trade.scala:56-59`) plus the corpus
  * near-dup operators on planted duplicates. */
class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docA2 = "the quick brown fox jumps over the lazy dog near the river bank tonight" // near-dup
  private val docB = "completely different content about spark query engines and parquet files here"

  private def docs = Seq(
    (1L, docA), (2L, docA2), (3L, docB), (4L, docA) // 4 is exact dup of 1
  ).toDF("doc_id", "text")

  test("firstByKey keeps exactly one deterministic row per key") {
    val df = Seq(
      (10L, "a", 1), (10L, "b", 2), (10L, "a", 3), (20L, "c", 1)
    ).toDF("id", "payload", "seq")
    val kept = Dedup.firstByKey(df, Seq("id"), Seq("seq", "payload"))
    val got = kept.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((10L, "a"), (20L, "c")))
    // idempotent: running again changes nothing
    assert(Dedup.firstByKey(kept, Seq("id"), Seq("seq", "payload")).count() === 2)
  }

  test("exactGroups finds exact duplicates with deterministic keeper") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    val dup = groups.where(col("n_copies") > 1).collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("n_copies") === 2L)
    assert(dup.head.getAs[Long]("keeper_id") === 1L)
  }

  test("minhash LSH buckets the near-dup pair together") {
    val buckets = Dedup.minhashBuckets(docs, "doc_id", "text",
      k = 2, nHashes = 4, bandSize = 1)
    // exact dups (1,4) always collide; near-dups (1,2) collide in >=1 band
    val sizes = buckets.agg(max("bucket_size")).head().getLong(0)
    assert(sizes >= 3, s"expected a bucket with the near-dup cluster, got max=$sizes")
  }

  test("simhash: near-dups are close in hamming distance, different docs far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) === sh(4L)) // exact dup ⇒ identical
    assert(hamming(sh(1L), sh(2L)) <= 6, "near-dup should be close")
    assert(hamming(sh(1L), sh(3L)) > hamming(sh(1L), sh(2L)),
      "unrelated doc should be farther than near-dup")
  }

  test("jaccardPairs equals brute-force pairwise jaccard on real documents") {
    val real = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 60)
    val got = Dedup.jaccardPairs(real, "doc_id", "text", k = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver-side brute force over collected shingle sets
    val sets = real.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 2).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      j = if (uni == 0) 0.0 else inter.toDouble / uni
      if j >= 0.3
    } yield (a, b) -> j).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, j) =>
      assert(math.abs(got(k) - j) < 1e-12, s"pair $k") }
    assert(want.nonEmpty, "fixture should contain some similar pairs")
  }

  test("minhashScreen equals the symmetric estimator restricted to cross pairs") {
    val real = graft.sources.Tables.load(spark, sf0001, "documents")
    def toSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("doc_a"), col("doc_b"), col("n_agree").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sym = toSet(Dedup
      .minhashJaccardEstimate(real, "doc_id", "text", k = 2, nHashes = 16, bandSize = 4)
      .where(col("doc_a") < 400 && col("doc_b") >= 400))
    val scr = toSet(Dedup.minhashScreen(
      real.where(col("doc_id") < 400), real.where(col("doc_id") >= 400),
      "doc_id", "text", k = 2, nHashes = 16, bandSize = 4))
    assert(sym.nonEmpty, "fixture should contain cross-side candidates")
    assert(scr === sym)
  }

  test("jaccardPairs surfaces exact and near duplicates above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", k = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 4L)), "exact dup pair missing")
    assert(pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3 === 1.0)
    assert(keys.contains((1L, 2L)), "near-dup pair missing")
  }

  test("decontaminate flags a single verbatim quote with exact shared counts") {
    val eval = Seq((1000L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      // one embedded 4-gram quote inside an otherwise-unrelated doc —
      // the case whole-document similarity measures miss
      (1L, "completely unrelated words surround alpha beta gamma delta and more filler"),
      (2L, "nothing shared at all in this one"),
      (3L, "alpha beta gamma delta epsilon")) // full copy: both shingles shared
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .decontaminate(train, eval, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1000L, 1L), (3L, 1000L, 2L)))
  }
}
