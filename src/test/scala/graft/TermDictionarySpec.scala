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

  // brute force over a REDUCED corpus (post-delete expectations)
  private def bruteOver(rows: Seq[(Long, String)], prefix: String,
      k: Int = 10) = rows
    .flatMap { case (id, text) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, o) => (id, t, o.length) }
    }
    .filter(_._2.startsWith(prefix))
    .groupBy(_._2).map { case (t, rs) =>
      (t, rs.size.toLong, rs.map(_._3).sum.toLong)
    }
    .toSeq.sortBy { case (t, df, _) => (-df, t) }.take(k)
    .zipWithIndex.map { case ((t, df, cf), i) => (t, df, cf, i + 1L) }

  private def corpusRows = corpus.collect()
    .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("delete == a dictionary never containing the docs; repeats neutral") {
    val dict = fresh("del", 2)
    val doomed = corpus.where(col("doc_id").isin(1L, 4L))
    dict.delete(doomed, "doc_id", "text", 0L)
    // poisoned same-batch replay: doubled text would double the
    // decrement — screened by the delete writer's watermark
    dict.delete(doomed
        .withColumn("text", concat(col("text"), lit(" "), col("text"))),
      "doc_id", "text", 0L)
    // cross-batch repeat: doc 4 is already claimed — decrements once
    dict.delete(corpus.where(col("doc_id").isin(4L, 6L)),
      "doc_id", "text", 1L)
    assert(dict.coveredDeletes(spark) === 1L)
    val reduced = corpusRows.filterNot(r => Set(1L, 4L, 6L)(r._1))
    assert(got(dict, "s") === bruteOver(reduced, "s"),
      "counts diverge iff a repeat double-decremented")
    // a fully-deleted term vanishes from autocomplete entirely
    assert(got(dict, "z") === Seq.empty,
      "doc 6's zeta/zebra must leave the state, not rank with df 0")
    // ingest after delete keeps folding exactly
    dict.ingest(corpus.where(col("doc_id") === 4L), "doc_id", "text", 2L)
    val back = corpusRows.filterNot(r => Set(1L, 6L)(r._1))
    assert(got(dict, "s") === bruteOver(back, "s"))
  }

  test("crash between claim and dict commits: the replay completes the decrement") {
    val dict = fresh("crash", 2)
    val doomed = corpus.where(col("doc_id") === 1L)
    // simulate the crash: hand-commit ONLY the claim half
    val del = graft.streaming.BucketedLog(
      "/tmp/graft_termdict_spec_crash/del", Seq("cand_id"), 8)
    val tagged = doomed.select(col("doc_id").as("cand_id"),
      lit("deletes").as("src_writer"), lit(0L).as("src_batch"))
    del.applyBatch(tagged, 0L, "deletes") { (cur, b) =>
      cur.map(c => c.unionByName(
          b.join(c.select("cand_id"), Seq("cand_id"), "left_anti")))
        .getOrElse(b)
    }
    assert(dict.coveredDeletes(spark) === -1L)
    // an intervening purge must NOT drain the uncovered claim
    dict.purgeClaims(spark)
    assert(dict.claimCount(spark) === 1L,
      "the crashed claim must survive the drain")
    // the replay: claim self-screens, decrement derives from it
    dict.delete(doomed, "doc_id", "text", 0L)
    assert(dict.coveredDeletes(spark) === 0L)
    val reduced = corpusRows.filterNot(_._1 == 1L)
    assert(got(dict, "s") === bruteOver(reduced, "s"))
    dict.purgeClaims(spark)
    assert(dict.claimCount(spark) === 0L)
  }

  test("two delete writers racing on overlapping ids decrement once") {
    val base = "/tmp/graft_termdict_spec_twodel"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val dict = TermDictionary(base, buckets = 8)
    dict.init(spark)
    dict.ingest(corpus, "doc_id", "text", 0L)
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val start = new java.util.concurrent.CountDownLatch(1)
    val sets = Map("gdpr" -> Seq(1L, 4L), "ttl" -> Seq(4L, 6L))
    val threads = sets.toSeq.map { case (w, ids) =>
      new Thread(() => {
        start.await()
        try dict.delete(corpus.where(col("doc_id").isin(ids: _*)),
          "doc_id", "text", 0L, w)
        catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(failures.asScala.isEmpty,
      s"both delete streams must land via retry: " +
        s"${failures.asScala.toList}")
    assert(dict.coveredDeletes(spark, "gdpr") === 0L)
    assert(dict.coveredDeletes(spark, "ttl") === 0L)
    assert(dict.claimCount(spark) === 3L,
      "the overlapping id must carry exactly one claim")
    val reduced = corpusRows.filterNot(r => Set(1L, 4L, 6L)(r._1))
    assert(got(dict, "s") === bruteOver(reduced, "s"),
      "counts diverge iff doc 4 was double-decremented")
  }

  test("an ingest racing a concurrent maintenance pass rebases, not dies") {
    val base = "/tmp/graft_termdict_spec_race"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val dict = TermDictionary(base, buckets = 8)
    dict.init(spark)
    dict.ingest(corpus.where(col("doc_id") <= 3), "doc_id", "text", 0L)
    val dictLog = graft.streaming.BucketedLog(s"$base/dict",
      Seq("pfx"), 8)
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val start = new java.util.concurrent.CountDownLatch(1)
    val ingester = new Thread(() => {
      start.await()
      try dict.ingest(corpus.where(col("doc_id") > 3),
        "doc_id", "text", 1L)
      catch { case e: Throwable => failures.add(e) }
    })
    val maintainer = new Thread(() => {
      start.await()
      try graft.streaming.BucketedLog.retrying()(
        dictLog.compactNow(spark)(identity))
      catch { case e: Throwable => failures.add(e) }
    })
    ingester.start(); maintainer.start(); start.countDown()
    ingester.join(); maintainer.join()
    import scala.jdk.CollectionConverters._
    assert(failures.asScala.isEmpty,
      s"the ingest fold must rebase through the race: " +
        s"${failures.asScala.toList}")
    assert(got(dict, "s") === brute("s"))
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
