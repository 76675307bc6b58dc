package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{InvertedIndex, Retrieval}
import graft.streaming.BucketedLog

/** Stored-index BM25 (InvertedIndex class doc): incremental ingest
  * must reproduce the from-scratch Retrieval.bm25TopK answer exactly
  * for ANY batch split, the point-lookup read must touch only the
  * query terms' buckets, and replays must be screened per state. */
class InvertedIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a quick brown dog outpaces a lazy fox"),
    (3L, "lorem ipsum dolor sit amet"),
    (4L, "the dog sat on the mat"),
    (5L, "quick quick quick fox"),
    (6L, "entirely unrelated tokens here"),
    (7L, "fox and dog and fox and dog"),
    (8L, "")).toDF("doc_id", "text")

  private def fresh(name: String, nBatches: Int): InvertedIndex = {
    val base = s"/tmp/graft_invidx_spec_$name"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    (0 until nBatches).foreach { b =>
      idx.ingest(corpus.where(pmod(col("doc_id"), lit(nBatches)) === b),
        "doc_id", "text", b.toLong)
    }
    idx
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq

  test("stored index == from-scratch BM25, for any batch split") {
    val direct = rows(Retrieval.bm25TopK(
      corpus.where(col("doc_id") <= 2), corpus, "doc_id", "text", k = 3,
      excludeSelf = true))
    Seq(1, 2, 4).foreach { nb =>
      val idx = fresh(s"split$nb", nb)
      val got = rows(idx.bm25TopK(corpus.where(col("doc_id") <= 2),
        "doc_id", "text", k = 3, excludeSelf = true))
      assert(got === direct, s"diverged at $nb-batch ingest")
    }
  }

  test("a replayed ingest batch is a no-op in both states") {
    val idx = fresh("replay", 2)
    idx.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === 1)
        .withColumn("text", concat(col("text"), lit(" poison poison"))),
      "doc_id", "text", 1L)
    val direct = rows(Retrieval.bm25TopK(
      corpus.where(col("doc_id") <= 2), corpus, "doc_id", "text", k = 3,
      excludeSelf = true))
    val got = rows(idx.bm25TopK(corpus.where(col("doc_id") <= 2),
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(got === direct)
  }

  test("deleteDocs == an index never containing the docs; replay no-op") {
    val idx = fresh("del", 2)
    val doomed = corpus.where(col("doc_id").isin(2L, 7L))
    idx.deleteDocs(doomed, "doc_id", "text", 0L)
    // poisoned replay: doubled text would double the stats decrement
    idx.deleteDocs(doomed
        .withColumn("text", concat(col("text"), lit(" "), col("text"))),
      "doc_id", "text", 0L)
    val reduced = corpus.where(!col("doc_id").isin(2L, 7L))
    val want = rows(Retrieval.bm25TopK(
      reduced.where(col("doc_id") === 1L), reduced, "doc_id", "text",
      k = 3, excludeSelf = true))
    val got = rows(idx.bm25TopK(corpus.where(col("doc_id") === 1L),
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(got === want)
  }

  test("stored positional postings answer proximity like a direct scan") {
    val idx = fresh("prox", 2)
    val got = idx.proximityTopK(spark, "quick", "fox", k = 10)
      .select("doc_id", "min_dist", "n_a", "n_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // doc 1: quick@1 fox@3 -> 2; doc 2: quick@1 fox@7 -> 6;
    // doc 5: quick@0,1,2 fox@3 -> 1
    assert(got === Set((1L, 2L, 1L, 1L), (2L, 6L, 1L, 1L),
      (5L, 1L, 3L, 1L)))
    val ranks = idx.proximityTopK(spark, "quick", "fox", k = 10)
      .select("rank", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks === Map(1L -> 5L, 2L -> 1L, 3L -> 2L))
  }

  test("readFor touches only the keys' buckets, with complete rows") {
    val base = "/tmp/graft_invidx_spec_readfor"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val log = BucketedLog(base, Seq("term"), buckets = 8)
    val all = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      .zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("term", "v")
    log.init(all)
    val slice = log.readFor(Seq("alpha", "gamma").toDF("term"))
    val got = slice.select("term").collect().map(_.getString(0)).toSet
    // the probe terms are present IN FULL...
    assert(Set("alpha", "gamma").subsetOf(got))
    // ...and the slice is bucket-pruned: co-bucketed terms may ride
    // along, but at least one other bucket must have been skipped
    assert(got.size < 6, s"slice should not be the whole state: $got")
    // residual equi-join recovers the exact probe rows
    val exact = slice.join(Seq("alpha", "gamma").toDF("term"), "term")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact === Map("alpha" -> 0L, "gamma" -> 2L))
  }

  test("conjunctive AND retrieval == the brute-force multi-term filter") {
    val idx = fresh("conj", 2)
    // brute force: docs whose token sets contain ALL query terms,
    // (total_tf desc, doc_id) ranked
    val terms = Seq("fox", "dog", "quick")
    val brute = corpus.collect().map { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        (r.getLong(0), terms.map(t => toks.count(_ == t)))
      }
      .filter(_._2.forall(_ > 0))
      .map { case (id, tfs) => (id, tfs.sum.toLong, tfs.min.toLong) }
      .sortBy { case (id, tot, _) => (-tot, id) }
      .zipWithIndex.map { case ((id, tot, mn), i) => (id, tot, mn, i + 1L) }
      .toSeq
    val got = idx.conjunctiveTopK(spark, terms, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === brute)
    // a single-term "conjunction" is the term's postings, ranked
    val one = idx.conjunctiveTopK(spark, Seq("quick"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(one === Set(1L, 2L, 5L))
    // a term absent from the corpus empties the intersection
    assert(idx.conjunctiveTopK(spark, Seq("fox", "nosuchterm"), 10)
      .count() === 0L)
  }

  test("phrase match == brute-force adjacency; repeats and overlaps count") {
    val idx = fresh("phrase", 2)
    // doc 7 = "fox and dog and fox and dog": "fox and dog" occurs at
    // anchors 0 and 4 (overlap-free here, but each window counts)
    val got = idx.phraseTopK(spark, Seq("fox", "and", "dog"), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((7L, 2L, 0L, 1L)))
    // "quick brown" in docs 1 and 2 at anchors 1 and 1
    val qb = idx.phraseTopK(spark, Seq("quick", "brown"), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(qb === Seq((1L, 1L, 1L, 1L), (2L, 1L, 1L, 2L)))
    // REPEATED term in the phrase: "quick quick" matches only doc 5
    // ("quick quick quick fox") with two overlapping occurrences
    val qq = idx.phraseTopK(spark, Seq("quick", "quick"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(qq === Seq((5L, 2L)))
    // adjacency in the WRONG order never matches
    assert(idx.phraseTopK(spark, Seq("brown", "quick"), 10).count() === 0L)
    // absent term short-circuits
    assert(idx.phraseTopK(spark, Seq("fox", "nosuchterm"), 10)
      .count() === 0L)
  }

  test("concurrent named ingest streams == the one-shot index") {
    val base = "/tmp/graft_invidx_spec_mw"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        try {
          idx.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === w),
            "doc_id", "text", 0L, s"w$w")
          // poisoned replay screened by THIS writer's mark
          idx.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === w)
              .withColumn("text", concat(col("text"), lit(" poison"))),
            "doc_id", "text", 0L, s"w$w")
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(failures.asScala.isEmpty,
      s"both streams must land via retry: ${failures.asScala.toList}")
    assert(idx.coveredTxn(spark, "w0") === 0L)
    assert(idx.coveredTxn(spark, "w1") === 0L)
    val direct = rows(Retrieval.bm25TopK(
      corpus.where(col("doc_id") <= 2), corpus, "doc_id", "text", k = 3,
      excludeSelf = true))
    assert(rows(idx.bm25TopK(corpus.where(col("doc_id") <= 2),
      "doc_id", "text", k = 3, excludeSelf = true)) === direct)
  }

  test("deferred delete: tombstoned == never-ingested; purge bit-identical") {
    val idx = fresh("tomb", 2)
    val doomed = corpus.where(col("doc_id").isin(4L, 7L))
    idx.deleteDocsDeferred(doomed, "doc_id", "text", 0L)
    // poisoned replay: appended text would skew the stats decrement
    idx.deleteDocsDeferred(
      doomed.withColumn("text", concat(col("text"), lit(" poison"))),
      "doc_id", "text", 0L)
    val reduced = corpus.where(!col("doc_id").isin(4L, 7L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
    // every query path subtracts tombstones: doc 7's phrase is gone,
    // and the conjunction no longer sees docs 4/7
    assert(idx.phraseTopK(spark, Seq("fox", "and", "dog"), 10)
      .count() === 0L)
    assert(idx.conjunctiveTopK(spark, Seq("fox", "dog"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(idx.tombstoneCount(spark) === 2L)
    idx.purgeDeletes(spark)
    assert(idx.tombstoneCount(spark) === 0L)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "served answer must survive the purge bit-identically")
    // re-running a completed purge is a no-op
    idx.purgeDeletes(spark)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("a delete landing between purge snapshot and drain is never lost") {
    // the round-15 weak: purgeDeletes snapshots the tombstones, purges
    // postings against THAT snapshot, then drains the tombstone log —
    // a deleteDocsDeferred committing in between must keep its
    // tombstones (its postings were not purged), or its docs resurrect
    val idx = fresh("purgerace", 2)
    idx.deleteDocsDeferred(corpus.where(col("doc_id") === 4L),
      "doc_id", "text", 0L)
    // the racer lands inside the snapshot→drain window, deterministically
    idx.purgeDeletes(spark, () =>
      idx.deleteDocsDeferred(corpus.where(col("doc_id") === 7L),
        "doc_id", "text", 1L))
    // doc 7's tombstone survived the drain (its postings are un-purged)
    assert(idx.tombstoneCount(spark) === 1L,
      "the racer's tombstone must survive the drain")
    val reduced = corpus.where(!col("doc_id").isin(4L, 7L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "BOTH delete batches must stay excluded after the racing purge")
    assert(idx.phraseTopK(spark, Seq("fox", "and", "dog"), 10)
      .count() === 0L, "doc 7 must not resurrect")
    // the next purge completes the drain; answers bit-identical
    idx.purgeDeletes(spark)
    assert(idx.tombstoneCount(spark) === 0L)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("re-deleting an already-tombstoned doc is stats-neutral") {
    // cross-batch repeat: batch 0 dooms doc 4; batch 1 dooms {4, 7}.
    // The (n, sumdl) decrement must count doc 4 ONCE — a double
    // decrement would permanently skew every BM25 score
    val idx = fresh("redelete", 2)
    idx.deleteDocsDeferred(corpus.where(col("doc_id") === 4L),
      "doc_id", "text", 0L)
    idx.deleteDocsDeferred(corpus.where(col("doc_id").isin(4L, 7L)),
      "doc_id", "text", 1L)
    val reduced = corpus.where(!col("doc_id").isin(4L, 7L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "scores diverge iff the repeat double-decremented (n, sumdl)")
    // the purge leaves the stats exact too
    idx.purgeDeletes(spark)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("crash between claim and stats commits: the replay completes the decrement") {
    // the claim-first order's crash window: the tombstone CLAIM
    // landed, the stats decrement did not. The replay must derive
    // the exact decrement FROM the surviving claim — a recomputed
    // anti-join against the live tombstone set would see the batch's
    // own ids and decrement zero, advancing the watermark with
    // (n, sumdl) permanently inflated
    val idx = fresh("crash", 2)
    val doomed = corpus.where(col("doc_id").isin(4L, 7L))
    // simulate the crash by hand-committing ONLY the claim half,
    // exactly as deleteDocsDeferred's first commit writes it
    val tomb = BucketedLog("/tmp/graft_invidx_spec_crash/tomb",
      Seq("cand_id"), 8)
    val tagged = doomed.select(col("doc_id").as("cand_id"),
        coalesce(graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long"), lit(0L)).as("dl"),
        lit("deletes").as("src_writer"), lit(0L).as("src_batch"))
    tomb.applyBatch(tagged, 0L, "deletes") { (cur, b) =>
      cur.map(c => c.unionByName(
          b.join(c.select("cand_id"), Seq("cand_id"), "left_anti")))
        .getOrElse(b)
    }
    assert(idx.tombstoneCount(spark) === 2L)
    assert(idx.coveredDeletes(spark) === -1L,
      "the crashed pair must not read as covered")
    // the replay: claim commit self-screens by the writer watermark,
    // stats decrement re-derives from the durable claim rows
    idx.deleteDocsDeferred(doomed, "doc_id", "text", 0L)
    assert(idx.coveredDeletes(spark) === 0L)
    val reduced = corpus.where(!col("doc_id").isin(4L, 7L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "scores diverge iff the replayed decrement was lost or doubled")
    // a second full replay is a no-op via the fast-path
    idx.deleteDocsDeferred(doomed, "doc_id", "text", 0L)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("a crashed claim is not drained by purge until its stats land") {
    // purge must keep UNCOVERED claims: they are a crashed delete's
    // durable half — draining them would lose the decrement forever
    // (the replay would find no claim rows and decrement zero)
    val idx = fresh("crashpurge", 2)
    val doomed = corpus.where(col("doc_id") === 4L)
    val tomb = BucketedLog("/tmp/graft_invidx_spec_crashpurge/tomb",
      Seq("cand_id"), 8)
    val tagged = doomed.select(col("doc_id").as("cand_id"),
        coalesce(graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long"), lit(0L)).as("dl"),
        lit("deletes").as("src_writer"), lit(0L).as("src_batch"))
    tomb.applyBatch(tagged, 0L, "deletes") { (cur, b) =>
      cur.map(c => c.unionByName(
          b.join(c.select("cand_id"), Seq("cand_id"), "left_anti")))
        .getOrElse(b)
    }
    idx.purgeDeletes(spark)
    assert(idx.tombstoneCount(spark) === 1L,
      "the uncovered claim must survive the drain")
    // the replay completes the pair; the next purge drains it
    idx.deleteDocsDeferred(doomed, "doc_id", "text", 0L)
    idx.purgeDeletes(spark)
    assert(idx.tombstoneCount(spark) === 0L)
    val reduced = corpus.where(col("doc_id") =!= 4L)
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("two delete writers racing on overlapping ids decrement each doc once") {
    // the claim is the atomic "who owns this doc's decrement": GDPR
    // deletes {4, 7}, TTL deletes {7, 8}, both from the same base
    // version on real threads — doc 7 must decrement EXACTLY once
    // whichever claim wins the race
    val base = "/tmp/graft_invidx_spec_twodel"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    idx.ingest(corpus, "doc_id", "text", 0L)
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val start = new java.util.concurrent.CountDownLatch(1)
    val sets = Map("gdpr" -> Seq(4L, 7L), "ttl" -> Seq(7L, 8L))
    val threads = sets.toSeq.map { case (w, ids) =>
      new Thread(() => {
        start.await()
        try idx.deleteDocsDeferred(
          corpus.where(col("doc_id").isin(ids: _*)),
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
    assert(idx.coveredDeletes(spark, "gdpr") === 0L)
    assert(idx.coveredDeletes(spark, "ttl") === 0L)
    assert(idx.tombstoneCount(spark) === 3L,
      "the overlapping id must carry exactly one claim")
    // poisoned replay per stream: screened by its own watermark
    idx.deleteDocsDeferred(corpus.where(col("doc_id").isin(4L, 7L))
        .withColumn("text", concat(col("text"), lit(" poison"))),
      "doc_id", "text", 0L, "gdpr")
    val reduced = corpus.where(!col("doc_id").isin(4L, 7L, 8L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "scores diverge iff doc 7 was double-decremented")
    idx.purgeDeletes(spark)
    assert(idx.tombstoneCount(spark) === 0L)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("a delete thread racing an ingest thread: both land, one-shot answer") {
    val base = "/tmp/graft_invidx_spec_delrace"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    idx.ingest(corpus.where(col("doc_id") <= 4), "doc_id", "text", 0L, "wA")
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val start = new java.util.concurrent.CountDownLatch(1)
    val ingester = new Thread(() => {
      start.await()
      try idx.ingest(corpus.where(col("doc_id") > 4), "doc_id", "text",
        1L, "wA")
      catch { case e: Throwable => failures.add(e) }
    })
    val deleter = new Thread(() => {
      start.await()
      try idx.deleteDocsDeferred(corpus.where(col("doc_id").isin(2L, 3L)),
        "doc_id", "text", 0L)
      catch { case e: Throwable => failures.add(e) }
    })
    ingester.start(); deleter.start(); start.countDown()
    ingester.join(); deleter.join()
    import scala.jdk.CollectionConverters._
    assert(failures.asScala.isEmpty,
      s"both writers must land via retry: ${failures.asScala.toList}")
    val reduced = corpus.where(!col("doc_id").isin(2L, 3L))
    val queries = corpus.where(col("doc_id") === 1L)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("MaxScore-pruned BM25: identical answer, strictly fewer postings scored") {
    // a stopword-shaped corpus: every doc carries `common`, few carry
    // the rare terms — the MaxScore walk must make `common`
    // NON-ESSENTIAL (its bound can't lift a new doc into the top-k)
    // and skip scoring its postings for docs outside the accumulator
    val base = "/tmp/graft_invidx_spec_maxscore"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val docs = (1L to 40L).map { i =>
      val rare = if (i <= 5) " raremarker rareother" else ""
      (i, s"common filler tokens number$i$rare common")
    }.toDF("doc_id", "text").localCheckpoint()
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    (0 until 2).foreach { b =>
      idx.ingest(docs.where(pmod(col("doc_id"), lit(2)) === b),
        "doc_id", "text", b.toLong)
    }
    val terms = Seq("raremarker", "rareother", "common")
    val report = idx.bm25TopKPrunedReport(spark, terms, k = 3)
    // the unpruned stored-index answer for the same query terms
    val want = idx.bm25TopK(
        Seq((0L, terms.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .select(col("cand_id"), col("score"), col("rank"))
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val got = report.result.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(got === want, "pruning must be answer-invisible")
    assert(report.totalPostings >= 45L,
      s"corpus shape: common has ~40 postings (${report.totalPostings})")
    assert(report.scoredPostings < report.totalPostings,
      s"MaxScore must score strictly fewer postings: " +
        s"${report.scoredPostings} vs ${report.totalPostings}")
    // the stopword's 35 non-candidate postings were never scored:
    // 5 + 5 essential rare merges + 5 matched `common` rows for the
    // accumulated docs + 15 candidate rows in the exact re-rank = 30
    assert(report.scoredPostings <= 30L,
      s"the stopword's tail must be skipped: ${report.scoredPostings}")
    // pruning composes with tombstones: delete a top doc, answers
    // still identical to the unpruned path over the live corpus
    idx.deleteDocsDeferred(docs.where(col("doc_id") === 1L),
      "doc_id", "text", 0L)
    val got2 = idx.bm25TopKPruned(spark, terms, k = 3)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val want2 = idx.bm25TopK(
        Seq((0L, terms.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .select(col("cand_id"), col("score"), col("rank"))
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(got2 === want2)
  }

  test("batched MaxScore == bm25TopK for a whole query frame, fewer postings") {
    val base = "/tmp/graft_invidx_spec_msbatch"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val docs = (1L to 40L).map { i =>
      val rare = if (i <= 5) " raremarker rareother" else ""
      (i, s"common filler tokens number$i$rare common")
    }.toDF("doc_id", "text").localCheckpoint()
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    (0 until 2).foreach { b =>
      idx.ingest(docs.where(pmod(col("doc_id"), lit(2)) === b),
        "doc_id", "text", b.toLong)
    }
    // heterogeneous batch: a stopword-heavy query that must flip
    // non-essential, a stopword-only one, an absent-term one, a
    // single-term one — all served in ONE depth-walk
    val queries = Seq(
      (100L, "raremarker rareother common"),
      (101L, "common filler"),
      (102L, "nosuchterm"),
      (103L, "raremarker")).toDF("doc_id", "text")
    val report = idx.bm25TopKPrunedBatchReport(queries, "doc_id",
      "text", k = 3)
    val want = rows(idx.bm25TopK(queries, "doc_id", "text", k = 3))
    assert(rows(report.result) === want,
      "batched pruning must be answer-invisible")
    assert(report.scoredPostings < report.totalPostings,
      s"the batch walk must skip the stopword tail: " +
        s"${report.scoredPostings} vs ${report.totalPostings}")
    // doc-as-query (excludeSelf) parity — θ must exclude self rows
    val q2 = docs.where(col("doc_id") <= 3)
    assert(rows(idx.bm25TopKPrunedBatch(q2, "doc_id", "text", 3,
        excludeSelf = true)) ===
      rows(idx.bm25TopK(q2, "doc_id", "text", 3, excludeSelf = true)))
    // composes with tombstones like every query path
    idx.deleteDocsDeferred(docs.where(col("doc_id") === 1L),
      "doc_id", "text", 0L)
    assert(rows(idx.bm25TopKPrunedBatch(queries, "doc_id", "text", 3))
      === rows(idx.bm25TopK(queries, "doc_id", "text", k = 3)))
  }

  test("pruned BM25 edge cases: single term, absent terms, empty store") {
    val idx = fresh("prunededge", 2)
    // single term: trivially unprunable, still exact
    val one = idx.bm25TopKPrunedReport(spark, Seq("quick"), k = 10)
    assert(one.result.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 5L))
    // absent term among present ones: df 0 contributes nothing
    val mixed = idx.bm25TopKPruned(spark, Seq("quick", "nosuchterm"), 10)
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 5L))
    // all terms absent: empty result, nothing scored
    val none = idx.bm25TopKPrunedReport(spark, Seq("nosuchterm"), 5)
    assert(none.result.count() === 0L && none.scoredPostings === 0L)
  }

  test("optimizeSegments: one dir per bucket after, answers bit-identical") {
    val base = "/tmp/graft_invidx_spec_optseg"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8)
    idx.init(spark)
    (0 until 8).foreach { b =>
      idx.ingest(corpus.where(pmod(col("doc_id"), lit(8)) === b),
        "doc_id", "text", b.toLong)
    }
    // 8 segment commits with compactAfter=16: buckets carry multiple
    // segment dirs — the state OPTIMIZE exists to collapse
    val before = idx.postingsSegmentCounts(spark)
    assert(before.values.max > 1,
      s"corpus shape: segments must have accumulated ($before)")
    val queries = corpus.where(col("doc_id") <= 2)
    val want = rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true))
    idx.optimizeSegments(spark)
    val after = idx.postingsSegmentCounts(spark)
    assert(after.nonEmpty && after.values.forall(_ === 1),
      s"post-OPTIMIZE reads must touch exactly one dir/bucket: $after")
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === want,
      "OPTIMIZE is pure layout — answers bit-identical")
    // the replay guard is carried: a poisoned replay is still a no-op
    idx.ingest(corpus.where(pmod(col("doc_id"), lit(8)) === 3)
        .withColumn("text", concat(col("text"), lit(" poison"))),
      "doc_id", "text", 3L)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === want)
  }

  test("audit: healthy index is empty; divergences localize per term") {
    val idx = fresh("audit", 2)
    // healthy: store == corpus → empty
    assert(idx.audit(corpus, "doc_id", "text").count() === 0L)
    // missing: tombstone-delete doc 7 from the INDEX, audit vs full
    idx.deleteDocsDeferred(corpus.where(col("doc_id") === 7L),
      "doc_id", "text", 0L)
    val m = idx.audit(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 7 = "fox and dog and fox and dog": terms fox/and/dog each
    // miss exactly one (term, doc) pair; nothing phantom, no drift
    assert(m === Map("fox" -> (1L, 0L, 0L), "and" -> (1L, 0L, 0L),
      "dog" -> (1L, 0L, 0L)))
    // phantom: drop doc 3 from the AUDIT corpus (store still has it)
    val noDoc3 = corpus.where(col("doc_id") =!= 3L)
    val p = idx.audit(noDoc3, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("lorem") === (0L, 1L, 0L) && p("ipsum") === (0L, 1L, 0L))
    // drift: double doc 5's text in the audit corpus — its pairs
    // (quick, fox) drift while staying present on both sides
    val drifted = corpus.withColumn("text",
      when(col("doc_id") === 5L,
        concat(col("text"), lit(" "), col("text")))
        .otherwise(col("text")))
    val d = idx.audit(drifted, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d("quick") === (0L, 0L, 1L) && d("fox")._3 === 1L)
  }

  test("deleteByIds: text-free delete, phantom ids skipped, purge cleans fwd") {
    val base = "/tmp/graft_invidx_spec_delbyid"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8, withForward = true)
    idx.init(spark)
    (0 until 2).foreach { b =>
      idx.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === b),
        "doc_id", "text", b.toLong)
    }
    // ids only — includes doc 8 (zero tokens: the sentinel row is
    // what lets its (n, sumdl=0) decrement land) and phantom id 99
    idx.deleteByIds(Seq(4L, 7L, 8L, 99L).toDF("doc_id"), "doc_id", 0L)
    // same-batch replay screened; cross-batch repeat stats-neutral
    idx.deleteByIds(Seq(4L, 7L, 8L, 99L).toDF("doc_id"), "doc_id", 0L)
    idx.deleteByIds(Seq(4L, 7L).toDF("doc_id"), "doc_id", 1L)
    assert(idx.tombstoneCount(spark) === 3L, "phantom 99 must not tombstone")
    val reduced = corpus.where(!col("doc_id").isin(4L, 7L, 8L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "scores diverge iff the id-derived (n, sumdl) decrement is off")
    idx.purgeDeletes(spark)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
    // post-purge repeat: forward rows are gone with the postings —
    // nothing re-tombstones, stats untouched
    idx.deleteByIds(Seq(4L, 7L, 8L).toDF("doc_id"), "doc_id", 2L)
    assert(idx.tombstoneCount(spark) === 0L)
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
  }

  test("moreLikeThis == doc-as-query BM25 from re-tokenized text") {
    val base = "/tmp/graft_invidx_spec_mlt"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8, withForward = true)
    idx.init(spark)
    (0 until 2).foreach { b =>
      idx.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === b),
        "doc_id", "text", b.toLong)
    }
    val direct = rows(Retrieval.bm25TopK(
      corpus.where(col("doc_id") === 1L), corpus, "doc_id", "text",
      k = 3, excludeSelf = true))
    assert(rows(idx.moreLikeThis(spark, docId = 1L, k = 3)) === direct,
      "the stored forward vector must reproduce the re-tokenized query")
    // a zero-token doc has an empty stored vector: empty result
    assert(idx.moreLikeThis(spark, docId = 8L, k = 3).count() === 0L)
    // the forward path is gated on the opt-in state
    val plain = fresh("nofwd", 1)
    intercept[IllegalArgumentException] {
      plain.moreLikeThis(spark, 1L, 3)
    }
    intercept[IllegalArgumentException] {
      plain.deleteByIds(Seq(1L).toDF("doc_id"), "doc_id", 0L)
    }
  }

  test("repairTerms rebuilds only the audited terms; co-bucketed rows carry") {
    val idx = fresh("repair", 2)
    // raw rot: drop 'quick' entirely, double 'dog' tf, plant a
    // phantom under 'fox' — stats untouched
    val rot = BucketedLog("/tmp/graft_invidx_spec_repair/post",
      Seq("term"), 8)
    val phantom = Seq(("fox", 999L, 4.0, 1L, Seq(0)))
      .toDF("term", "cand_id", "dl", "tf", "positions")
    rot.rewriteBuckets(Seq("quick", "dog", "fox").toDF("term")) {
      (cur, _) =>
        cur.get.where(col("term") =!= "quick")
          .withColumn("tf", when(col("term") === "dog",
            col("tf") * 2L).otherwise(col("tf")))
          .unionByName(phantom)
    }
    val a1 = idx.audit(corpus, "doc_id", "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a1.keySet === Set("quick", "dog", "fox"))
    assert(a1("quick") === ((3L, 0L, 0L)))  // docs 1, 2, 5
    assert(a1("dog") === ((0L, 0L, 4L)))    // docs 1, 2, 4, 7 drift
    assert(a1("fox") === ((0L, 1L, 0L)))    // the planted phantom
    idx.repairTerms(corpus, "doc_id", "text",
      idx.audit(corpus, "doc_id", "text").select("term"))
    assert(idx.audit(corpus, "doc_id", "text").count() === 0L)
    // the repaired index answers like a pristine one — including the
    // POSITIONS the repair restored (phrase search touches them)
    val direct = rows(Retrieval.bm25TopK(
      corpus.where(col("doc_id") <= 2), corpus, "doc_id", "text", k = 3,
      excludeSelf = true))
    assert(rows(idx.bm25TopK(corpus.where(col("doc_id") <= 2),
      "doc_id", "text", k = 3, excludeSelf = true)) === direct)
    val qb = idx.phraseTopK(spark, Seq("quick", "brown"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(qb === Set(1L, 2L))
  }

  test("forward audit: healthy empty, dl drift localizes, repair converges") {
    val base = "/tmp/graft_invidx_spec_fwdaudit"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = InvertedIndex(base, buckets = 8, withForward = true)
    idx.init(spark)
    (0 until 2).foreach { b =>
      idx.ingest(corpus.where(pmod(col("doc_id"), lit(2)) === b),
        "doc_id", "text", b.toLong)
    }
    // healthy — including doc 8's zero-token sentinel row
    assert(idx.auditForward(corpus, "doc_id", "text").count() === 0L)
    // a tombstoned doc audits as missing vs the FULL corpus...
    idx.deleteDocsDeferred(corpus.where(col("doc_id") === 7L),
      "doc_id", "text", 0L)
    val m = idx.auditForward(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m.keySet === Set(7L) && m(7L)._1 > 0)
    // ...and clean vs the live corpus (what queries serve)
    val live = corpus.where(col("doc_id") =!= 7L)
    assert(idx.auditForward(live, "doc_id", "text").count() === 0L)
    // dl-only drift on doc 5 ("quick"×3 + "fox", dl 4): the postings
    // audit is BLIND to it, the forward audit localizes both rows
    val rotLog = BucketedLog(s"$base/fwd", Seq("cand_id"), 32)
    rotLog.rewriteBuckets(Seq(5L).toDF("cand_id")) { (cur, _) =>
      cur.get.withColumn("dl", when(col("cand_id") === 5L,
        col("dl") * 2.0).otherwise(col("dl")))
    }
    assert(idx.audit(live, "doc_id", "text").count() === 0L,
      "postings must audit clean — the rot is forward-only")
    val d = idx.auditForward(live, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d === Map(5L -> ((0L, 0L, 2L))),
      s"both of doc 5's rows must read as drift: $d")
    idx.repairDocsForward(live, "doc_id", "text",
      Seq(5L).toDF("cand_id"))
    assert(idx.auditForward(live, "doc_id", "text").count() === 0L)
    // the repaired dl drives an exact deleteByIds decrement
    idx.deleteByIds(Seq(5L).toDF("doc_id"), "doc_id", 1L)
    val reduced = corpus.where(!col("doc_id").isin(5L, 7L))
    val queries = corpus.where(col("doc_id") <= 2)
    val direct = rows(Retrieval.bm25TopK(queries, reduced,
      "doc_id", "text", k = 3, excludeSelf = true))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct,
      "scores diverge iff the repaired dl was still drifted")
    // OPTIMIZE covers the forward state: one dir/bucket, answers and
    // the stored-vector query bit-identical
    val mlt = rows(idx.moreLikeThis(spark, docId = 1L, k = 3))
    idx.optimizeSegments(spark)
    assert(idx.fwdSegmentCounts(spark).values.forall(_ === 1) &&
      idx.postingsSegmentCounts(spark).values.forall(_ === 1))
    assert(rows(idx.bm25TopK(queries, "doc_id", "text", k = 3,
      excludeSelf = true)) === direct)
    assert(rows(idx.moreLikeThis(spark, docId = 1L, k = 3)) === mlt)
  }

  test("conjunction walks rarest-first: ascending df, ties by term") {
    val idx = fresh("conjorder", 1)
    val slice = idx.postingsSlice(spark,
      Seq("quick", "dog", "fox", "nosuchterm"))
    val order = idx.conjunctionOrder(slice,
      Seq("quick", "dog", "fox", "nosuchterm"))
    // dfs over the corpus: quick=3 (docs 1,2,5), dog=4, fox=4
    assert(order.map(_._2) === order.map(_._2).sorted,
      s"intersection must start from the rarest term: $order")
    assert(order.head === ("nosuchterm", 0L),
      "an absent term (df 0) must lead — it short-circuits the walk")
    assert(order(1) === ("quick", 3L))
    // tie between dog/fox (df 4) breaks lexicographically
    assert(order.drop(2) === Seq(("dog", 4L), ("fox", 4L)))
  }
}
