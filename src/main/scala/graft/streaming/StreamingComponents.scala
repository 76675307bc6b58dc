package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INCREMENTAL connected components over a stream of near-dup pairs —
  * the clustering step (batch q96) kept continuously up to date as the
  * screening operators (StreamingNearDup / StreamingMinHash /
  * StreamingEmbedScreen) emit new pairs, closing the last batch-only
  * step in the streaming dedup story.
  *
  * == Log-structured state (scales to a 100 TB corpus) ==
  *
  * The labels table is NOT rewritten per batch. State under
  * `labelsDir` is three parts, tied together by a versioned manifest:
  *
  *   - `base-v<id>/bucket=<k>/` — the last compacted (node, component)
  *     snapshot, hash-partitioned by `pmod(xxhash64(node), buckets)`
  *     so point lookups of a batch's endpoints prune to the endpoints'
  *     buckets instead of scanning the corpus;
  *   - `delta-v<id>/` — one small file of NEW nodes per batch that
  *     introduced any (label already resolved as of that batch);
  *   - `remap-v<id>/` — a fully path-compressed (old_root → new_root)
  *     table recording merges since the last compaction. Every stored
  *     label resolves through at most ONE remap hop (the table is
  *     re-targeted each batch), and the table is bounded by
  *     `remapCap`, so it broadcasts.
  *
  * Per micro-batch (checkpointed `foreachBatch`, the `IngestPipeline`
  * sink pattern) the work is O(|batch| + touched buckets), never
  * O(corpus): look up the batch endpoints' current roots
  * (partition-pruned base + deltas, resolved through the broadcast
  * remap), contract the batch to a COMPONENT-level graph (≤ 2·|batch|
  * vertices), run CC on that tiny graph (driver union-find below
  * `driverEdgeCap` edges; the distributed star-contraction of
  * [[graft.operators.Components.connectedComponents]] above it),
  * append a delta for new nodes and re-target + extend the remap.
  * Only when the remap outgrows `remapCap` or the delta list outgrows
  * `deltaCap` does a COMPACTION fold everything into a fresh
  * partitioned base — so full rewrites are amortized over many
  * batches and bounded by state size, not batch count.
  *
  * == Commit protocol ==
  *
  * Each effective batch writes its dirs, then a fresh manifest
  * `_STATE.v<batchId>` (tmp file + atomic rename to a NEW name — no
  * delete-then-rename pointer swap), then deletes superseded
  * manifests and dirs. Readers take the HIGHEST manifest present, so
  * a crash at any point leaves either the old or the new state fully
  * intact and never an empty labeling.
  *
  * Delivery: at-least-once like every sink in this file — min-label
  * merging is monotone and edge union idempotent, so a replayed batch
  * finds every endpoint already merged, produces no new delta/remap
  * rows, and is skipped as a no-op. A cluster's id can DECREASE as
  * later pairs bridge it to a lower-numbered cluster; readers see
  * labels-as-of-batch, exactly the semantics of re-running batch CC
  * on everything seen so far. */
object StreamingComponents {

  /** Fixed scratch base for q131's AvailableNow replay gate (same
    * static-oracle-path trade as the other replay queries). */
  val scratchBase: String = "/tmp/graft_q131_components"

  /** Default hash-partition count for the base snapshot. Local-mode
    * default; on a real cluster raise it so a bucket is a few hundred
    * MB (pruning cost is per-bucket listing, lookup cost is the
    * endpoints' buckets only). */
  val defaultBuckets: Int = 64

  /** Compact when the remap table exceeds this many rows (it must
    * stay broadcastable) or the delta list exceeds `defaultDeltaCap`
    * dirs (read fan-in per lookup). */
  val defaultRemapCap: Long = 100000L
  val defaultDeltaCap: Int = 8

  /** Component-graph CC runs as a driver union-find below this many
    * edges (micro-batches are latency-bound; ~8 Spark jobs per
    * star-contraction round dwarf a sub-second in-memory pass), and
    * falls back to the distributed contraction above it. */
  val defaultDriverEdgeCap: Long = 2000000L

  // ---- versioned manifest ------------------------------------------------

  private case class CcState(version: Long, base: Option[String],
      deltas: Seq[String], remap: Option[String], remapSize: Long,
      buckets: Int) {
    def dirs: Seq[String] = base.toSeq ++ deltas ++ remap.toSeq
  }

  private val StateName = """_STATE\.v(\d{19})""".r

  private def stateFileName(version: Long): String =
    f"_STATE.v$version%019d"

  /** Highest manifest present wins — survives a crash at any point of
    * a commit (old + new manifests may coexist briefly; no window
    * with none). */
  private def readState(fs: FileSystem, labelsDir: String): Option[CcState] = {
    val dir = new Path(labelsDir)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case StateName(v) => Some((v.toLong, st.getPath))
        case _ => None
      }
    }
    if (versions.isEmpty) return None
    val (version, path) = versions.maxBy(_._1)
    val in = fs.open(path)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
    val kv = text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }.toSeq
    Some(CcState(
      version = version,
      base = kv.collectFirst { case ("base", v) => v },
      deltas = kv.collect { case ("delta", v) => v },
      remap = kv.collectFirst { case ("remap", v) => v },
      remapSize = kv.collectFirst { case ("remapSize", v) => v.toLong }
        .getOrElse(0L),
      buckets = kv.collectFirst { case ("buckets", v) => v.toInt }
        .getOrElse(defaultBuckets)))
  }

  private def writeState(fs: FileSystem, labelsDir: String,
      st: CcState): Unit = {
    val body = (st.base.map(b => s"base=$b").toSeq ++
      st.deltas.map(d => s"delta=$d") ++
      st.remap.map(r => s"remap=$r").toSeq ++
      Seq(s"remapSize=${st.remapSize}", s"buckets=${st.buckets}"))
      .mkString("\n")
    val tmp = new Path(s"$labelsDir/${stateFileName(st.version)}.tmp")
    val dst = new Path(s"$labelsDir/${stateFileName(st.version)}")
    // dst can only pre-exist if a replay of THIS batch crashed after
    // its rename: content is re-derived deterministically from the same
    // batchId, so skip the write entirely — a delete-then-rename here
    // would open the only window where ZERO intact manifests exist
    // (older versions were cleaned after the prior commit).
    if (fs.exists(dst)) return
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, dst)
  }

  private def cleanup(fs: FileSystem, labelsDir: String,
      prev: Option[CcState], cur: CcState): Unit = {
    val keep = cur.dirs.toSet
    prev.foreach(_.dirs.filterNot(keep)
      .foreach(d => fs.delete(new Path(s"$labelsDir/$d"), true)))
    fs.listStatus(new Path(labelsDir)).foreach { st =>
      st.getPath.getName match {
        case StateName(v) if v.toLong < cur.version =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  // ---- label resolution --------------------------------------------------

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("node"), col("id").as("component"))

  private def storedLabels(spark: SparkSession, labelsDir: String,
      st: CcState, bucketFilter: Option[Seq[Int]]): DataFrame = {
    val basePart = st.base.map { b =>
      val raw = spark.read.parquet(s"$labelsDir/$b")
      bucketFilter.fold(raw)(bs => raw.where(col("bucket").isin(bs.map(Integer.valueOf): _*)))
        .select(col("node"), col("component"))
    }
    val deltaParts = st.deltas.map(d =>
      spark.read.parquet(s"$labelsDir/$d").select(col("node"), col("component")))
    (basePart.toSeq ++ deltaParts)
      .reduceOption(_.unionByName(_)).getOrElse(emptyLabels(spark))
  }

  private def applyRemap(spark: SparkSession, labelsDir: String,
      st: CcState, labels: DataFrame): DataFrame = st.remap match {
    case None => labels
    case Some(r) =>
      val rm = spark.read.parquet(s"$labelsDir/$r")
      labels.join(broadcast(rm), labels("component") === rm("old_c"), "left")
        .select(labels("node"),
          coalesce(rm("new_c"), labels("component")).as("component"))
  }

  /** Read the current labels table (empty frame before first batch):
    * base ∪ deltas with the (broadcast) remap applied — one hop, the
    * table is kept fully path-compressed. */
  def readLabels(spark: SparkSession, labelsDir: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    readState(fs, labelsDir) match {
      case None => emptyLabels(spark)
      case Some(st) =>
        applyRemap(spark, labelsDir, st,
          storedLabels(spark, labelsDir, st, bucketFilter = None))
    }
  }

  // ---- driver fast path helpers ------------------------------------------

  /** Driver-side twin of the Spark `pmod(xxhash64(node), B)` bucket
    * expression — XXH64.hashLong with Spark's default seed 42 is the
    * exact function the column evaluates, so pruned lookups and the
    * partitioned base agree byte-for-byte (spec-pinned). */
  private[graft] def bucketOfNode(node: Long, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(node, 42L)
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** Min-root union-find over a driver-resident edge list. */
  private final class UnionFind {
    private val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def find(x: Long): Long = {
      var r = x
      while ({ val p = parent.get(r); p != null && p.longValue != r })
        r = parent.get(r).longValue
      var c = x
      while ({ val p = parent.get(c); p != null && p.longValue != r }) {
        val nx = parent.get(c).longValue; parent.put(c, r); c = nx
      }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
  }

  // ---- the sink ----------------------------------------------------------

  /** Start the labels-maintenance sink (see the object scaladoc for
    * the state layout and commit protocol). */
  def start(pairs: DataFrame, aCol: String, bCol: String,
      labelsDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      buckets: Int = defaultBuckets,
      remapCap: Long = defaultRemapCap,
      deltaCap: Int = defaultDeltaCap,
      driverEdgeCap: Long = defaultDriverEdgeCap): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, aCol, bCol, labelsDir,
          buckets, remapCap, deltaCap, driverEdgeCap)
      }
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      aCol: String, bCol: String, labelsDir: String, buckets: Int,
      remapCap: Long, deltaCap: Int, driverEdgeCap: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val stOpt = readState(fs, labelsDir)
    val bkts = stOpt.map(_.buckets).getOrElse(buckets)

    val e = batch
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct().localCheckpoint()
    val nEdges = e.count()
    if (nEdges == 0) { e.unpersist(); return }
    if (nEdges <= driverEdgeCap)
      processFast(spark, fs, labelsDir, stOpt, bkts, batchId,
        e.collect().map(r => (r.getLong(0), r.getLong(1))),
        remapCap, deltaCap)
    else
      processDistributed(spark, fs, labelsDir, stOpt, bkts, batchId, e,
        remapCap, deltaCap)
    e.unpersist()
    ()
  }

  /** Micro-batch FAST PATH (the common case — batches are
    * latency-bound and far below `driverEdgeCap`): one Spark job
    * fetches the endpoints' stored labels (partition-pruned base ∪
    * deltas), one loads the bounded remap, and contraction, re-target
    * and new-node labeling run in memory — ~6 small jobs per batch
    * instead of ~15 (job-launch overhead dominates micro-batch wall). */
  private def processFast(spark: SparkSession, fs: FileSystem,
      labelsDir: String, stOpt: Option[CcState], bkts: Int, batchId: Long,
      edges: Array[(Long, Long)], remapCap: Long, deltaCap: Int): Unit = {
    import spark.implicits._
    val nodes: Array[Long] = {
      val s = scala.collection.mutable.LinkedHashSet[Long]()
      edges.foreach { case (a, b) => s += a; s += b }
      s.toArray
    }
    val oldRemap: Map[Long, Long] = stOpt.flatMap(_.remap) match {
      case Some(r) => spark.read.parquet(s"$labelsDir/$r").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      case None => Map.empty
    }
    // endpoints' stored labels: one pruned-scan + broadcast-join job
    val knownRaw: Map[Long, Long] = stOpt match {
      case None => Map.empty
      case Some(st) =>
        val bucketIds = nodes.map(bucketOfNode(_, st.buckets)).distinct.toSeq
        storedLabels(spark, labelsDir, st, Some(bucketIds))
          .join(broadcast(nodes.toSeq.toDF("node")), "node")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // resolve through the remap (one hop — the table is compressed)
    val known: Map[Long, Long] =
      knownRaw.map { case (n, c) => n -> oldRemap.getOrElse(c, c) }

    val uf = new UnionFind
    edges.foreach { case (a, b) =>
      uf.union(known.getOrElse(a, a), known.getOrElse(b, b))
    }
    val priorRoots: Set[Long] = known.values.toSet
    val newRemap: Map[Long, Long] = priorRoots.iterator
      .map(c => c -> uf.find(c)).filter { case (o, n) => o != n }.toMap
    val newNodes: Seq[(Long, Long)] = nodes.iterator
      .filterNot(known.contains).map(n => (n, uf.find(n))).toSeq
    if (newRemap.isEmpty && newNodes.isEmpty) return // replay no-op

    val deltaName = s"delta-v$batchId"
    val remapName = s"remap-v$batchId"
    if (newNodes.nonEmpty)
      newNodes.toDF("node", "component").coalesce(1)
        .write.mode("overwrite").parquet(s"$labelsDir/$deltaName")
    // re-target the old remap through this batch's merges, extend with
    // them: old keys are prior NON-roots, new keys prior roots —
    // disjoint, the table stays one-hop and its SIZE is old + new.
    val remapNameOut: Option[String] =
      if (newRemap.isEmpty) stOpt.flatMap(_.remap)
      else {
        val merged = oldRemap.map { case (o, t) =>
          (o, newRemap.getOrElse(t, t)) } ++ newRemap
        merged.toSeq.toDF("old_c", "new_c").coalesce(1)
          .write.mode("overwrite").parquet(s"$labelsDir/$remapName")
        Some(remapName)
      }
    val remapSize = stOpt.map(_.remapSize).getOrElse(0L) + newRemap.size
    commit(spark, fs, labelsDir, stOpt, batchId, bkts,
      if (newNodes.nonEmpty) Some(deltaName) else None,
      remapNameOut, remapSize, remapCap, deltaCap)
  }

  /** Distributed fallback above `driverEdgeCap`: the same contraction
    * as [[processFast]] expressed in DataFrames, with the
    * component-graph CC run by the star-contraction of
    * [[graft.operators.Components.connectedComponents]]. */
  private def processDistributed(spark: SparkSession, fs: FileSystem,
      labelsDir: String, stOpt: Option[CcState], bkts: Int, batchId: Long,
      e: DataFrame, remapCap: Long, deltaCap: Int): Unit = {
    val endpoints = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node"))).distinct()

    // endpoints' current roots: partition-pruned base + deltas,
    // resolved through the broadcast remap (one hop).
    val known = stOpt match {
      case None => emptyLabels(spark)
      case Some(st) =>
        val bucketIds = endpoints
          .select(pmod(xxhash64(col("node")), lit(st.buckets))
            .cast("int").as("bk"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val stored = storedLabels(spark, labelsDir, st, Some(bucketIds))
        applyRemap(spark, labelsDir, st, stored.join(endpoints, "node"))
    }
    val knownCk = known.localCheckpoint()

    // contract the batch to component-level edges (≤ 2·|batch| vertices)
    val withCa = e.join(
      knownCk.select(col("node").as("a"), col("component").as("comp_a")),
      Seq("a"), "left")
    val compEdges = withCa.join(
      knownCk.select(col("node").as("b"), col("component").as("comp_b")),
      Seq("b"), "left")
      .select(coalesce(col("comp_a"), col("a")).as("ca"),
        coalesce(col("comp_b"), col("b")).as("cb"))
      .where(col("ca") =!= col("cb")).distinct()
    val cc = graft.operators.Components
      .connectedComponents(compEdges, "ca", "cb")
      .select(col("node").as("vertex"), col("component").as("root"))
      .localCheckpoint() // detach from the CC iteration's blocks

    // merges of PRIOR roots → remap rows; new nodes → delta rows with
    // labels already resolved as of this batch.
    val priorComps = knownCk.select(col("component")).distinct()
    val newRemapEntries = cc.where(col("vertex") =!= col("root"))
      .join(priorComps, cc("vertex") === priorComps("component"), "left_semi")
      .select(col("vertex").as("old_c"), col("root").as("new_c"))
      .localCheckpoint()
    val newNodes = endpoints.join(knownCk, Seq("node"), "left_anti")
      .join(cc, col("node") === cc("vertex"), "left")
      .select(col("node"), coalesce(cc("root"), col("node")).as("component"))
      .localCheckpoint()
    val nMerged = newRemapEntries.count()
    val nNew = newNodes.count()

    if (nMerged > 0 || nNew > 0) {
      val deltaName = s"delta-v$batchId"
      val remapName = s"remap-v$batchId"
      if (nNew > 0)
        newNodes.write.mode("overwrite").parquet(s"$labelsDir/$deltaName")

      // re-target the old remap through this batch's merges, extend
      // with them: old keys are prior NON-roots, new keys prior roots
      // — disjoint, the table stays one-hop (size = old + new).
      val remapNameOut: Option[String] =
        if (nMerged == 0) stOpt.flatMap(_.remap)
        else {
          val retargeted = stOpt.flatMap(_.remap).map { r =>
            val orm = spark.read.parquet(s"$labelsDir/$r")
            orm.join(broadcast(newRemapEntries
                .select(col("old_c").as("t_old"), col("new_c").as("t_new"))),
                orm("new_c") === col("t_old"), "left")
              .select(orm("old_c"),
                coalesce(col("t_new"), orm("new_c")).as("new_c"))
          }
          (retargeted.toSeq :+ newRemapEntries.toDF())
            .reduce(_.unionByName(_))
            .write.mode("overwrite").parquet(s"$labelsDir/$remapName")
          Some(remapName)
        }
      val remapSize = stOpt.map(_.remapSize).getOrElse(0L) + nMerged
      commit(spark, fs, labelsDir, stOpt, batchId, bkts,
        if (nNew > 0) Some(deltaName) else None,
        remapNameOut, remapSize, remapCap, deltaCap)
    }
    // else: replayed or pure-duplicate batch — state already reflects
    // it (min-label merging is monotone, edge union idempotent).

    newNodes.unpersist(); newRemapEntries.unpersist(); cc.unpersist()
    knownCk.unpersist()
    ()
  }

  /** Shared commit: build the tentative state, compact if the remap
    * or delta list outgrew its cap, write the manifest, clean up. */
  private def commit(spark: SparkSession, fs: FileSystem,
      labelsDir: String, stOpt: Option[CcState], batchId: Long, bkts: Int,
      deltaName: Option[String], remapName: Option[String],
      remapSize: Long, remapCap: Long, deltaCap: Int): Unit = {
    val tentative = CcState(
      version = batchId,
      base = stOpt.flatMap(_.base),
      deltas = stOpt.map(_.deltas).getOrElse(Nil) ++ deltaName.toSeq,
      remap = remapName,
      remapSize = remapSize,
      buckets = bkts)

    val committed =
      if (remapSize > remapCap || tentative.deltas.size > deltaCap) {
        // COMPACTION: fold base ∪ deltas ∪ remap into a fresh
        // hash-partitioned base; amortized over many batches.
        val baseName = s"base-v$batchId"
        val resolved = applyRemap(spark, labelsDir, tentative,
          storedLabels(spark, labelsDir, tentative, bucketFilter = None))
        resolved
          .withColumn("bucket",
            pmod(xxhash64(col("node")), lit(bkts)).cast("int"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$labelsDir/$baseName")
        CcState(batchId, Some(baseName), Nil, None, 0L, bkts)
      } else tentative

    writeState(fs, labelsDir, committed)
    cleanup(fs, labelsDir, stOpt, committed)
    // a compaction folds this batch's own delta/remap into the new
    // base — they are in neither the prev nor the committed state,
    // so the generic cleanup above would orphan them
    tentative.dirs.filterNot(committed.dirs.toSet)
      .filterNot(stOpt.toSeq.flatMap(_.dirs).toSet)
      .foreach(d => fs.delete(new Path(s"$labelsDir/$d"), true))
  }
}
