package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.operators.MergeInto

/** LOG-STRUCTURED versioned snapshot for streaming MERGE INTO — the
  * incremental materialized-dimension table maintained per micro-batch
  * WITHOUT rewriting the whole base (the `StreamingComponents`
  * discipline applied to CDC apply).
  *
  * == Layout ==
  *
  * State under `dir` is bucket files tied together by a versioned
  * manifest:
  *
  *   - `v<j>/__bkt=<k>/` — bucket `k`'s versioned-state rows as of the
  *     batch that produced version `j`, hash-bucketed by
  *     `pmod(xxhash64(key), buckets)` and written via
  *     `partitionBy("__bkt")` so bucket reads are DIRECTORY-pruned
  *     (the bucket is a pure function of the key — recomputed, never
  *     trusted from data);
  *   - `_MANIFEST.v<j>` — one line per live bucket mapping it to the
  *     version dir holding its current rows. Untouched buckets keep
  *     pointing at older dirs — that is the whole point.
  *
  * Rows are [[MergeInto]] VERSIONED state: payload + the winning
  * change's (ts, id) + a delete tombstone. Tombstones make sequential
  * apply correct under ARBITRARY cross-batch arrival order (an older
  * 'U' landing after the 'D' that beat it cannot resurrect the key);
  * [[read]] filters them out.
  *
  * == Per-batch cost (the 100 TB argument) ==
  *
  * A batch touches only the buckets its change keys hash to:
  * O(|batch| + touched-bucket rows) read + rewritten, never O(base).
  * With `buckets` sized so a bucket holds a few hundred MB (scale the
  * count with the corpus, as `StreamingComponents.defaultBuckets`
  * documents), a bounded change batch costs bounded IO regardless of
  * base size — the `stream_merge_batch` probe pins this flat against
  * a 1×/2×/4× base. Version dirs accumulate one per effective batch;
  * when the manifest references more than `compactAfter` distinct
  * dirs, the next apply folds everything into ONE fresh version
  * (amortized O(state), bounded by state size, not batch count).
  *
  * == Commit protocol ==
  *
  * Write the new version dir, then a fresh `_MANIFEST.v<j>` (tmp file
  * + atomic rename to a NEW name), then delete superseded manifests
  * and unreferenced version dirs. Readers take the highest manifest
  * present, so a crash leaves either the old or the new state fully
  * intact. A replayed batch finds every change tied on (ts, id) and
  * losing to the stored version — the merge is a no-op rewrite of the
  * same touched buckets (idempotent under at-least-once delivery).
  *
  * Reference anchor: the reference's point-upsert store commits each
  * batch through one HBase put per row
  * (`/root/reference/marketdb-core/src/main/scala/com/ergodicity/marketdb/core/MarketDb.scala:103-133`);
  * here the same contract is a bucketed parquet log + manifest. */
final case class SnapshotStore(dir: String, keyCol: String,
    tsCol: String, idCol: String, opCol: String,
    payloadCols: Seq[String], buckets: Int,
    compactAfter: Int = 16) {

  private val BktCol = "__bkt"
  private val ManifestName = """_MANIFEST\.v(\d{19})""".r

  private def manifestFile(version: Long): String =
    f"_MANIFEST.v$version%019d"

  private def bkt = pmod(xxhash64(col(keyCol)), lit(buckets.toLong))

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** (version, bucket -> version-dir-name). Highest manifest wins. */
  private[graft] def readManifest(spark: SparkSession)
      : Option[(Long, Map[Int, String])] = {
    val f = fs(spark)
    val d = new Path(dir)
    if (!f.exists(d)) return None
    val versions = f.listStatus(d).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(v) => Some((v.toLong, st.getPath))
        case _ => None
      }
    }
    if (versions.isEmpty) return None
    val (version, path) = versions.maxBy(_._1)
    val in = f.open(path)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
    val entries = text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map { l => val i = l.indexOf('='); (l.take(i).toInt, l.drop(i + 1)) }
      .toMap
    Some((version, entries))
  }

  private def writeManifest(f: FileSystem, version: Long,
      entries: Map[Int, String]): Unit = {
    val body = entries.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("\n")
    val tmp = new Path(s"$dir/${manifestFile(version)}.tmp")
    val dst = new Path(s"$dir/${manifestFile(version)}")
    // pre-existing dst = a replay of this batch crashed after its
    // rename; content re-derives deterministically, so keep it (a
    // delete-then-rename would open a zero-manifest window)
    if (f.exists(dst)) return
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    f.rename(tmp, dst)
  }

  private def cleanup(f: FileSystem, cur: Long,
      entries: Map[Int, String]): Unit = {
    val live = entries.values.toSet
    f.listStatus(new Path(dir)).foreach { st =>
      st.getPath.getName match {
        case ManifestName(v) if v.toLong < cur => f.delete(st.getPath, false)
        case n if n.startsWith("v") && !live.contains(n) &&
            !n.endsWith(".tmp") => f.delete(st.getPath, true)
        case _ => ()
      }
    }
  }

  /** Versioned-state rows of `which` buckets (all if None), each read
    * from its manifest-pointed version dir with directory-level
    * partition pruning on `__bkt`. */
  private def stateRows(spark: SparkSession,
      entries: Map[Int, String], which: Option[Set[Int]]): Option[DataFrame] = {
    val wanted = which.fold(entries)(w =>
      entries.view.filterKeys(w).toMap)
    val cols = (keyCol +: payloadCols) ++ Seq(MergeInto.VersionTsCol,
      MergeInto.VersionIdCol, MergeInto.TombstoneCol)
    val parts = wanted.groupBy(_._2).map { case (vdir, bs) =>
      spark.read.parquet(s"$dir/$vdir")
        .where(col(BktCol).isin(bs.keys.toSeq.map(Integer.valueOf): _*))
        .select(cols.map(col): _*)
    }.toSeq
    parts.reduceOption(_.unionByName(_))
  }

  /** Seed version 0 from a plain base snapshot (full write — done
    * once; every later batch rewrites only touched buckets). */
  def init(base: DataFrame, tsType: DataType, idType: DataType): Unit = {
    val spark = base.sparkSession
    val f = fs(spark)
    f.delete(new Path(dir), true)
    val state = MergeInto.initState(base, keyCol, payloadCols,
      tsType, idType)
    val vdir = "v0"
    state.withColumn(BktCol, bkt)
      .write.mode("overwrite").partitionBy(BktCol).parquet(s"$dir/$vdir")
    writeManifest(f, 0L, writtenBuckets(f, vdir).map(_ -> vdir).toMap)
  }

  /** Buckets present in a just-written version dir — a driver FS
    * listing of the `__bkt=` subdirs, no data read. */
  private def writtenBuckets(f: FileSystem, vdir: String): Seq[Int] =
    f.listStatus(new Path(s"$dir/$vdir")).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(s"$BktCol="))
        Some(n.drop(BktCol.length + 1).toInt)
      else None
    }

  /** Fold one change batch into the store: read ONLY the buckets the
    * batch's keys hash to, merge under the version guard, write them
    * to a new version dir, commit the manifest. `batchId` must be
    * monotone (the streaming engine's) — it names the version. */
  def applyBatch(changes: DataFrame, batchId: Long): Unit = {
    val spark = changes.sparkSession
    val f = fs(spark)
    val (curVer, entries) = readManifest(spark)
      .getOrElse((-1L, Map.empty[Int, String]))
    val version = math.max(curVer + 1, batchId + 1)
    // distinct buckets of the batch's keys — bounded by |batch|
    val touched = changes.select(bkt.cast("int").as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return
    val compact = entries.values.toSet.size > compactAfter
    val scope = if (compact) None else Some(touched)
    // touched buckets absent from the manifest simply have no state
    // rows yet — fall back to a TYPED empty state shaped like the
    // change feed (all-new-key batches hit this)
    val cur = stateRows(spark, entries, scope).getOrElse(
      MergeInto.initState(
        changes.select(col(keyCol) +: payloadCols.map(col): _*)
          .where(lit(false)),
        keyCol, payloadCols,
        changes.schema(changes.schema.fieldIndex(tsCol)).dataType,
        changes.schema(changes.schema.fieldIndex(idCol)).dataType))
    // every change key hashes into `touched` by construction, so the
    // batch needs no bucket filter of its own
    val next = MergeInto.applyVersioned(cur, changes, keyCol,
      tsCol, idCol, opCol, payloadCols)
    val vdir = s"v$version"
    // overwrite: a replay whose prior attempt crashed between the dir
    // write and the manifest rename re-derives the same content
    next.withColumn(BktCol, bkt)
      .write.mode("overwrite").partitionBy(BktCol).parquet(s"$dir/$vdir")
    val written = writtenBuckets(f, vdir).toSet
    val newEntries =
      if (compact) written.map(_ -> vdir).toMap
      else entries ++ written.map(_ -> vdir)
    writeManifest(f, version, newEntries)
    cleanup(f, version, newEntries)
  }

  /** The published snapshot: all buckets, tombstones filtered. */
  def read(spark: SparkSession): DataFrame =
    MergeInto.publish(readState(spark), keyCol, payloadCols)

  /** Raw versioned state incl. tombstones (specs + probes). */
  private[graft] def readState(spark: SparkSession): DataFrame = {
    val entries = readManifest(spark).map(_._2)
      .getOrElse(sys.error(s"SnapshotStore.read before init: $dir"))
    stateRows(spark, entries, None)
      .getOrElse(sys.error(s"SnapshotStore at $dir has an empty manifest"))
  }
}
