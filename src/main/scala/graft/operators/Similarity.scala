package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Baseline: brute-force cosine top-k, expressed with
  * `zip_with`/`aggregate` array expressions (codegen-eligible, no UDF).
  * Scale path: LSH bucketing by random-hyperplane sign bits — probe
  * only same-bucket candidates, turning the n×m cross join into a
  * bucket-local join (IVF-style), then exact re-rank within bucket.
  */
object Similarity {

  /** Fixed scratch path for q90's distributed-quantizer centroids
    * (`(cell, cv)` rows; the oracle re-derives assignment + top-k from
    * the same parquet) — fixed because `oracleSql` is a static string,
    * same trade as `Tables.scratchPartitionedPath`. */
  val scratchCentroidsPath: String = "/tmp/graft_q90_centroids"

  /** Fixed scratch root for q210's persisted IVF index (`cent/` +
    * cell-partitioned `post/`) — fixed because `oracleSql` is a
    * static string, same trade as [[scratchCentroidsPath]]. */
  val scratchIvfIndexPath: String = "/tmp/graft_q210_ivf_index"

  /** Fixed scratch root for q215's incrementally-built IVF index. */
  val scratchIvfStreamPath: String = "/tmp/graft_q215_stream_ivf"

  /** Dot product as double, via the native codegen expression
    * (same index-order accumulation as the interpreted
    * aggregate(zip_with(...)) formulation — bit-equal results). */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.expressions.FloatDotProduct(a, b)

  /** Attach the L2 norm once per vector (computed before the join so
    * it isn't recomputed per candidate pair). */
  def withNorm(df: DataFrame, vecCol: String, normCol: String): DataFrame =
    df.withColumn(normCol, sqrt(dot(col(vecCol), col(vecCol))))

  /** Brute-force cosine top-k: for each query vector, the k most
    * similar candidates (self-pairs excluded). Queries are expected to
    * be a small set → broadcast side of the join; candidates stream.
    * Rank ties broken by candidate id for determinism. */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = withNorm(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "qv", "qn")
    val c = withNorm(
      candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv")),
      "cv", "cn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of projections
    * onto deterministic pseudo-random hyperplanes. Vectors in the same
    * bucket are ANN candidates. Hyperplane component h(b, i) is derived
    * from a hash so executors need no shared state or broadcast of
    * plane matrices. */
  /** Deterministic pseudo-random ±1 hyperplane components — shared by
    * the Spark plan and the DuckDB oracle SQL generator so both sides
    * compute identical buckets. */
  def planeSigns(nBits: Int, dim: Int): IndexedSeq[Array[Float]] =
    (0 until nBits).map { b =>
      Array.tabulate(dim) { i =>
        var h = b * 1000003 + i * 0x9e3779b9
        h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
        if ((h & 1) == 0) 1.0f else -1.0f
      }
    }

  def lshBucket(df: DataFrame, vecCol: String, nBits: Int, dim: Int): DataFrame = {
    val planes = planeSigns(nBits, dim)
    val bits = planes.zipWithIndex.map { case (p, b) =>
      // projection = native dot against the literal ±1 plane vector
      val proj = graft.expressions.FloatDotProduct(col(vecCol), typedLit(p))
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  /** Embedding-cosine near-duplicate pairs (dedup family): vectors in
    * the same LSH bucket with cosine >= threshold, id_a < id_b.
    * Approximate (bucket-local, like all ANN dedup at corpus scale);
    * raise `nBits` to shrink buckets, lower it to raise recall. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int, dim: Int): DataFrame = {
    val b = withNorm(
      lshBucket(df, vecCol, nBits, dim)
        .select(col(idCol).as("id"), col(vecCol).as("v"), col("bucket")),
      "v", "n")
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** INCREMENTAL INGEST SCREEN, embedding side — [[Dedup.minhashScreen]]'s
    * twin for vector columns: incoming vectors checked for near-dups
    * against a STATIC corpus via cross-side LSH-bucket collisions only
    * (never within a side), cosine-verified at `threshold`. The
    * incoming bucketed frame broadcasts (a new batch is small next to
    * the corpus), so the corpus is never shuffled; plane literals are
    * the same deterministic [[planeSigns]] both the symmetric operator
    * and the DuckDB twin use. Id spaces must be disjoint. Output:
    * (id_a = corpus id, id_b = incoming id, cosine) — the symmetric
    * [[cosineNearDupPairs]] over the union restricted to cross pairs,
    * which is how q75's oracle checks it.
    *
    * Beyond-broadcast regime (same contract as
    * [[Dedup.minhashScreen]]): past `broadcastMaxRows` incoming
    * vectors (one count of the persisted bucketed batch) the hint is
    * dropped and the collision join shuffles BOTH sides on the LSH
    * bucket — identical output, plan-guarded. */
  def cosineScreen(corpus: DataFrame, incoming: DataFrame, idCol: String,
      vecCol: String, threshold: Double, nBits: Int, dim: Int,
      broadcastMaxRows: Long = Dedup.screenBroadcastMaxRows): DataFrame = {
    def bucketed(df: DataFrame) = withNorm(
      lshBucket(df, vecCol, nBits, dim)
        .select(col(idCol).as("id"), col(vecCol).as("v"), col("bucket")),
      "v", "n")
    val bn = bucketed(incoming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val small = bn.count() <= broadcastMaxRows
    Dedup.releasingAfter(bn) {
      bucketed(corpus).as("a")
        .join((if (small) broadcast(bn) else bn).as("b"),
          col("a.bucket") === col("b.bucket"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          (dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cosine"))
        .where(col("cosine") >= threshold)
    }
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer assigns every
    * vector to its nearest centroid; queries probe only the `nProbe`
    * nearest cells and re-rank exactly inside them. The quantizer is
    * deliberately tiny (it is a routing table, not a model): trained
    * driver-side on a bounded sample, shipped as plan literals, with
    * deterministic initialization (first k sample vectors by id) and a
    * fixed iteration count so results are reproducible. Assignment and
    * scoring run through the native `FloatDotProduct`.
    *
    * At corpus scale: centroid count ~ sqrt(n) keeps cells balanced;
    * the candidate join shuffles by cell id instead of cross-joining. */
  /** Nearest centroid by squared L2, ties → lowest index — the ONE
    * assignment rule every quantizer path and spec shares. */
  private[graft] def nearestCentroid(v: Array[Float],
      centroids: Array[Array[Float]]): Int = {
    val dim = v.length
    var best = 0; var bestD = Double.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var s = 0.0; var i = 0
      while (i < dim) { val d = v(i).toDouble - c(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  /** Driver-side Lloyd iterations over a materialized sample —
    * [[ivfTopK]]'s routing-table quantizer (deterministic: seeded by
    * the first `nCentroids` sample vectors, double sums in sample
    * order, fixed iteration count). */
  private[graft] def lloyd(sample: Array[Array[Float]], nCentroids: Int,
      iters: Int): Array[Array[Float]] = {
    require(sample.length >= nCentroids, "sample smaller than centroid count")
    var centroids: Array[Array[Float]] = sample.take(nCentroids).map(_.clone())
    val dim = centroids.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(nCentroids)(new Array[Double](dim))
      val counts = new Array[Long](nCentroids)
      sample.foreach { v =>
        val best = nearestCentroid(v, centroids)
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { j =>
        if (counts(j) == 0) centroids(j)
        else Array.tabulate(dim)(i => (sums(j)(i) / counts(j)).toFloat)
      }.toArray
    }
    centroids
  }

  /** DISTRIBUTED Lloyd iterations — the 100 TB quantizer path: at
    * billions of vectors you want ~sqrt(n) ≫ 2000 centroids trained on
    * a sample far bigger than a driver collect, so assignment and the
    * per-cell sums run on the executors (one pass per iteration, no
    * shuffle — partials merge on the driver, whose size is
    * nCentroids × dim, independent of data).
    *
    * Determinism is BY CONSTRUCTION, partitioning-independent:
    *  - the sample is a pure hash predicate of the id (md5, the
    *    [[graft.operators.Splits]] trick) — same set under any layout;
    *  - seeding = first `nCentroids` sampled vectors by id (a bounded
    *    driver collect, like the driver path);
    *  - per-cell component sums accumulate EXACTLY (BigDecimal — float
    *    inputs are exact rationals), so the merged total is the same
    *    number whatever the partition count or merge order; the single
    *    rounding to double happens once, on the exact sum. Double
    *    accumulation here would drift with partition boundaries and
    *    flip borderline assignments run-to-run — the quantizer would
    *    stop being a reproducible routing table. Exact arithmetic is
    *    MUCH slower per add than a double fold (a BigDecimal
    *    allocation + arbitrary-precision add per component, roughly
    *    an order of magnitude plus GC pressure) — but it is paid on
    *    the SAMPLE only, once per iteration, which is the price of
    *    run-to-run identical cells; size `sampleOneIn` accordingly.
    *
    * Parity with [[lloyd]] is approximate by nature (the driver path
    * folds doubles in sample order); `IvfQuantizerSpec` pins both the
    * cross-partitioning bit-equality and the driver-path closeness. */
  def quantizeDistributed(candidates: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 5, sampleOneIn: Int = 1): Array[Array[Float]] = {
    require(sampleOneIn >= 1, s"sampleOneIn must be >= 1: $sampleOneIn")
    val spark = candidates.sparkSession
    import spark.implicits._
    // persisted: the seed collect plus every Lloyd iteration re-reads
    // this frame (iters+1 actions) — without the cache the source
    // table would be re-scanned per pass (CLAUDE.md multi-consumer
    // convention, as in jaccardPairs)
    val sampled = candidates
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(sampleOneIn)) === 0)
      .as[(Long, Array[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed: Array[Array[Float]] = sampled.orderBy(col("id"))
        .limit(nCentroids).collect().map(_._2)
      require(seed.length >= nCentroids, "sample smaller than centroid count")
      var centroids = seed.map(_.clone())
      val dim = centroids.head.length
      for (_ <- 0 until iters) {
        val bc = spark.sparkContext.broadcast(centroids)
        val zeroSums = () => Array.fill(bc.value.length, dim)(java.math.BigDecimal.ZERO)
        val (sums, counts) = sampled.rdd
          .mapPartitions { it =>
            val cs = bc.value
            val s = Array.fill(cs.length, dim)(java.math.BigDecimal.ZERO)
            val n = new Array[Long](cs.length)
            it.foreach { case (_, v) =>
              val best = nearestCentroid(v, cs)
              n(best) += 1
              var i = 0
              while (i < dim) {
                // BigDecimal(double-of-float) is the float's exact value
                s(best)(i) = s(best)(i).add(new java.math.BigDecimal(v(i).toDouble))
                i += 1
              }
            }
            Iterator.single((s, n))
          }
          .fold((zeroSums(), new Array[Long](centroids.length))) { case ((sa, na), (sb, nb)) =>
            var j = 0
            while (j < sa.length) {
              na(j) += nb(j)
              var i = 0
              while (i < dim) { sa(j)(i) = sa(j)(i).add(sb(j)(i)); i += 1 }
              j += 1
            }
            (sa, na)
          }
        bc.destroy()
        centroids = centroids.indices.map { j =>
          if (counts(j) == 0) centroids(j)
          // one rounding, applied to the EXACT sum: partition-independent
          else Array.tabulate(dim)(i => (sums(j)(i).doubleValue() / counts(j)).toFloat)
        }.toArray
      }
      centroids
    } finally sampled.unpersist()
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int, nProbe: Int,
      sampleSize: Int = 2000, iters: Int = 5): DataFrame = {
    // 1. bounded deterministic sample -> driver k-means
    val sample: Array[Array[Float]] = candidates
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getAs[scala.collection.Seq[Float]](1).toArray)
    ivfTopKWithCentroids(queries, candidates, idCol, vecCol, k,
      lloyd(sample, nCentroids, iters), nProbe)
  }

  /** [[ivfTopK]] with an externally-trained quantizer (e.g.
    * [[quantizeDistributed]]); the probe/re-rank machinery is identical
    * — centroids become plan literals either way. */
  /** Per-cell `(d, cell)` structs for quantizer assignment: argmin
    * ||v||²-2v.c+||c||² == argmin (||c||² - 2 v.c), ties → lowest cell
    * id (struct compare is field-order lexicographic). Centroids are
    * plan literals; ||c||² is folded in index order on the driver —
    * the same double fold DuckDB's `list_dot_product(cv, cv)` runs, so
    * oracles re-derive d bit-exactly. Shared by every quantizer
    * consumer ([[ivfTopKWithCentroids]], [[semDedup]]). */
  private[graft] def cellScores(vec: org.apache.spark.sql.Column,
      centroids: Array[Array[Float]]) =
    centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x.toDouble * x).sum
      struct((lit(c2) - lit(2.0) * graft.expressions.FloatDotProduct(
        vec, typedLit(c))).as("d"), lit(j).as("cell"))
    }

  def ivfTopKWithCentroids(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Float]], nProbe: Int): DataFrame = {
    // 2. cell assignment via the shared cellScores expression
    def nearestCell(vec: org.apache.spark.sql.Column) =
      array_min(array(cellScores(vec, centroids): _*)).getField("cell")
    def probeCells(vec: org.apache.spark.sql.Column, p: Int) =
      transform(slice(array_sort(array(cellScores(vec, centroids): _*)), 1, p),
        s => s.getField("cell"))

    val c = withNorm(candidates.select(col(idCol).as("cand_id"),
        col(vecCol).as("cv")), "cv", "cn")
      .withColumn("cell", nearestCell(col("cv")))
    val q = withNorm(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv")), "qv", "qn")
      .withColumn("cell", explode(probeCells(col("qv"), nProbe)))
    // 3. cell-local exact re-rank
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** PERSISTED IVF INDEX, build side — the build-once/query-many form
    * of [[ivfTopK]]: the trained centroid table lands in `path/cent`
    * and the assigned postings in `path/post` PARTITIONED BY cell, so
    * a later query run prunes to its probed cells' DIRECTORIES
    * instead of scanning the corpus — the layout that makes ANN
    * serving viable at 100 TB (each query batch reads ~nProbe/
    * nCentroids of the index, and the build cost amortizes over every
    * subsequent lookup). Same deterministic trainer as [[ivfTopK]]
    * (id-ordered sample → driver Lloyd), and parquet round-trips
    * float32 exactly, so the oracle re-derives probe + re-rank from
    * the persisted bytes alone. */
  def ivfIndexWrite(candidates: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int, sampleSize: Int = 2000,
      iters: Int = 5): Unit = {
    // postings are APPENDED (the streaming-arrival path reuses this);
    // a one-shot build must start from an empty directory
    val fs = org.apache.hadoop.fs.FileSystem
      .get(candidates.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/post"), true)
    ivfCentWrite(candidates, idCol, vecCol, path, nCentroids,
      sampleSize, iters)
    ivfIndexAppend(candidates, idCol, vecCol, path, batchId = 0L)
  }

  /** Trains the coarse quantizer (id-ordered sample → driver Lloyd,
    * the [[ivfTopK]] discipline) and persists ONLY the centroid table
    * — fixing the router before any postings exist, which is how a
    * streaming index build works (the quantizer must not drift while
    * batches arrive, or earlier postings land in cells a later router
    * wouldn't route to). */
  def ivfCentWrite(candidates: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int, sampleSize: Int = 2000,
      iters: Int = 5): Unit = {
    val spark = candidates.sparkSession
    val sample: Array[Array[Float]] = candidates
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getAs[scala.collection.Seq[Float]](1).toArray)
    val centroids = lloyd(sample, nCentroids, iters)
    import spark.implicits._
    centroids.toSeq.zipWithIndex.map { case (c, j) => (j, c) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cent")
  }

  /** Assigns one batch with the STORED centroids and appends it to
    * the cell-partitioned postings. Assignment is a pure per-row
    * function of the fixed centroid table, so the index is a pure
    * function of the posting MULTISET — any batching of the corpus
    * (including micro-batch streaming arrival, q215) builds the
    * byte-equal index a one-shot [[ivfIndexWrite]] would.
    *
    * EXACTLY-ONCE under at-least-once delivery: each batch owns the
    * directory `post/__bid=<batchId>/`, written with OVERWRITE — a
    * crash-replayed micro-batch (same batchId) re-derives the same
    * rows and replaces its own directory instead of appending a
    * duplicate copy (assignment is deterministic, so the rewrite is
    * content-identical). Readers treat `__bid` as just another hive
    * partition level and never select it; cell-level directory
    * pruning is unaffected because `cell` remains a partition key. */
  def ivfIndexAppend(batch: DataFrame, idCol: String, vecCol: String,
      path: String, batchId: Long): Unit = {
    // batchId is REQUIRED (no default): two appends silently sharing
    // an id would overwrite each other's `__bid=` dir — the replay
    // contract is same-id == same-content, distinct batches get
    // distinct ids
    val spark = batch.sparkSession
    val centroids: Array[Array[Float]] = spark.read.parquet(s"$path/cent")
      .orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray)
    def nearestCell(vec: org.apache.spark.sql.Column) =
      array_min(array(cellScores(vec, centroids): _*)).getField("cell")
    // one shuffle on cell so each partition directory is written by
    // one task (no tiny-file explosion at 1000 executors)
    batch.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("cell", nearestCell(col("cv")))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/post/__bid=$batchId")
  }

  /** PERSISTED IVF INDEX, query side: rebuilds the router from the
    * tiny centroid table (O(nCentroids·dim) — a driver literal, the
    * same shape every IVF consumer uses), probes `nProbe` cells and
    * exact-cosine re-ranks INSIDE the probed partitions. The probed
    * cell set is collected first — bounded by nCentroids ints no
    * matter how large the query batch — and applied as a LITERAL
    * partition filter, so the postings scan statically prunes to the
    * probed directories (`IvfIndexSpec` pins numFiles < cells; DPP
    * would be heuristic, a literal isin is guaranteed). */
  def ivfIndexTopK(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, idCol: String, vecCol: String, path: String,
      k: Int, nProbe: Int): DataFrame = {
    val centroids: Array[Array[Float]] = spark.read.parquet(s"$path/cent")
      .orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray)
    def probeCells(vec: org.apache.spark.sql.Column) =
      transform(
        slice(array_sort(array(cellScores(vec, centroids): _*)), 1, nProbe),
        st => st.getField("cell"))
    val q = withNorm(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv")), "qv", "qn")
      .withColumn("cell", explode(probeCells(col("qv"))))
    val probed: Array[Int] =
      q.select("cell").distinct().collect().map(_.getInt(0))
    val post = withNorm(spark.read.parquet(s"$path/post")
      .where(col("cell").isin(probed.map(Integer.valueOf): _*)), "cv", "cn")
    val scored = post.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF/LSH-bucketed ANN: join query and candidate sides on bucket id,
    * exact cosine re-rank within bucket. Misses across bucket walls are
    * the approximation cost; [[annTopKMultiProbe]] recovers them. */
  def annTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int, dim: Int): DataFrame =
    annTopKMultiProbe(queries, candidates, idCol, vecCol, k, nBits, dim,
      nProbe = 1)

  /** Multi-probe LSH ANN (Lv et al., "Multi-Probe LSH", VLDB'07):
    * each query probes its own bucket PLUS the buckets reached by
    * flipping its `nProbe - 1` smallest-margin sign bits — the
    * hyperplanes the query sits closest to, which are exactly the bits
    * most likely to differ for a true neighbor across a bucket wall.
    * Only the (small, broadcast) query side explodes nProbe-fold; the
    * candidate side keeps one bucket per vector, so the join stays a
    * bucket-local equi-join at any corpus size.
    *
    * Formulated without higher-order lambdas: the probe array inlines
    * the bucket/margin subexpressions and whole-stage codegen CSE
    * evaluates each plane projection once (a `transform` lambda would
    * re-evaluate them per probe, interpreted — CLAUDE.md note). */
  def annTopKMultiProbe(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int, dim: Int,
      nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= nBits + 1,
      s"nProbe must be in [1, nBits + 1]: $nProbe")
    // flip masks are built as pow(2.0, bit): exact only while the bit
    // index fits double's 53-bit mantissa (any realistic LSH uses far
    // fewer planes; 2^52 buckets is not a realistic table)
    require(nProbe == 1 || nBits <= 52,
      s"multi-probe flip masks require nBits <= 52: $nBits")
    val planes = planeSigns(nBits, dim)
    def projs(v: org.apache.spark.sql.Column) =
      planes.map(p => graft.expressions.FloatDotProduct(v, typedLit(p)))
    def bucketOf(v: org.apache.spark.sql.Column) =
      projs(v).zipWithIndex.map { case (pr, b) =>
        when(pr > 0, lit(1L << b)).otherwise(lit(0L)) }.reduce(_ + _)
    // margin-ordered flip sequence: (|proj|, bit) structs sorted
    // ascending — field order makes bit index the deterministic tiebreak
    def flipsOf(v: org.apache.spark.sql.Column) =
      array_sort(array(projs(v).zipWithIndex.map { case (pr, b) =>
        struct(abs(pr).as("m"), lit(b).as("b")) }: _*))
    def probesOf(v: org.apache.spark.sql.Column) = {
      val bucket = bucketOf(v)
      val flips = flipsOf(v)
      array(bucket +: (1 until nProbe).map { i =>
        // 2^b exact in double for b < 53; xor flips the chosen sign bit
        bucket.bitwiseXOR(
          pow(lit(2.0), element_at(flips, i).getField("b").cast("double"))
            .cast("long"))
      }: _*)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", explode(probesOf(col("qv"))))
    val c = lshBucket(candidates, vecCol, nBits, dim)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("bucket"))
    val qn = withNorm(q, "qv", "qn")
    val cn = withNorm(c, "cv", "cn")
    val raw = cn.join(broadcast(qn), Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    // multi-probe only: a candidate can surface via several probed
    // buckets — one row per (query, cand) before ranking (cosine is
    // pair-determined). Single-probe pairs are unique by construction;
    // skipping the dedup keeps that plan shuffle-free before the window.
    val scored =
      if (nProbe > 1) raw.dropDuplicates("query_id", "cand_id") else raw
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Fixed scratch path for q101's SemDeDup centroids — separate from
    * [[scratchCentroidsPath]] so q101 never depends on q90 having run
    * (catalog queries must be order-independent). */
  val scratchSemCentroidsPath: String = "/tmp/graft_q101_centroids"

  /** SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with a coarse
    * quantizer, then drop every vector that has a near-duplicate
    * (cosine >= `tau`) of HIGHER PRIORITY within its cluster, where
    * priority = (distance to centroid asc, id asc) — the deterministic
    * "keep the most central exemplar" rule. Comparisons never cross
    * cluster walls (that is SemDeDup's approximation, and its cost
    * bound: pairs are Σ cell² instead of n²).
    *
    * Output: one row per vector — `(vec_id, cell, cd, kept)` with `cd`
    * the centroid distance surrogate ||c||²-2v·c (bit-exact across
    * engines — same index-order double folds as q90, so the oracle
    * needs no rounding).
    *
    * 100 TB shape: assignment is a codegen scan against centroid
    * literals (the [[quantizeDistributed]] output — nCentroids ~
    * sqrt(n) keeps cells balanced); the within-cell pair join shuffles
    * both sides once on the cell id; the assignment lineage has three
    * consumers (both join sides + the final label join), so it is
    * persisted inside the operator and the result is materialized
    * before release (CLAUDE.md eager-operator convention — the
    * returned frame is checkpointed, caller need not manage caches).
    */
  /** Product-quantization codebooks: the vector space is split into
    * `m` contiguous subspaces of `dim/m` components and each subspace
    * gets its own `ksub`-centroid quantizer, trained per subspace by
    * the same deterministic [[lloyd]] (seed = first `ksub` sample
    * subvectors by id, fixed iteration count). With `iters = 0` the
    * codebook IS the first `ksub` sample vectors' slices — a pure
    * function of the data that a SQL oracle can re-derive (the q40
    * trick); `iters > 0` is the trained path, spec-covered. */
  def pqCodebooks(candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, sampleSize: Int = 2000, iters: Int = 0)
      : Array[Array[Array[Float]]] = {
    val sample: Array[Array[Float]] = candidates
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getAs[scala.collection.Seq[Float]](1).toArray)
    require(sample.nonEmpty && sample.head.length % m == 0,
      s"dim ${sample.headOption.fold(0)(_.length)} not divisible by m=$m")
    val d = sample.head.length / m
    Array.tabulate(m) { j =>
      lloyd(sample.map(_.slice(j * d, (j + 1) * d)), ksub, iters)
    }
  }

  /** PQ asymmetric-distance top-k (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011) — the memory-compressed
    * ANN path: candidates are stored as `m` small codes (m bytes/vector
    * at ksub <= 256) instead of `dim` floats, and each query scans the
    * CODES with a per-query distance table, never touching the raw
    * corpus vectors.
    *
    * - encode: per subspace j, code_j = argmin_c ||v_j - c||², computed
    *   as argmin(||c||² - 2 v_j·c) with ties → lowest code (the shared
    *   [[nearestCentroid]] rule, as a codegen expression over codebook
    *   literals — one zero-shuffle scan over the corpus).
    * - query: distance table dtab[j][c] = ||c||² - 2 q_j·c (m × ksub
    *   doubles, built once per query row); ADC score of a candidate is
    *   the j-ordered left fold Σ_j dtab[j][code_j] — rank-equivalent to
    *   ||q - v̂||² (the constant ||q_j||² terms shift every candidate
    *   equally).
    * - top-k per query by (adc asc, cand_id) via window rank.
    *
    * 100 TB shape: queries (with their tables) broadcast; the candidate
    * side is a linear scan of the code column — no shuffle, no
    * per-candidate vector reads. Every double fold is index-ordered, so
    * the DuckDB oracle re-derives codes, tables and ADC sums bit-exactly
    * (q118) — no rounding needed. */
  def pqTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int, ksub: Int,
      sampleSize: Int = 2000, iters: Int = 0): DataFrame = {
    val codebooks = pqCodebooks(candidates, idCol, vecCol, m, ksub,
      sampleSize, iters)
    // native codegen kernels (PqEncode/PqDistTable/PqAdc): the
    // Column-API formulation (array_min over ksub structs per
    // subspace, aggregate() ADC fold) evaluates interpreted and was
    // ~8x the wall on the corpus scan; the kernel runs the SAME
    // index-ordered arithmetic (bit-parity contract in Pq.scala), so
    // the oracle is untouched
    val kernel = new graft.expressions.PqKernel(codebooks)
    val c = candidates
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("codes", graft.expressions.Pq.encode(col("cv"), kernel))
      .select("cand_id", "codes")
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("dtab", graft.expressions.Pq.distTable(col("qv"), kernel))
      .select("query_id", "dtab")
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        graft.expressions.Pq.adc(col("codes"), col("dtab"), kernel).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** [[pqTopK]] + exact re-rank (IVFADC-with-refinement, Jégou 2011
    * §V): the ADC pass shortlists `shortlist` candidates per query on
    * codes alone, then ONLY those rows join back to their raw vectors
    * for an exact L2 re-rank to top-k. The corpus-sized scan still
    * never touches vectors — the exact pass reads `shortlist ×
    * queries` vectors, not n. This is the accuracy path (ADC alone is
    * deliberately lossy — spec'd recall floor); q118 gates the pure
    * ADC ranking, whose folds the oracle replays bit-exactly. */
  def pqTopKRefined(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int, m: Int,
      ksub: Int, sampleSize: Int = 2000, iters: Int = 0): DataFrame = {
    val short = pqTopK(queries, candidates, idCol, vecCol, shortlist,
      m, ksub, sampleSize, iters).select("query_id", "cand_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    // exact d2 up to the per-query constant ||q||^2 — rank-equivalent
    val d2 = (dot(col("cv"), col("cv")) -
      lit(2.0) * dot(col("qv"), col("cv"))).as("d2")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cand_id"))
    short.join(c, "cand_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("cand_id"), d2)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-PQ (IVFADC — Jégou et al. 2011 §IV): the combined
    * billion-scale ANN index. A coarse quantizer routes every vector
    * to a cell ([[cellScores]], the q40 assignment rule); the vector
    * is then stored as `m` PQ codes of its RESIDUAL `v − centroid`
    * (residuals concentrate near zero, so a small codebook covers
    * them; and because `‖q−v‖ = ‖(q−c)−(v−c)‖` within a cell, ADC
    * scores on residuals are directly comparable across probed cells
    * — no per-cell offset). A query probes its `nProbe` nearest
    * cells, builds one distance table per probed cell from its OWN
    * residual there, and scans only those cells' codes.
    *
    * Determinism/oracle contract: coarse centroids and residual
    * codebooks use the q118 zero-literal trick (`iters = 0` → first
    * `nCentroids` sample vectors / first `ksub` residual slices, by
    * id), so a SQL oracle re-derives the whole index from the table
    * itself. Residuals are double subtractions of exact float inputs
    * rounded once to float (IEEE, both engines); every PQ fold is the
    * q118 index-ordered double fold (bit-parity contract in
    * Pq.scala). Trained quantizers (`coarseIters`/`pqIters` > 0) are
    * the production path, spec-covered.
    *
    * 100 TB shape: the corpus scan is codegen PQ kernels over
    * centroid/codebook literals (zero shuffle; the residual zip_with
    * is the one interpreted step — swap for a fused kernel if it
    * shows up at scale); queries+tables broadcast; the per-cell scan
    * reads `m` bytes per candidate, not `dim` floats. The
    * intermediate (cell, residual) frame has two consumers (codebook
    * sample + encode scan) → persisted inside, result materialized,
    * per the eager-operator convention. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int, nProbe: Int, m: Int,
      ksub: Int, sampleSize: Int = 2000, coarseIters: Int = 0,
      pqIters: Int = 0): DataFrame = {
    val sample: Array[Array[Float]] = candidates
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize)
      .collect().map(_.getAs[scala.collection.Seq[Float]](1).toArray)
    val cents = lloyd(sample, nCentroids, coarseIters)
    val centsD: Seq[Seq[Double]] = cents.map(_.map(_.toDouble).toSeq).toSeq
    def nearestCell(vec: org.apache.spark.sql.Column) =
      array_min(array(cellScores(vec, cents): _*)).getField("cell")
    def probeCells(vec: org.apache.spark.sql.Column) =
      transform(slice(array_sort(array(cellScores(vec, cents): _*)),
        1, nProbe), s => s.getField("cell"))
    // v − centroid[cell], double math, one float rounding — the
    // centroid lookup is an argument of zip_with (evaluated once per
    // row), not captured inside the lambda
    def residual(vec: org.apache.spark.sql.Column,
        cellCol: org.apache.spark.sql.Column) =
      zip_with(vec.cast("array<double>"),
        element_at(typedLit(centsD), cellCol.cast("int") + 1),
        (a, b) => a - b).cast("array<float>")

    val cr = candidates
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("cell", nearestCell(col("cv")))
      .withColumn("rv", residual(col("cv"), col("cell")))
      .select("cand_id", "cell", "rv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val codebooks = pqCodebooks(cr, "cand_id", "rv", m, ksub,
        sampleSize, pqIters)
      val kernel = new graft.expressions.PqKernel(codebooks)
      val c = cr.withColumn("codes",
          graft.expressions.Pq.encode(col("rv"), kernel))
        .select("cand_id", "cell", "codes")
      val q = queries
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("cell", explode(probeCells(col("qv"))))
        .withColumn("dtab", graft.expressions.Pq.distTable(
          residual(col("qv"), col("cell")), kernel))
        .select("query_id", "cell", "dtab")
      val scored = c.join(broadcast(q), Seq("cell"))
        .where(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          graft.expressions.Pq.adc(col("codes"), col("dtab"), kernel)
            .as("adc"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc").asc, col("cand_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
        .localCheckpoint() // materialize before releasing the persist
    } finally cr.unpersist()
  }

  /** [[ivfPqTopK]] + exact re-rank (IVFADC+R, Jégou 2011 §V applied
    * to the combined index — the q119 refinement inside probed
    * cells): ADC shortlists `shortlist` candidates per query from the
    * probed cells' codes alone, then ONLY those rows join back to
    * their raw vectors for an exact L2 re-rank to top-k. This is the
    * SHIP configuration: pure residual-ADC ranking at 16-code
    * fidelity is deliberately lossy (IvfPqSpec pins its honest 0.06
    * floor — and documents that deeper probes GENUINELY LOWER pure-ADC
    * recall on i.i.d. vectors), while the refined path re-ranks with
    * exact distances and recovers recall ≥ 0.8 at nProbe = 8
    * (spec-pinned). The corpus-sized scan still reads `m` bytes per
    * candidate; the exact pass reads `shortlist × queries` vectors,
    * not n. */
  def ivfPqTopKRefined(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      nCentroids: Int, nProbe: Int, m: Int, ksub: Int,
      sampleSize: Int = 2000, coarseIters: Int = 0,
      pqIters: Int = 0): DataFrame = {
    val short = ivfPqTopK(queries, candidates, idCol, vecCol, shortlist,
        nCentroids, nProbe, m, ksub, sampleSize, coarseIters, pqIters)
      .select("query_id", "cand_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    // exact d2 up to the per-query constant ||q||^2 — rank-equivalent
    val d2 = (dot(col("cv"), col("cv")) -
      lit(2.0) * dot(col("qv"), col("cv"))).as("d2")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cand_id"))
    short.join(c, "cand_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("cand_id"), d2)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** SQ8 scalar quantization ANN (the FAISS `SQ8` index family,
    * completing LSH/IVF/PQ/IVF-PQ): every vector compresses to one
    * byte per DIMENSION — code_i = clamp(floor((v_i − min_i) /
    * scale_i), 0..255) against per-dimension corpus min/max, with
    * scale_i = (max_i − min_i)/255 — and queries score against the
    * DEQUANTIZED floats (min_i + code_i·scale_i, rounded once to
    * float), never the raw corpus. 4× smaller than float32 at far
    * higher fidelity than PQ's m bytes; the usual middle rung.
    *
    * Determinism/oracle contract: min/max are order-invariant exact
    * doubles; scale, code and dequantized value are fixed chains of
    * IEEE double ops + one float rounding, identical in SQL; the
    * score is the q118-style index-ordered double fold
    * (FloatDotProduct ≡ `list_dot_product` over DOUBLE casts). No
    * rounding contract needed anywhere.
    *
    * 100 TB shape: the train pass here is a posexplode aggregate
    * (dim× expand — at corpus scale swap for a per-partition
    * array-fold partial aggregate, the q158 sketch-profiler note);
    * encode + score are zero-shuffle codegen scans against 2·dim
    * literals (the per-dim expressions are unrolled statically — no
    * interpreted higher-order functions in the hot path); queries
    * broadcast. */
  def sq8TopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val mm = candidates
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
    val mins = mm.map(_.getDouble(1))
    val scales = mm.map(r => if (r.getDouble(2) > r.getDouble(1))
      (r.getDouble(2) - r.getDouble(1)) / 255.0 else 0.0)
    val dim = mm.length
    def codesOf(vec: org.apache.spark.sql.Column) =
      array((0 until dim).map { i =>
        if (scales(i) == 0.0) lit(0)
        else least(lit(255), greatest(lit(0),
          floor((element_at(vec, i + 1).cast("double") - lit(mins(i)))
            / lit(scales(i))).cast("int")))
      }: _*)
    def dequant(codes: org.apache.spark.sql.Column) =
      array((0 until dim).map { i =>
        (lit(mins(i)) + element_at(codes, i + 1).cast("double")
          * lit(scales(i))).cast("float")
      }: _*)
    val c = candidates
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("codes", codesOf(col("cv")))
      .select(col("cand_id"), dequant(col("codes")).as("vh"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        dot(col("qv"), col("vh")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], tau: Double): DataFrame = {
    val assigned = withNorm(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("v")), "v", "nrm")
      .withColumn("sc", array_min(array(cellScores(col("v"), centroids): _*)))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("sc").getField("cell").cast("long").as("cell"),
        col("sc").getField("d").as("cd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val u = assigned.select(col("cell"), col("vec_id").as("uid"),
        col("v").as("uv"), col("nrm").as("un"), col("cd").as("ucd"))
      val dropped = assigned.join(u, Seq("cell"))
        .where(col("ucd") < col("cd") ||
          (col("ucd") === col("cd") && col("uid") < col("vec_id")))
        .where(dot(col("uv"), col("v")) / (col("un") * col("nrm")) >= tau)
        .select("vec_id").distinct()
      assigned
        .join(dropped.withColumn("k0", lit(false)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), col("cd"),
          coalesce(col("k0"), lit(true)).as("kept"))
        .localCheckpoint() // materialize before releasing the cache
    } finally assigned.unpersist()
  }
}
