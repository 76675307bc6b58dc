package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication family for corpus-scale pipelines.
  *
  * The reference's only dedup is storage idempotency: row key + event-id
  * qualifier overwrite with `VERSIONS => 1`
  * (`marketdb-core/.../model/Trade.scala:56-59`,
  * `install/create_tables.sh:37`) — re-ingesting an event replaces it.
  * `firstByKey` reproduces that semantics relationally; the rest are
  * the near-dup operators a 100 TB training-data pipeline needs
  * (exact hash, MinHash+LSH banding, SimHash, n-gram Jaccard).
  *
  * Scale notes: every variant is a single hash-partitioned
  * shuffle-by-key (groupBy) or a bucket-join on short hash keys — no
  * cross join ever touches full documents. The Jaccard verifier joins
  * on shingles, whose frequency is bounded by construction (k-shingles
  * over natural text are near-unique), and candidate pairs from LSH are
  * a tiny fraction of n².
  */
object Dedup {

  /** Materialize `result` while the persisted intermediates are hot,
    * then release them: repeated operator invocations in a long-lived
    * session no longer accumulate cached blocks (only the returned
    * frame stays persisted — caller-owned; unpersist it when done).
    * Count is the cheapest full materialization (no driver collect). */
  private[operators] def releasingAfter(intermediates: DataFrame*)(result: DataFrame): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /** Default per-batch row ceiling for broadcasting the incoming side
    * of an ingest screen ([[minhashScreen]],
    * [[Similarity.cosineScreen]]): ~150 B/doc of banded keys against a
    * 1 GiB broadcast budget (SCALE.md's sizing). Past it the screens
    * drop their hints and shuffle both sides on the bucket keys. */
  val screenBroadcastMaxRows: Long = 7000000L

  /** Idempotent keep-one-per-key: deterministic representative = min
    * (orderCols) row, mirroring "last write wins" made reproducible.
    * One shuffle; row_number (not dropDuplicates) so the survivor is
    * deterministic across retries — required for exactly-once sinks. */
  def firstByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup via md5 of a normalized text column: returns
    * (hash, n_copies, keeper_id) per duplicate group. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(lower(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(count("*").as("n_copies"), min(col(idCol)).as("keeper_id"))

  /** MinHash signatures: one row per doc with `nHashes` signature
    * columns s0..s{n-1} over word k-shingles. Explode-then-aggregate so
    * each shingle is hashed once per SEED GROUP (a per-row array
    * expression would recompute the shingle array per signature
    * column — Catalyst inlines aliased projections); partial
    * aggregation makes the shuffle carry only (doc, partial-min) rows.
    * Docs with no shingles produce no row.
    *
    * One md5 yields FOUR independent signature components (its 32 hex
    * chars split into four 8-hex substrings — md5 bits are pairwise
    * independent, so each slice is its own uniform hash family
    * member): component i mins `substr(md5(sh || i/4), (i%4)*8, 8)`.
    * The slices are produced by the fused codegen expression
    * `Md5HexSlices` (one digest + one 32-byte buffer per shingle,
    * byte-identical to the composed md5+substr form) and projected
    * BEFORE the aggregate so each digest runs once per (shingle,
    * group) — hashing dominates the signature build. The DuckDB
    * oracles replicate the same slicing in its composed SQL form. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nHashes: Int): DataFrame = {
    val nGroups = (nHashes + 3) / 4
    val exploded = docs.select(col(idCol),
      explode(shingles(col(textCol), k)).as("__sh"))
    val hashed = exploded.select(
      col(idCol) +: (0 until nGroups).map(g =>
        graft.expressions.Md5HexSlices(concat(col("__sh"), lit(g.toString)))
          .as(s"__h$g")): _*)
    val aggs = (0 until nHashes).map { i =>
      min(col(s"__h${i / 4}").getItem(i % 4)).as(s"s$i")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding: docs whose signatures agree on all hashes
    * of one band land in one bucket; buckets with >1 doc are near-dup
    * candidates. Returns (band_id, bucket key columns..., bucket_size,
    * min_doc). At scale: bucket key is a short string — the groupBy
    * shuffles only (id, band hashes). */
  def minhashBuckets(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nHashes: Int, bandSize: Int): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k, nHashes)
    // one struct per band, exploded — a union of per-band selects would
    // re-run the signature aggregation once per band
    val bandStructs = (0 until nHashes / bandSize).map { b =>
      val keys = (b * bandSize until (b + 1) * bandSize).map(i => col(s"s$i"))
      struct(lit(b).as("band_id"), md5(concat_ws("|", keys: _*)).as("bucket"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.band_id").as("band_id"), col("bb.bucket").as("bucket"), col(idCol))
      .groupBy("band_id", "bucket")
      .agg(count("*").as("bucket_size"), min(col(idCol)).as("min_doc"))
      .where(col("bucket_size") > 1)
  }

  /** (doc, band, bucket) rows from a signature frame — one row per
    * LSH band, bucket = md5 over the band's signature slice. Shared by
    * [[minhashJaccardEstimate]] and [[minhashScreen]]. */
  private def bandedBuckets(sigs: DataFrame, idCol: String,
      nHashes: Int, bandSize: Int): DataFrame = {
    val bandStructs = (0 until nHashes / bandSize).map { b =>
      val keys = (b * bandSize until (b + 1) * bandSize).map(i => col(s"s$i"))
      struct(lit(b).as("band"), md5(concat_ws("|", keys: _*)).as("bucket"))
    }
    sigs
      .select(col(idCol).as("doc"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash Jaccard ESTIMATOR: for LSH-banded candidate pairs,
    * estimate J(A,B) as the fraction of agreeing signature components
    * (P[min-hash collision] = J, Broder '97 — the estimator behind
    * every production-scale near-dup pipeline). This is the scale path
    * when [[jaccardPairs]]' exact set verification is too expensive:
    * signatures are fixed-width (nHashes strings), candidates come
    * from banding, and no shingle set ever crosses the network —
    * the estimate needs only the two signature rows.
    * `est_jaccard` = agreements/nHashes is an exact small rational —
    * hash-stable with no rounding. */
  def minhashJaccardEstimate(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nHashes: Int, bandSize: Int): DataFrame = {
    require(nHashes % bandSize == 0, "bandSize must divide nHashes")
    val sigs = minhashSignatures(docs, idCol, textCol, k, nHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = bandedBuckets(sigs, idCol, nHashes, bandSize)
    // NOTE: candidates may repeat (a near-identical pair collides in
    // up to ALL nHashes/bandSize bands), and the dedup belongs HERE,
    // before the signature joins — the distinct shuffles narrow
    // (doc_a, doc_b) rows, while a deferred dropDuplicates would let
    // every duplicate flow through both joins carrying 2×nHashes
    // signature strings and then shuffle those same duplicated, wider
    // rows anyway. jaccardPairs defers its dedup because a highly
    // selective verification filter sits between candidates and
    // output; this estimator has no such filter, so dedup-early wins.
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val agree = (0 until nHashes).map(i =>
      when(col(s"sa.s$i") === col(s"sb.s$i"), 1).otherwise(0)).reduce(_ + _)
    releasingAfter(sigs) {
      cands
        .join(sigs.as("sa"), col("doc_a") === col(s"sa.$idCol"))
        .join(sigs.as("sb"), col("doc_b") === col(s"sb.$idCol"))
        .select(col("doc_a"), col("doc_b"),
          agree.cast("long").as("n_agree"),
          (agree.cast("double") / lit(nHashes.toDouble)).as("est_jaccard"))
    }
  }

  /** INCREMENTAL INGEST SCREEN: estimated-Jaccard candidates of
    * `incoming` documents against a STATIC `corpus` — the production
    * shape for admitting a new batch into a 100 TB training corpus
    * without re-running corpus×corpus dedup (reference capability
    * anchor: ingest-side screening atop
    * `marketdb-core/src/main/scala/com/ergodicity/marketdb/core/MarketDB.scala:139-168`).
    * Candidates come from banded-bucket collisions BETWEEN the sides
    * (never within one side), so cost scales with incoming×density,
    * not corpus²; the incoming banded keys and the candidate set are
    * broadcast (a new batch is small next to the corpus), so the
    * corpus-side signature frame is never shuffled. Id spaces must be
    * disjoint (they identify the sides in the output). Output:
    * (doc_a = corpus id, doc_b = incoming id, n_agree, est_jaccard) —
    * exactly [[minhashJaccardEstimate]] over the union restricted to
    * cross pairs, which is how the oracle checks it (q73).
    *
    * Beyond-broadcast regime: broadcasting pays off only while the
    * banded incoming frame fits executor memory (SCALE.md sizes the
    * 1 GiB budget at ~7 M docs/batch). Past `broadcastMaxRows`
    * (decided from one count of the already-persisted incoming
    * signatures) every broadcast hint is dropped and the collision +
    * verification joins shuffle BOTH sides on their keys — the corpus
    * signature scan stays one pass; only the bucket/id exchanges are
    * added. Identical output either way (plan-guarded in
    * `PlanPropertiesSpec`). */
  def minhashScreen(corpus: DataFrame, incoming: DataFrame, idCol: String,
      textCol: String, k: Int, nHashes: Int, bandSize: Int,
      broadcastMaxRows: Long = screenBroadcastMaxRows): DataFrame = {
    require(nHashes % bandSize == 0, "bandSize must divide nHashes")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sigC = minhashSignatures(corpus, idCol, textCol, k, nHashes).persist(lvl)
    val sigN = minhashSignatures(incoming, idCol, textCol, k, nHashes).persist(lvl)
    val small = sigN.count() <= broadcastMaxRows
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val cands = bandedBuckets(sigC, idCol, nHashes, bandSize).as("a")
      .join(hinted(bandedBuckets(sigN, idCol, nHashes, bandSize)).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val agree = (0 until nHashes).map(i =>
      when(col(s"sa.s$i") === col(s"sb.s$i"), 1).otherwise(0)).reduce(_ + _)
    releasingAfter(sigC, sigN) {
      hinted(cands)
        .join(sigC.as("sa"), col("doc_a") === col(s"sa.$idCol"))
        .join(hinted(sigN.as("sb")), col("doc_b") === col(s"sb.$idCol"))
        .select(col("doc_a"), col("doc_b"),
          agree.cast("long").as("n_agree"),
          (agree.cast("double") / lit(nHashes.toDouble)).as("est_jaccard"))
    }
  }

  /** SimHash: positional-nibble majority hash. For each of 16 md5 hex
    * positions, a token votes +1 if its nibble's top bit is set, else
    * -1; the sign of the per-position sum forms a 16-bit fingerprint.
    * Near-dups share most bits (compare via Hamming distance).
    *
    * Shape: explode tokens → ONE fused digest-to-nibble-values
    * expression per token (`Md5Nibbles`, codegen — byte-identical to
    * md5 + 16 substring/instr projections but with no hex-string
    * intermediate) → 16 conditional sums in one hash aggregate
    * (map-side partials; the shuffle carries one 16-int row per doc).
    * A per-row array formulation (`aggregate(transform(tokens, ...))`)
    * evaluates interpreted and recomputes the md5 per bit — 16× the
    * hashing, off the codegen path (CLAUDE.md higher-order-function
    * note). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), graft.expressions.Md5Nibbles(col("tok")).as("nibs"))
    val sums = (0 until 16).map { i =>
      // nibble i of md5(token); top bit set <=> nibble value >= 8
      sum(when(col("nibs").getItem(i) >= 8, 1).otherwise(-1)).as(s"p$i")
    }
    val bits = (0 until 16).map(i =>
      when(col(s"p$i") > 0, lit(1L << (15 - i))).otherwise(lit(0L)))
    tok.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs via banded join — EXACT by pigeonhole:
    * split the 16-bit fingerprint into `maxHamming + 1` bands; a pair
    * differing in at most `maxHamming` bits must agree on at least one
    * whole band, so the band-value equi-join (shuffle on short keys)
    * finds every qualifying pair without the n² cross join; exact
    * Hamming distance then verifies candidates. Fewer, wider bands
    * (lower maxHamming) mean exponentially smaller buckets — with a
    * 16-bit fingerprint, maxHamming=1 (2 bands × 8 bits) keeps bucket
    * sizes ~n/256 where maxHamming=3 (4 × 4 bits) degrades to ~n/16.
    * Eager: the result is materialized (and returned persisted,
    * caller-owned) so the signature cache can be released on exit. */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 1): DataFrame =
    bandedNearDup(simhash(docs, idCol, textCol), idCol, "simhash", 16, maxHamming)

  /** 64-bit SimHash: same positional-vote construction as [[simhash]]
    * but over ALL four bits of each of the 16 md5 hex nibbles — bit
    * b votes on bit (3 - b%4) of nibble b/4, so bits 0,4,8,… coincide
    * with the 16-bit fingerprint. 64 bits cut coincidental collisions
    * (SCALE.md: ~3.5% of 16-bit pairs collide at test scale) to ~0 and
    * let banding use wider bands (16-bit bands at maxHamming=3 keep
    * buckets ~n/65536 where the 16-bit fingerprint's 4-bit bands
    * degrade to ~n/16). Same single-aggregate shape: one md5 per token,
    * 64 conditional sums, shuffle carries one 64-int row per doc. */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // all 16 nibble VALUES in one fused codegen expression per token
    // (one digest, no 32-char hex intermediate, no 16 substr+instr
    // re-scans) — byte-identical to the DuckDB oracle's composed
    // strpos-over-hex formulation
    val nibbled = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), graft.expressions.Md5Nibbles(col("tok")).as("nibs"))
    val sums = (0 until 64).map { b =>
      sum(when(col("nibs").getItem(b / 4).bitwiseAND(lit(8 >> (b % 4))) > 0, 1)
        .otherwise(-1)).as(s"p$b")
    }
    val bits = (0 until 64).map(i =>
      when(col(s"p$i") > 0, lit(1L << (63 - i))).otherwise(lit(0L)))
    // addition of disjoint bit patterns == bitwise OR (bit 0's addend is
    // Long.MinValue; adding non-negative values to it cannot overflow)
    nibbled.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("simhash64"))
  }

  /** [[simhashNearDup]] over the 64-bit fingerprint; default
    * maxHamming=3 → 4 bands × 16 bits (pigeonhole-exact). */
  def simhashNearDup64(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    bandedNearDup(simhash64(docs, idCol, textCol), idCol, "simhash64", 64,
      maxHamming)

  /** Shared banded near-dup join (pigeonhole-exact, see
    * [[simhashNearDup]]): `sigs` = one (id, fingerprint) row per doc;
    * `width` = fingerprint bits. Persists the signature subtree for the
    * self-join's two sides, releases it on exit (result is returned
    * materialized + persisted, caller-owned). */
  private def bandedNearDup(sigs: DataFrame, idCol: String, sigCol: String,
      width: Int, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    require(maxHamming >= 0 && width % nBands == 0,
      s"maxHamming + 1 must divide the $width-bit fingerprint: $maxHamming")
    val bandBits = width / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    // persist: the self-join evaluates `bands` twice — without this the
    // whole tokenize+hash+aggregate subtree runs once per side
    val cached = sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col(sigCol), b * bandBits).bitwiseAND(lit(mask)).as("bv"))
    }
    val bands = cached
      .select(col(idCol).as("doc"), col(sigCol).as("sig"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc"), col("sig"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    releasingAfter(cached) {
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
          expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
        .where(col("hamming") <= maxHamming)
        // a pair can agree on several bands — one row per pair (hamming
        // is functionally determined by the pair, min is a no-op pick)
        .groupBy("doc_a", "doc_b")
        .agg(min("hamming").as("hamming"))
    }
  }

  /** n-gram Jaccard near-dup pairs, exact, with PPJoin-style prefix
    * filtering (Chaudhuri et al., "A Primitive Operator for Similarity
    * Joins"): a pair with J >= t must share at least one of each doc's
    * |A| - ceil(t*|A|) + 1 globally-rarest shingles, so the
    * inverted-index self-join runs only over those prefixes instead of
    * every shingle — the fan-out on frequent shingles (the n^2 killer
    * at corpus scale) never materializes. Candidates are then verified
    * exactly via sorted-set intersection. Emits pairs with
    * jaccard >= threshold, doc_a < doc_b — byte-identical to the naive
    * all-pairs join. Eager: the result is materialized (and returned
    * persisted, caller-owned) so the shared-subtree caches can be
    * released on exit. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val t = threshold
    // epsilon guards float round-up of t*n inside ceil: err toward the
    // looser (still exact) bound
    def ceilT(c: org.apache.spark.sql.Column) = ceil(c - lit(1e-9))
    // persist: both the frequency aggregation and the dictionary-encode
    // join consume the exploded shingles — one tokenize+explode pass,
    // not two
    val sh = docs.select(col(idCol).as("doc"),
        explode(array_distinct(shingles(col(textCol), k))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dictionary-encode shingles, rarest first: sid order == (df, sh)
    // order, so per-doc sid order is the canonical prefix order and all
    // later joins/intersections run on ints, not shingle strings.
    // OrderedIndex (range sort + zipWithIndex) keeps the allocation
    // parallel — a global row_number window would single-partition the
    // whole vocabulary.
    // persist: freq feeds three downstream actions (vocab count, dict
    // sort+collect for broadcast, and via dict the shId join) — without
    // it the full doc-explode + groupBy shuffle reruns per action
    val freq = sh.groupBy("sh").agg(count("*").as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = OrderedIndex
      .attach(freq, Seq(col("df"), col("sh")), "sid64")
      .select(col("sh"), col("sid64").cast("int").as("sid"))
    val shId = sh.join(broadcast(dict), "sh").select(col("doc"), col("sid"))
    // adaptive verification strategy: with a small shingle vocabulary
    // (dictionary-encodable into a fixed-width bitset) pairwise
    // intersection is AND+popcount over |vocab|/64 words; otherwise a
    // sorted-int-set merge. Count the persisted freq (== dict size)
    // rather than dict, whose lineage re-runs the sort+zipWithIndex.
    val vocab = freq.count()
    val useBitmap = vocab <= 65536
    // one shuffle builds the per-doc sid set (+ bitmap); prefixes and
    // exact verification both derive from it (no window passes)
    val setAggs =
      Seq(sort_array(collect_list("sid")).as("set")) ++
        (if (useBitmap)
          Seq(graft.expressions.BitmapAggregate(col("sid"), vocab.toInt).as("bm"))
        else Nil)
    // persist: prefix (a/b sides) and the two verification joins all
    // re-evaluate `sets` — four runs of explode+dict-join+collect
    // without it
    val sets = shId.groupBy("doc")
      .agg(setAggs.head, setAggs.tail: _*)
      .withColumn("n", size(col("set")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // prefix filter: a J>=t pair shares one of each side's
    // n - ceil(t*n) + 1 rarest shingles (set is sorted rarest-first)
    val prefixLen = (col("n") - ceilT(col("n") * lit(t)) + lit(1)).cast("int")
    val prefix = sets
      .select(col("doc"), col("n"),
        posexplode(slice(col("set"), lit(1), prefixLen)).as(Seq("pos0", "sid")))
      .withColumn("pos", col("pos0") + 1)
    // candidate join with length filter (t*|B| <= |A| <= |B|/t) and
    // PPJoin positional filter (Xiao et al.): overlap upper bound from
    // the match positions must reach alpha = ceil(t/(1+t)*(|A|+|B|))
    val alpha = ceilT((col("a.n") + col("b.n")) * lit(t / (1.0 + t)))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.sid") === col("b.sid") && col("a.doc") < col("b.doc") &&
          col("a.n") >= ceilT(col("b.n") * lit(t)) &&
          col("b.n") >= ceilT(col("a.n") * lit(t)) &&
          lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= alpha)
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
    // NOTE: candidates may repeat (a pair can share several prefix
    // shingles); dedup happens after the threshold filter, when only
    // true near-dups remain — far cheaper than a distinct shuffle of
    // the full candidate set
    // exact verification: bitmap AND+popcount or sorted-set merge
    val verifyCols =
      if (useBitmap) Seq(col("doc"), col("bm"), col("n"))
      else Seq(col("doc"), col("set"), col("n"))
    val vsets = sets.select(verifyCols: _*)
    val interExpr =
      if (useBitmap) graft.expressions.BitmapAndCount(col("sa.bm"), col("sb.bm"))
      else graft.expressions.SortedIntersectCount(col("sa.set"), col("sb.set"))
    releasingAfter(sh, freq, sets) {
      cands
        .join(vsets.as("sa"), col("doc_a") === col("sa.doc"))
        .join(vsets.as("sb"), col("doc_b") === col("sb.doc"))
        .withColumn("inter", interExpr)
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") /
            (col("sa.n") + col("sb.n") - col("inter")).cast("double")).as("jaccard"))
        .where(col("jaccard") >= threshold)
        .dropDuplicates("doc_a", "doc_b")
    }
  }

  /** DIRECTED n-gram CONTAINMENT join — C(A→B) = |Sh(A)∩Sh(B)| / |Sh(A)|
    * ≥ tNum/tDen: the asymmetric near-dup measure that catches a SHORT
    * document wholly quoted inside a LONG one, which Jaccard
    * structurally misses (the union denominator dilutes any small-A
    * overlap below threshold). The threshold is a RATIONAL, so every
    * filter is exact integer math: overlap ≥ ceil(t·|A|) becomes
    * tDen·inter ≥ tNum·n_a — no float boundary anywhere; the reported
    * score is one exact-int division.
    *
    * Candidate generation (prefix-filter, Xiao et al. adapted to the
    * asymmetric case): a qualifying pair must share one of A's
    * n_a − ceil(t·n_a) + 1 RAREST shingles (sets are dictionary-encoded
    * rarest-first, as in [[jaccardPairs]]), but B's side cannot be
    * length-bounded (|B| is free in a containment join), so A's prefix
    * probes B's FULL inverted list. 100 TB shape: candidate volume is
    * Σ_sid prefixDf(sid)·df(sid) — prefix entries are the RAREST
    * shingles, so prefixDf is small exactly where df could be large;
    * verification is AND+popcount / sorted-merge on int sets, one
    * exchange each side. */
  /** Distinct-doc count of an exploded (doc, sh) frame — an aggregate
    * over the CACHED explode, not a rescan of the corpus. */
  private def sets0DocCount(sh: DataFrame): Long =
    sh.select(col("doc")).distinct().count()

  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"bad threshold $tNum/$tDen")
    val sh = docs.select(col(idCol).as("doc"),
        explode(array_distinct(shingles(col(textCol), k))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = sh.groupBy("sh").agg(count("*").as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = OrderedIndex
      .attach(freq, Seq(col("df"), col("sh")), "sid64")
      .select(col("sh"), col("sid64").cast("int").as("sid"))
    val shId = sh.join(broadcast(dict), "sh").select(col("doc"), col("sid"))
    val vocab = freq.count()
    // bitmap verification only when the fixed vocab-wide bitmap is no
    // heavier than the variable int set it replaces (vocab/8 bytes vs
    // ~4·avgLen): the verify joins SHIP one structure per candidate
    // side, and a sparse corpus with a large trigram vocabulary would
    // shuffle GBs of mostly-zero words (measured 8.4 s → sorted-merge
    // at q214's 27k-vocab/52-avg shape). Both stats come from cached
    // frames — no extra scan of the corpus.
    val postRows = freq.agg(sum(col("df"))).first().getLong(0)
    val nDocs = math.max(1L, sets0DocCount(sh))
    val useBitmap = vocab <= 65536 && vocab <= 32L * (postRows / nDocs)
    val setAggs =
      Seq(sort_array(collect_list("sid")).as("set")) ++
        (if (useBitmap)
          Seq(graft.expressions.BitmapAggregate(col("sid"), vocab.toInt).as("bm"))
        else Nil)
    val sets = shId.groupBy("doc")
      .agg(setAggs.head, setAggs.tail: _*)
      .withColumn("n", size(col("set")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ceil(t*n) in exact integer math: (tNum*n + tDen - 1) fits long
    val need = floor((lit(tNum) * col("n") + lit(tDen - 1)) / lit(tDen))
    val prefixLen = (col("n") - need + lit(1)).cast("int")
    val aPref = sets.select(col("doc"), col("n"),
      explode(slice(col("set"), lit(1), prefixLen)).as("sid"))
    val cands = aPref.as("a").join(shId.as("b"),
        col("a.sid") === col("b.sid") && col("a.doc") =!= col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val verifyCols =
      if (useBitmap) Seq(col("doc"), col("bm"), col("n"))
      else Seq(col("doc"), col("set"), col("n"))
    val vsets = sets.select(verifyCols: _*)
    val interExpr =
      if (useBitmap) graft.expressions.BitmapAndCount(col("sa.bm"), col("sb.bm"))
      else graft.expressions.SortedIntersectCount(col("sa.set"), col("sb.set"))
    releasingAfter(sh, freq, sets) {
      cands
        .join(vsets.as("sa"), col("doc_a") === col("sa.doc"))
        .join(vsets.as("sb"), col("doc_b") === col("sb.doc"))
        .withColumn("inter", interExpr)
        .where(col("inter") * lit(tDen.toLong) >=
          col("sa.n").cast("long") * lit(tNum.toLong))
        .select(col("doc_a"), col("doc_b"),
          col("inter").cast("long").as("inter"),
          col("sa.n").cast("long").as("n_a"),
          (col("inter").cast("double") / col("sa.n").cast("double"))
            .as("containment"))
    }
  }

  /** DECONTAMINATION — exact word k-gram overlap between a training
    * corpus and an evaluation/benchmark set: every train doc sharing
    * at least one distinct k-shingle with an eval doc is flagged, with
    * the shared-shingle count as evidence. A training pipeline runs
    * this before every release so benchmark text cannot leak into the
    * training set; unlike the PROBABILISTIC screens ([[minhashScreen]],
    * near-dup banding) this is EXACT — contamination policy wants no
    * false negatives at any similarity level, including a single
    * verbatim quote inside an otherwise-unrelated document, which no
    * whole-document similarity measure catches.
    *
    * 100 TB shape: the eval side is tiny by definition (benchmarks),
    * so its distinct exploded shingles BROADCAST; the train corpus
    * streams through one explode + broadcast-hash join + partial
    * count — never shuffled beyond the final (train_id, eval_id)
    * aggregation on matches only. Output: (train_id, eval_id,
    * n_shared), one row per contaminated pair. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    decontaminateAgainst(train,
      shingleSet(eval, idCol, textCol, k, "eval_id"), idCol, textCol, k)

  /** Distinct exploded word k-shingles of a frame, id aliased to
    * `name` — the broadcastable eval side of [[decontaminate]].
    * Exposed so long-lived consumers (the streaming screen) can derive
    * and persist it ONCE instead of per micro-batch. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, k: Int,
      name: String): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    df.select(col(idCol).cast("long").as(name),
      explode(array_distinct(shingles(col(textCol), k))).as("s"))
  }

  /** [[decontaminate]] against a PREBUILT (eval_id, s) shingle frame. */
  def decontaminateAgainst(train: DataFrame, evalShingles: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame =
    shingleSet(train, idCol, textCol, k, "train_id")
      .join(broadcast(evalShingles), "s")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))

  /** REPEATED-SPAN DETECTION — intra-corpus exact-substring dedup in
    * the sense of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499), re-expressed for a
    * distributed pass: a token k-gram occurring MORE THAN ONCE in the
    * corpus (within- or cross-document) marks all its occurrences, and
    * runs of marked positions merge into maximal per-document spans
    * (gaps-and-islands) — the deletable boilerplate. Suffix-array
    * maximality is approximated at k-gram granularity: every k-window
    * of a reported span repeats SOMEWHERE, though the span need not
    * repeat contiguously — the standard bound a distributed pass
    * computes without a global suffix sort.
    *
    * Output: `(doc_id, start_tok, end_tok, n_dup_shingles)`, 1-based
    * inclusive token positions (span covers end_tok-start_tok+1
    * tokens; a span of exactly k tokens is one duplicated k-gram).
    *
    * 100 TB shape: ONE posexplode lineage — occurrence counts ride a
    * window over the shingle key (the q67 df trick: groupBy+join
    * would re-run the explode subtree), the islands merge is a second
    * window over (doc, pos). Two exchanges total, no self-join. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val marked = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(shingles(col(textCol), k)).as(Seq("p0", "s")))
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("s")))
      .where(col("occ") > 1)
      .select(col("doc_id"), (col("p0") + 1).as("pos"))
    val islands = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("grp", col("pos") - row_number().over(islands))
      .groupBy("doc_id", "grp")
      .agg(min("pos").cast("long").as("start_tok"),
        (max("pos") + lit(k - 1)).cast("long").as("end_tok"),
        count(lit(1)).as("n_dup_shingles"))
      .select("doc_id", "start_tok", "end_tok", "n_dup_shingles")
  }

  /** WINNOWING (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
    * fingerprinting algorithm): every window of `w` consecutive
    * k-gram hashes contributes its minimum — rightmost on ties, the
    * paper's robust-winnowing rule, encoded as a lexicographic
    * `(hash, -pos)` struct min — and the distinct selections form the
    * document's fingerprint set (expected density `2/(w+1)`).
    * Guarantee (the one a single global min cannot give): any
    * substring of at least `w + k − 1` shared tokens shares at least
    * one fingerprint. Output: `(doc_id, fp_pos, fp)`.
    *
    * 100 TB shape: one posexplode lineage into one per-doc window
    * exchange; the distinct reuses the same (doc) partitioning. The
    * md5-hex hash keeps the hash family engine-portable (q42's
    * rationale), so the DuckDB oracle replays the identical min. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"bad config: k=$k w=$w")
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    df
      .select(col(idCol).as("doc_id"),
        posexplode(shingles(col(textCol), k)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("s")).as("h"))
      .withColumn("sel", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .where(col("pos") >= w - 1)
      .select(col("doc_id"), (-col("sel.np")).as("fp_pos"), col("sel.h").as("fp"))
      .distinct()
  }

  /** [[decontaminate]] for the regime where the eval shingle frame is
    * too big to broadcast (SCALE.md bounds it at ~7 M docs): a Bloom
    * filter over the eval shingle hashes — KBs–MBs at ANY eval size —
    * pre-filters the train explode to near-matches BEFORE the join's
    * shuffle, and the exact join (both sides shuffled on the shingle)
    * removes the filter's false positives, so the result is
    * BIT-EQUAL to [[decontaminate]] (q99 gates it against q80's
    * oracle; `BloomDecontaminateSpec` pins the equality and the
    * no-false-negative property). The shuffle then carries only
    * matching-ish shingles: cost ≈ fpp × train shingles + true
    * matches, instead of the whole train explode. */
  def decontaminateBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int, bitsPerItem: Int = 16): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val evalShingles = shingleSet(eval, idCol, textCol, k, "eval_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // executor-side build: only the OR-merged bitset reaches the
      // driver — never the hash stream (a collect is O(8 B/shingle)
      // driver memory, which dies exactly in the too-big-to-broadcast
      // regime this operator exists for). approx_count_distinct only
      // sizes the array (deterministic: HLL merge is commutative).
      val hashDs = evalShingles.select(xxhash64(col("s")).as("h"))
      val n = math.max(1L,
        hashDs.agg(approx_count_distinct(col("h"))).as[Long].head())
      val (bits, numHashes) =
        graft.expressions.BloomMightContain.buildDistributed(
          hashDs.as[Long].rdd, n, bitsPerItem)
      // hint pins the shuffle join this operator models (AQE would
      // broadcast at test SF and hide the pre-filter's purpose)
      shingleSet(train, idCol, textCol, k, "train_id")
        .where(graft.expressions.BloomMightContain(
          xxhash64(col("s")), bits, numHashes))
        .join(evalShingles.hint("merge"), "s")
        .groupBy("train_id", "eval_id")
        .agg(count(lit(1)).as("n_shared"))
        .localCheckpoint() // materialize before releasing the cache
    } finally evalShingles.unpersist()
  }

  /** [[decontaminateBloom]] for the regime where even ONE Bloom array
    * would blow the per-task cap (SCALE.md's "shard the filter by
    * hash prefix" step): the filter becomes a DISTRIBUTED
    * (shard, bits) table — each shard sized for ~n/shards items —
    * and the train side joins it on its own hash-prefix shard key,
    * probing the joined row's array via the codegen
    * `BloomMightContainCol` (no plan-literal array anywhere, so no
    * driver- or task-binary object grows with the eval set). The
    * exact join afterwards removes false positives exactly as in the
    * single-filter path — results stay bit-equal to
    * [[decontaminate]] (`BloomShardedSpec`). Probe shape: S join
    * keys → S reducers, each streaming its shard's shingles against
    * one array row. */
  def decontaminateBloomSharded(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, k: Int, shards: Int,
      bitsPerItem: Int = 16, maxBits: Long = 1L << 27): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val evalShingles = shingleSet(eval, idCol, textCol, k, "eval_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hashDs = evalShingles.select(xxhash64(col("s")).as("h"))
      val n = math.max(1L,
        hashDs.agg(approx_count_distinct(col("h"))).as[Long].head())
      val (filterDf, numHashes) =
        graft.expressions.BloomMightContain.buildShardedDf(
          hashDs.as[Long].rdd, n, shards, bitsPerItem, maxBits)
      val logS = Integer.numberOfTrailingZeros(shards)
      val shardKey =
        if (shards == 1) lit(0)
        else shiftrightunsigned(col("__h"), 64 - logS).cast("int")
      shingleSet(train, idCol, textCol, k, "train_id")
        .withColumn("__h", xxhash64(col("s")))
        .withColumn("shard", shardKey)
        .join(filterDf.hint("shuffle_hash"), "shard")
        .where(graft.expressions.BloomMightContainCol(
          col("__h"), col("bloom_bits"), numHashes))
        .select("train_id", "s")
        .join(evalShingles.hint("merge"), "s")
        .groupBy("train_id", "eval_id")
        .agg(count(lit(1)).as("n_shared"))
        .localCheckpoint()
    } finally evalShingles.unpersist()
  }
}
