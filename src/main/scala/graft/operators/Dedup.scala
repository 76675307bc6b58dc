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
    * columns s0..s{n-1} over word k-shingles. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nHashes: Int): DataFrame = {
    val sh = shingles(col(textCol), k)
    val sigCols = (0 until nHashes).map(i => minhash(sh, i).as(s"s$i"))
    docs.select((col(idCol) +: sigCols): _*)
  }

  /** MinHash + LSH banding: docs whose signatures agree on all hashes
    * of one band land in one bucket; buckets with >1 doc are near-dup
    * candidates. Returns (band_id, bucket key columns..., bucket_size,
    * min_doc). At scale: bucket key is a short string — the groupBy
    * shuffles only (id, band hashes). */
  def minhashBuckets(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nHashes: Int, bandSize: Int): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k, nHashes)
    val bands = (0 until nHashes / bandSize).map { b =>
      val keys = (b * bandSize until (b + 1) * bandSize).map(i => col(s"s$i"))
      sigs.select(
        lit(b).as("band_id"),
        md5(concat_ws("|", keys: _*)).as("bucket"),
        col(idCol))
    }
    bands.reduce(_.unionByName(_))
      .groupBy("band_id", "bucket")
      .agg(count("*").as("bucket_size"), min(col(idCol)).as("min_doc"))
      .where(col("bucket_size") > 1)
  }

  /** SimHash: positional-nibble majority hash. For each of 16 md5 hex
    * positions, a token votes +1 if its nibble's top bit is set, else
    * -1; the sign of the per-position sum forms a 16-bit fingerprint.
    * Near-dups share most bits (compare via Hamming distance). Built
    * from codegen'd expressions only. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val bits = (0 until 16).map { i =>
      // nibble i of md5(token); top bit set <=> hex digit >= '8'
      val votes = transform(toks, t =>
        when(instr(lit("89abcdef"), substring(md5(t), i + 1, 1)) > 0, 1)
          .otherwise(-1))
      val s = aggregate(votes, lit(0), (acc, v) => acc + v)
      when(s > 0, lit(1L << (15 - i))).otherwise(lit(0L))
    }
    docs.select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** n-gram Jaccard near-dup pairs: inverted-index self-join on
    * distinct k-shingles, |A∩B| from the join, |A∪B| from per-doc
    * shingle counts. Emits pairs with jaccard >= threshold,
    * doc_a < doc_b. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
        explode(array_distinct(shingles(col(textCol), k))).as("sh"))
    val sizes = sh.groupBy("doc").agg(count("*").as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count("*").as("inter"))
    // sizes is one short row per doc — leave the join strategy to AQE
    // (broadcastable at test scale, shuffle-hash at corpus scale).
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
