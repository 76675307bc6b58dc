package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-dup detection — the batch LSH-banded Broder
  * estimator (`graft.operators.Dedup.minhashJaccardEstimate`)
  * re-expressed as stateful stream processing, completing the
  * streaming dedup family next to [[StreamingNearDup]] (Hamming
  * semantics): this one screens arriving documents by ESTIMATED
  * JACCARD, the similarity measure production corpus dedup thresholds
  * on.
  *
  * Shape: per-row MinHash signature (pure function of the text, no
  * shuffle) → explode to (band, band-signature) keys →
  * `flatMapGroupsWithState` keyed by bucket; a new doc emits an
  * estimated pair for every stored signature agreeing on ≥ `minAgree`
  * components. Pairs surface within AND across micro-batches.
  *
  * Semantics: at-least-once per pair (once per agreeing band), exactly
  * like [[StreamingNearDup.pairs]] — compact downstream with
  * `dropDuplicates(doc_a, doc_b)`. State bound: `stateCap` (FIFO per
  * bucket); for watermark-driven eviction apply the
  * [[StreamingNearDup.pairsEvicting]] construction — the state/timeout
  * mechanics are identical, only the fingerprint differs.
  *
  * Scale: state per bucket is its member list of fixed-width
  * signatures (nHashes × 8 hex chars); banding keeps buckets small
  * (SCALE.md), and no shingle set is ever stored or shipped — the
  * estimate needs only the two signatures (Broder '97).
  */
object StreamingMinHash {

  final case class EstimatedPair(
      doc_a: Long, doc_b: Long, n_agree: Int, est_jaccard: Double)

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Pure-Scala twin of `Dedup.minhashSignatures`'s expression
    * pipeline (lowercase space tokens → word k-shingles → per shingle
    * one md5 per 4-component group, sliced into 8-hex components →
    * per-component min). Returns null for a doc with no shingles
    * (fewer than k tokens) — such docs produce no signature row in the
    * batch operator either. `StreamingMinHashSpec` asserts equality
    * against the Column formulation on real documents. */
  def signature(text: String, k: Int, nHashes: Int): Array[String] = {
    // Locale.ROOT: same reasoning as StreamingNearDup.simhash64
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split(" ", -1).filter(_.nonEmpty)
    if (toks.length < k) return null
    val nGroups = (nHashes + 3) / 4
    val sig = new Array[String](nHashes)
    var i = 0
    while (i + k <= toks.length) {
      val sh = toks.slice(i, i + k).mkString(" ")
      var g = 0
      while (g < nGroups) {
        val h = md5hex(sh + g.toString)
        var j = 0
        while (j < 4) {
          val idx = g * 4 + j
          if (idx < nHashes) {
            // lexicographic min over lowercase-hex ASCII == UTF8String
            // binary min — the ordering the Spark aggregate uses
            val slice = h.substring(j * 8, j * 8 + 8)
            if (sig(idx) == null || slice.compareTo(sig(idx)) < 0) sig(idx) = slice
          }
          j += 1
        }
        g += 1
      }
      i += 1
    }
    sig
  }

  /** Estimated-Jaccard near-dup pairs over a STREAMING frame of
    * (idCol: long-castable, textCol: string). Append-mode output; see
    * class doc for the at-least-once contract. `minAgree` filters
    * emitted pairs to ≥ minAgree agreeing components (estimated
    * J ≥ minAgree/nHashes); 0 emits every banded candidate, matching
    * the batch estimator's candidate set. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 2, nHashes: Int = 16, bandSize: Int = 4,
      minAgree: Int = 0, stateCap: Int = Int.MaxValue): Dataset[EstimatedPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nHashes % bandSize == 0, "bandSize must divide nHashes")
    val nBands = nHashes / bandSize
    docs
      .select(col(idCol).cast("long").as("doc"), col(textCol).as("text"))
      // null text tokenizes to nothing in the batch operators — drop
      // here instead of NPE-ing in the signature function
      .where(col("text").isNotNull)
      .as[(Long, String)]
      .flatMap { case (doc, text) =>
        val sig = signature(text, k, nHashes)
        if (sig == null) Iterator.empty
        else (0 until nBands).iterator.map { b =>
          (b, sig.slice(b * bandSize, (b + 1) * bandSize).mkString("|"), doc, sig)
        }
      }
      .groupByKey { case (band, bv, _, _) => (band, bv) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[(Int, String, Long, Array[String])],
            state: GroupState[List[(Long, Array[String])]]) => {
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[EstimatedPair]
          rows.foreach { case (_, _, doc, sig) =>
            seen.foreach { case (d0, s0) =>
              if (d0 != doc) {
                var agree = 0
                var i = 0
                while (i < sig.length) {
                  if (sig(i) == s0(i)) agree += 1
                  i += 1
                }
                if (agree >= minAgree)
                  out += EstimatedPair(math.min(d0, doc), math.max(d0, doc),
                    agree, agree.toDouble / nHashes)
              }
            }
            seen = ((doc, sig) :: seen).take(stateCap)
          }
          state.update(seen)
          out.result().iterator
        })
  }
}
