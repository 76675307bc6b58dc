package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines
  * (language-ID, quality scoring, token counting, fingerprinting).
  * All are composed from codegen'd built-ins — no UDFs — so they stay
  * inside whole-stage codegen and scale linearly with the scan.
  *
  * Everything here is deterministic and reproducible in ANSI SQL, which
  * is what lets the DuckDB oracle check the corpus operators
  * (SURVEY §7 step 5).
  */
object TextFunctions {

  /** Fixed scratch path for q91's supplementary-plane corpus — fixed
    * because `oracleSql` is a static string (same trade as
    * `Tables.scratchPartitionedPath`). */
  val scratchUnicodePath: String = "/tmp/graft_q91_unicode"

  /** Whitespace tokenizer: lowercase, split on runs of whitespace,
    * empties dropped. (BPE-ish regex token counting is `tokenCount`.) */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token ratio — a repetition/quality signal. */
  def uniqueTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")

  /** Distinct character trigrams of every ≥3-char token — the unit of
    * n-gram-profile language ID (Cavnar–Trenkle '94 reduced to fixed
    * profiles). The length filter keeps `sequence` bounds valid
    * (Spark's sequence(1, 0) counts DOWN, not empty); lambda vars only
    * inside the lambdas, so nothing re-evaluates per element (see
    * [[shinglesDeclarative]]'s note). */
  def charTrigrams(text: Column): Column = {
    val toks3 = filter(tokens(text), t => length(t) >= 3)
    array_distinct(flatten(transform(toks3, t =>
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))))
  }

  /** (language, trigram) profile rows derived from the marker-word
    * table — the SAME generator feeds the Spark broadcast side and the
    * DuckDB oracle's VALUES literal, so both engines score against
    * identical profiles.
    *
    * Slices CODE POINTS, matching [[charTrigrams]] (Spark `substr` =
    * `UTF8String.substringSQL`, code points) and DuckDB's `substr`
    * (characters) — a supplementary-plane marker word (emoji, CJK
    * ext B) produces the same trigrams in all three generators by
    * construction. */
  def trigramProfile(markers: Map[String, Seq[String]]): Seq[(String, String)] = {
    markers.toSeq.sortBy(_._1).flatMap { case (lang, words) =>
      words.flatMap { w =>
        val cps = w.codePoints().toArray
        (0 to cps.length - 3).map(i => new String(cps, i, 3))
      }.distinct.sorted.map(lang -> _)
    }
  }

  /** Word k-shingles as strings ("a b c"), the unit for MinHash /
    * Jaccard near-dup detection. Native single-pass codegen expression
    * (`WordShingles`); byte-identical to `shinglesDeclarative`, which
    * the spec checks it against. */
  def shingles(text: Column, k: Int): Column =
    graft.expressions.WordShingles(text, lit(k))

  /** Declarative reference formulation (parity oracle for the native
    * expression; also documents the built-in-only construction).
    *
    * Built by folding `zip_with` over shifted slices of the token
    * array: zip_with/slice evaluate their array arguments once per
    * row, whereas a `transform(sequence(...), i => slice(toks, i, k))`
    * lambda would re-evaluate the captured token expression per
    * element — O(tokens²) per document. zip_with null-pads the shorter
    * side, so tail positions (< k tokens left) become null and are
    * filtered; fewer than k tokens total yields an empty array. */
  def shinglesDeclarative(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val folded = (2 to k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), greatest(n - lit(j - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(folded, s => s.isNotNull)
  }

  /** One MinHash signature component: min over shingles of
    * md5(shingle || seed). String-min over hex md5 is a uniform,
    * engine-portable stand-in for a 64-bit hash family — identical in
    * Spark and DuckDB, which keeps the oracle exact. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(s, lit(seed.toString)))))

  /** Document fingerprint: minimum rolling md5 over word k-shingles —
    * a winnowing-style representative hash for exact-ish clustering. */
  def fingerprint(text: Column, k: Int = 3): Column =
    array_min(transform(shingles(text, k), s => md5(s)))

  /** Punctuation ratio over characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword ratio given a marker-word list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    hits.cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** n-gram-heuristic language ID: score each candidate language by its
    * marker-token hit ratio; emit the argmax (ties → lexicographically
    * first language code, deterministic). */
  def langId(text: Column, markers: Map[String, Seq[String]]): Column = {
    // struct compare is field-order lexicographic: max score wins, ties
    // fall to max(-idx) = lexicographically first language code.
    val scored = markers.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, words), idx) =>
        struct(stopwordRatio(text, words).as("score"),
          lit(-idx).as("tie"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Regexes shared by [[scrub]] and its DuckDB oracle twin — kept in
    * the COMMON Java-regex/RE2 subset (no lookaround, no \x0B-class
    * differences in practice on corpus text), so both engines mask the
    * same spans. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** PII extension of the shared-regex set (q98): North-American-style
    * phone numbers and IPv4 literals. Same Java-regex/RE2 common
    * subset discipline; `\\b` word boundaries behave identically on
    * digit/non-digit edges in both engines. */
  val PhoneRe = "\\(\\d{3}\\) \\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Unicode NFC normalization (custom codegen expression — Spark has
    * no built-in; see [[graft.expressions.NfcNormalize]]). */
  def nfc(text: Column): Column = graft.expressions.NfcNormalize(text)

  /** Corpus text cleanup — the normalize/scrub stage that runs BEFORE
    * dedup and fingerprinting in a training pipeline (decomposed
    * Unicode, case, contact strings and URLs otherwise make
    * near-identical documents hash apart): NFC → lowercase → mask
    * emails/URLs → collapse whitespace runs → trim. Pure codegen
    * column expressions; one scan, no shuffle, no UDF. */
  def scrub(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(nfc(text)), EmailRe, "<email>"),
        UrlRe, "<url>"),
      "\\s+", " "))

  /** [[scrub]] plus the PII masks (phone, IPv4) — the full cleanup a
    * public-corpus release pipeline runs. Order matters and is fixed:
    * email/URL first (an URL may contain digit runs an IP pattern
    * would bite into), then phone, then IP, then whitespace collapse. */
  def scrubPii(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(nfc(text)), EmailRe, "<email>"),
            UrlRe, "<url>"),
          PhoneRe, "<phone>"),
        Ipv4Re, "<ip>"),
      "\\s+", " "))

  /** Gopher-style quality-rule gate (Rae et al. 2021,
    * arXiv:2112.11446, Appendix A — the rule-based filter every
    * corpus release runs before model-based scoring): token-count
    * bounds, mean-word-length bounds, minimum stopword evidence,
    * minimum vocabulary diversity. `reason` is the FIRST failing rule
    * in that fixed order ('pass' when all hold) — the quarantine
    * label a release pipeline reports per rejected doc.
    *
    * All arithmetic is exact-integer or a single IEEE division
    * (mean_word_len = len(array_join(toks,""))/n — total token chars
    * without a non-codegen fold), so both engines compare thresholds
    * on identical doubles: no rounding, and the struct stays inside
    * whole-stage codegen. */
  def gopherRules(text: Column, stopwords: Seq[String],
      minTokens: Long, maxTokens: Long,
      minMeanLen: Double, maxMeanLen: Double,
      minStopHits: Long, minDistinctRatio: Double): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val nSafe = greatest(n, lit(1L)).cast("double")
    val meanLen = length(array_join(toks, "")).cast("double") / nSafe
    val stopHits = size(filter(toks, t => t.isInCollection(stopwords))).cast("long")
    val dRatio = size(array_distinct(toks)).cast("double") / nSafe
    val reason = when(n < minTokens || n > maxTokens, "word_count")
      .when(meanLen < minMeanLen || meanLen > maxMeanLen, "word_length")
      .when(stopHits < minStopHits, "stopwords")
      .when(dRatio < minDistinctRatio, "repetition")
      .otherwise("pass")
    struct(n.as("n_tokens"), meanLen.as("mean_word_len"),
      stopHits.as("stop_hits"), dRatio.as("distinct_ratio"),
      reason.as("reason"))
  }

  /** Composite quality score in [0,1]: length saturation, low
    * punctuation, vocabulary diversity. Weights fixed; oracle mirrors
    * the same arithmetic. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(20.0), lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))
    val uniq = uniqueTokenRatio(text)
    lenScore * lit(0.4) + punct * lit(0.2) + uniq * lit(0.4)
  }
}
