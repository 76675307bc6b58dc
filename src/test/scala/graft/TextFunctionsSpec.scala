package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** trigramProfile generator invariants (it feeds BOTH the Spark
  * broadcast side and the DuckDB oracle literal of q72) and the
  * NFC/scrub cleanup stage (q77). */
class TextFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("nfc precomposes decomposed sequences; scrub masks and collapses") {
    val decomposed = "cafe\u0301" // e + U+0301 COMBINING ACUTE
    val precomposed = "caf\u00e9"
    val got = Seq(
      (1L, s"  A $decomposed Email to USER@Example.COM and https://x.io/a?b=1  now"),
      (2L, "plain text"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.scrub(col("t")).as("clean"),
        TextFunctions.nfc(lit(decomposed)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L)._2 === precomposed, "NFC must precompose e+combining-acute")
    assert(got(1L)._1 === s"a $precomposed email to <email> and <url> now")
    assert(got(2L)._1 === "plain text")
  }

  test("scrubPii masks phones and IPs after emails/URLs, in order") {
    val got = Seq(
      (1L, "Call (555) 123-4567 or mail A@B.COM from 10.0.12.7 ok"),
      // the URL's digit runs must survive as <url>, not be bitten by
      // the IP mask (mask-order contract)
      (2L, "see https://x.io/1.2.3.4/p and 192.168.0.1"),
      (3L, "no pii here"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.scrubPii(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "call <phone> or mail <email> from <ip> ok")
    assert(got(2L) === "see <url> and <ip>")
    assert(got(3L) === "no pii here")
  }

  test("gopherRules fires each rule and reports the FIRST failure") {
    import spark.implicits._
    def run(docs: Seq[(Long, String)]) = docs.toDF("id", "t")
      .select(col("id"), TextFunctions.gopherRules(col("t"),
        Seq("the", "a"), minTokens = 3L, maxTokens = 8L,
        minMeanLen = 2.0, maxMeanLen = 5.0,
        minStopHits = 1L, minDistinctRatio = 0.5).as("g"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val got = run(Seq(
      (1L, "the cat sat on mat"),            // all rules hold
      (2L, "too short"),                     // word_count (2 < 3)
      (3L, "the xx yy zz aa bb cc dd ee"),   // word_count (9 > 8)
      (4L, "a b c d"),                       // word_length (1.0 < 2.0)
      (5L, "cat dog bird fish"),             // stopwords (0 hits)
      (6L, "the cat cat cat cat cat"),       // repetition (2/6 < 0.5)
      // word_count fails AND stopwords fails -> first rule wins
      (7L, "xx yy")))
    assert(got(1L).getAs[String]("reason") === "pass")
    assert(got(2L).getAs[String]("reason") === "word_count")
    assert(got(3L).getAs[String]("reason") === "word_count")
    assert(got(4L).getAs[String]("reason") === "word_length")
    assert(got(5L).getAs[String]("reason") === "stopwords")
    assert(got(6L).getAs[String]("reason") === "repetition")
    assert(got(7L).getAs[String]("reason") === "word_count")
    // measures are exact: 5 tokens, (3+3+3+2+3)/5 chars, 1 stop hit
    assert(got(1L).getAs[Long]("n_tokens") === 5L)
    assert(got(1L).getAs[Double]("mean_word_len") === 14.0 / 5.0)
    assert(got(1L).getAs[Long]("stop_hits") === 1L)
    assert(got(1L).getAs[Double]("distinct_ratio") === 1.0)
  }

  test("trigramProfile emits per-language sorted distinct trigrams") {
    val got = TextFunctions.trigramProfile(
      Map("en" -> Seq("order", "or"), "de" -> Seq("abcd")))
    // "or" is < 3 chars -> contributes nothing; "abcd" -> abc, bcd
    assert(got === Seq(
      "de" -> "abc", "de" -> "bcd",
      "en" -> "der", "en" -> "ord", "en" -> "rde"))
  }

  test("trigramProfile slices code points on non-BMP marker words") {
    // U+1D49C (MATHEMATICAL SCRIPT CAPITAL A) is two UTF-16 code units;
    // the generator slices code points, so it counts as ONE character —
    // matching charTrigrams (UTF8String.substringSQL) and DuckDB substr
    val a = new String(Character.toChars(0x1D49C))
    val got = TextFunctions.trigramProfile(Map("xx" -> Seq(a + "abc")))
    assert(got === Seq("xx" -> "abc", "xx" -> (a + "ab")))
  }
}
