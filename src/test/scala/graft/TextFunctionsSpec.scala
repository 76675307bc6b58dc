package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** trigramProfile generator invariants — it feeds BOTH the Spark
  * broadcast side and the DuckDB oracle literal of q72, so its
  * alignment guarantees are load-bearing for the oracle. */
class TextFunctionsSpec extends AnyFunSuite {

  test("trigramProfile emits per-language sorted distinct trigrams") {
    val got = TextFunctions.trigramProfile(
      Map("en" -> Seq("order", "or"), "de" -> Seq("abcd")))
    // "or" is < 3 chars -> contributes nothing; "abcd" -> abc, bcd
    assert(got === Seq(
      "de" -> "abc", "de" -> "bcd",
      "en" -> "der", "en" -> "ord", "en" -> "rde"))
  }

  test("trigramProfile rejects non-BMP marker words") {
    // U+1D49C (MATHEMATICAL SCRIPT CAPITAL A) is two UTF-16 code units:
    // substring-slicing it diverges from character trigrams
    val nonBmp = new String(Character.toChars(0x1D49C)) + "abc"
    val ex = intercept[IllegalArgumentException] {
      TextFunctions.trigramProfile(Map("xx" -> Seq(nonBmp)))
    }
    assert(ex.getMessage.contains("non-BMP"))
  }
}
