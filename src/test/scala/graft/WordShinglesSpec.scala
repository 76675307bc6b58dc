package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Native shingle expression: byte-identical to the declarative
  * zip_with formulation on real documents and on edge cases. */
class WordShinglesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  Seq(1, 2, 3, 5).foreach { k =>
    test(s"matches the declarative formulation on real documents (k=$k)") {
      val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      val diff = docs.select(
          TextFunctions.shingles(col("text"), k).as("native"),
          TextFunctions.shinglesDeclarative(col("text"), k).as("decl"))
        .where(col("native") =!= col("decl"))
        .count()
      assert(diff === 0)
    }
  }

  test("edge cases: empties, runs of spaces, short docs, unicode, case") {
    val edge = Seq(
      "", " ", "   ", "one", "one two", "  a   b  c ",
      "MiXeD CaSe TeXt Here", "héllo wörld ünïcode tokens",
      "a b", "tab\tinside stays one-token"
    ).toDF("text")
    val diff = edge.select(
        TextFunctions.shingles(col("text"), 2).as("native"),
        TextFunctions.shinglesDeclarative(col("text"), 2).as("decl"))
      .where(col("native") =!= col("decl"))
      .count()
    assert(diff === 0)
    // spot check content
    val got = edge.where(col("text") === "  a   b  c ")
      .select(TextFunctions.shingles(col("text"), 2))
      .head().getSeq[String](0)
    assert(got === Seq("a b", "b c"))
  }
}
