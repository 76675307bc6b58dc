package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.CharCounts

/** Native codepoint histogram: matches the declarative
  * explode(split)+count formulation on ASCII/BMP input, and counts
  * whole CODE POINTS (not UTF-16 units) on supplementary-plane input.
  */
class CharCountsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("matches explode(split)+groupBy counts on real documents") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val decl = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("n"))
    val native = docs
      .select(col("doc_id"), explode(CharCounts(col("text"))).as(Seq("ch", "n")))
    assert(native.except(decl).count() === 0)
    assert(decl.except(native).count() === 0)
  }

  test("counts code points, not UTF-16 units, on supplementary planes") {
    // 😀 = U+1F600 (2 UTF-16 units, 4 UTF-8 bytes); 𠀀 = U+20000
    val df = Seq("😀a😀", "𠀀").toDF("text")
    val rows = df
      .select(explode(CharCounts(col("text"))).as(Seq("ch", "n")))
      .as[(String, Long)].collect().toMap
    assert(rows === Map("😀" -> 2L, "a" -> 1L, "𠀀" -> 1L))
    // codepoint length agrees with Spark's length() (numChars)
    val lens = df.select(length(col("text"))).as[Int].collect().toSeq
    assert(lens === Seq(3, 1))
  }

  test("edge cases: empty, single char, combining sequence, null") {
    val m = Seq("").toDF("text")
      .select(size(map_keys(CharCounts(col("text"))))).as[Int].head()
    assert(m === 0)
    // decomposed e + U+0301 is TWO code points (NFC is a separate stage)
    val deco = Seq("e\u0301").toDF("text")
      .select(explode(CharCounts(col("text"))).as(Seq("ch", "n")))
      .as[(String, Long)].collect().toMap
    assert(deco === Map("e" -> 1L, "\u0301" -> 1L))
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(CharCounts(col("text"))).collect()
    assert(nulls.head.isNullAt(0))
  }
}
