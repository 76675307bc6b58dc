package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{Md5HexSlices, Md5Nibbles}

/** The fused digest expressions must be BYTE-IDENTICAL to the composed
  * md5+substring forms they replace — that identity is what keeps the
  * DuckDB oracle twins (which spell out the composed form) valid. */
class Md5HashSpec extends AnyFunSuite with SparkTestBase {

  private def sampleStrings = {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 50)
      .select(explode(split(lower(col("text")), " ")).as("s"))
      .where(col("s") =!= "")
    docs.union(spark.range(1).select(lit("").as("s"))) // empty string too
  }

  test("Md5Nibbles == instr('0123456789abcdef', substring(md5(x), i+1, 1)) - 1") {
    val rows = sampleStrings
      .select(col("s"), Md5Nibbles(col("s")).as("nibs"), md5(col("s")).as("h"))
      .select(col("s") +: (0 until 16).flatMap(i => Seq(
        col("nibs").getItem(i).as(s"fused$i"),
        (instr(lit("0123456789abcdef"), substring(col("h"), i + 1, 1)) - 1)
          .as(s"ref$i"))): _*)
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      (0 until 16).foreach { i =>
        assert(r.getAs[Int](s"fused$i") === r.getAs[Int](s"ref$i").toInt,
          s"nibble $i of '${r.getString(0)}'")
      }
    }
  }

  test("Md5HexSlices == substring(md5(x), 8k+1, 8)") {
    val rows = sampleStrings
      .select(col("s"), Md5HexSlices(col("s")).as("sl"), md5(col("s")).as("h"))
      .select(col("s") +: (0 until 4).flatMap(k => Seq(
        col("sl").getItem(k).as(s"fused$k"),
        substring(col("h"), k * 8 + 1, 8).as(s"ref$k"))): _*)
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      (0 until 4).foreach { k =>
        assert(r.getAs[String](s"fused$k") === r.getAs[String](s"ref$k"),
          s"slice $k of '${r.getString(0)}'")
      }
    }
  }

  test("null flows through (nullIntolerant)") {
    val r = spark.range(1)
      .select(Md5Nibbles(lit(null).cast("string")).as("n"),
        Md5HexSlices(lit(null).cast("string")).as("s"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
