package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.RepetitionStats
import graft.functions.TextFunctions

/** Native one-pass repetition stats: field-identical to the
  * declarative explode(shingles)+groupBy formulation on real
  * documents, plus edge semantics (short docs → null, case folding,
  * space runs). */
class RepetitionStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  Seq(2, 3).foreach { k =>
    test(s"matches the declarative formulation on real documents (k=$k)") {
      val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      val toks = TextFunctions.tokens(col("text"))
      val decl = docs
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_dtoks"),
          explode(TextFunctions.shingles(col("text"), k)).as("g"))
        .groupBy("doc_id", "n_tokens", "n_dtoks", "g")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n_tokens", "n_dtoks")
        .agg(max("c").as("mx"), sum("c").as("tot"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup"))
      val native = docs
        .select(col("doc_id"), RepetitionStats(col("text"), lit(k)).as("r"))
        .where(col("r").isNotNull)
        .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
          col("r.n_dtoks").as("n_dtoks"), col("r.mx").as("mx"),
          col("r.tot").as("tot"), col("r.dup").as("dup"))
      assert(native.count() === decl.count())
      assert(native.except(decl).count() === 0)
      assert(decl.except(native).count() === 0)
    }
  }

  test("edge cases: short docs null out, case folds, space runs collapse") {
    val got = Seq(
      ("one", 1L), ("", 2L), ("  A  a   b ", 3L), ("x y x y x", 4L)
    ).toDF("text", "id")
      .select(col("id"), RepetitionStats(col("text"), lit(2)).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(got(1L).isEmpty, "single token has no 2-grams")
    assert(got(2L).isEmpty, "empty doc has no tokens")
    val s3 = got(3L).get // tokens: a, a, b
    assert((s3.getLong(0), s3.getLong(1), s3.getLong(2), s3.getLong(3),
      s3.getLong(4)) === ((3L, 2L, 1L, 2L, 0L)))
    val s4 = got(4L).get // grams: "x y"×2, "y x"×2
    assert((s4.getLong(0), s4.getLong(1), s4.getLong(2), s4.getLong(3),
      s4.getLong(4)) === ((5L, 2L, 2L, 4L, 4L)))
  }
}
