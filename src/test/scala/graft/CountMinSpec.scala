package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.CountMin

/** Count-Min sketch: overestimate-only point queries within the eN
  * bound, bit-identical counters under any partitioning, and the
  * Scala/Column hash twins agree. */
class CountMinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val d = 4; private val w = 256

  test("estimates never underestimate and stay within the eps*N bound") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: token t_k appears ~1000/k times
    val toks = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"tok$k")) ++
      Seq.fill(2000)(s"noise${rnd.nextInt(500)}")
    val n = toks.length.toLong
    val exact = toks.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
    val m = toks.toDF("tok")
      .agg(CountMin(col("tok"), d, w).as("m"))
      .select(col("m")).as[Seq[Long]].head()
    val eps = math.E / w
    exact.foreach { case (t, c) =>
      val est = (0 until d).map(i => m(i * w + CountMin.cell(t, i, w))).min
      assert(est >= c, s"underestimate for $t: $est < $c")
      assert(est - c <= (2 * eps * n).toLong + 1,
        s"error bound broken for $t: est=$est exact=$c n=$n")
    }
  }

  test("counters are bit-identical under any partitioning") {
    val toks = (1 to 4000).map(i => s"t${i % 97}")
    def run(parts: Int): Seq[Long] = toks.toDF("tok").repartition(parts)
      .agg(CountMin(col("tok"), d, w).as("m"))
      .select(col("m")).as[Seq[Long]].head()
    assert(run(1) === run(13))
    assert(run(1) === run(32))
  }

  test("the Scala cell and the Column cell twin agree") {
    val toks = (1 to 200).map(i => s"word$i")
    val fromCol = toks.toDF("tok")
      .select(col("tok"),
        array((0 until d).map(i => CountMin.cellCol(col("tok"), i, w)): _*).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    toks.foreach { t =>
      val scala = (0 until d).map(i => CountMin.cell(t, i, w).toLong)
      assert(fromCol(t) === scala, s"hash twin mismatch for $t")
    }
  }
}
