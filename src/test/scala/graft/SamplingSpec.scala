package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Stratified sampling (q168's operator): the largest-remainder
  * allocation hits the target EXACTLY, apportionment matches the
  * hand-computed Hamilton quotas, the draw is partition-invariant,
  * and balanced caps at the stratum size. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // strata sizes: a=50, b=30, c=15, d=5 (n=100)
  private val rows: Seq[(Long, String)] =
    (1L to 50L).map(i => (i, "a")) ++ (51L to 80L).map(i => (i, "b")) ++
    (81L to 95L).map(i => (i, "c")) ++ (96L to 100L).map(i => (i, "d"))

  private def draw(targetN: Long, parts: Int) =
    Sampling.stratified(rows.toDF("doc_id", "lang").repartition(parts),
        "lang", "doc_id", targetN)
      .collect().map(r => (r.getLong(0), r.getString(1)))

  test("hits the target exactly with hand-checked Hamilton quotas") {
    // targetN=7: exact shares 3.5/2.1/1.05/0.35 → floors 3/2/1/0,
    // one leftover → largest remainder is a's .5 → quotas 4/2/1/0
    val got = draw(7L, 4)
    assert(got.length === 7)
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang === Map("a" -> 4, "b" -> 2, "c" -> 1), byLang)
  }

  test("remainder ties break by stratum key; draw is partition-invariant") {
    // targetN=2 over equal strata: shares 1/2 each, floors 0, all
    // remainders tie → leftovers go to the two lexicographically
    // first strata
    val eq = (1L to 40L).map(i => (i, "s" + ('a' + ((i - 1) / 10).toInt).toChar))
    val got = Sampling.stratified(eq.toDF("doc_id", "lang"),
        "lang", "doc_id", 2L)
      .collect().map(r => r.getString(1)).sorted.toSeq
    assert(got === Seq("sa", "sb"), got)
    assert(draw(7L, 1).toSet === draw(7L, 13).toSet)
  }

  test("temperature α=1 degenerates to proportional; α=0.5 upweights small strata") {
    val df = rows.toDF("doc_id", "lang")
    // α=1: weights n·1000 have the same shares as n — identical draw
    val prop = Sampling.stratified(df, "lang", "doc_id", 20L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val t1 = Sampling.temperatureMix(df, "lang", "doc_id", 20L, alpha = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(t1 === prop)
    // α=0.5 on sizes 50/30/15/5: √-shares ≈ .414/.321/.227/.131 of
    // √-total — the smallest stratum d must gain vs its 1/20
    // proportional share, the largest lose
    def byLang(s: Set[(Long, String)]) =
      s.groupBy(_._2).view.mapValues(_.size).toMap.withDefaultValue(0)
    val t5 = byLang(Sampling.temperatureMix(df, "lang", "doc_id", 20L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    val p = byLang(prop)
    assert(t5("d") > p("d"), s"small stratum not upweighted: $t5 vs $p")
    assert(t5("a") < p("a"), s"large stratum not shrunk: $t5 vs $p")
    assert(t5.values.sum === 20)
  }

  test("balanced caps at min(k, stratum size)") {
    val got = Sampling.balanced(rows.toDF("doc_id", "lang"),
        "lang", "doc_id", 10L)
      .collect().map(r => r.getString(1))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got === Map("a" -> 10, "b" -> 10, "c" -> 10, "d" -> 5), got)
  }
}
