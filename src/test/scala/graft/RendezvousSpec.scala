package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Splits
import org.apache.spark.sql.functions._

/** Rendezvous (HRW) sharding (q206's operator): the minimal-movement
  * law — growing n→n+1 moves docs ONLY onto the new shard, at ~1/(n+1)
  * rate — plus spread and determinism. */
class RendezvousSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("n=1 sends everything to shard 0") {
    val d = ids.select(Splits.rendezvousShard($"id", "s", 1).as("sh"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(d === Seq(0L))
  }

  test("movement law: n->n+1 movers land ONLY on the new shard") {
    val d = ids.select($"id",
      Splits.rendezvousShard($"id", "s", 8).as("old"),
      Splits.rendezvousShard($"id", "s", 9).as("nw"))
    val moved = d.where($"old" =!= $"nw")
    val movedTo = moved.select("nw").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(movedTo === Seq(8L), s"movers must land on the new shard: $movedTo")
    // expected 1/9 of 2000 ≈ 222; allow generous binomial slack
    val m = moved.count()
    assert(m > 120 && m < 330, s"moved fraction off: $m of 2000")
  }

  test("spread is roughly uniform across shards") {
    val counts = ids.select(Splits.rendezvousShard($"id", "s", 8).as("sh"))
      .groupBy("sh").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(counts.map(_._1).sorted === (0L until 8L))
    // 2000/8 = 250 expected; 4-sigma-ish band
    assert(counts.forall { case (_, c) => c > 170 && c < 330 },
      s"skewed: ${counts.toSeq.sortBy(_._1)}")
  }

  test("assignment is a pure function of (salt, id) — salt re-deals") {
    val again = ids.select($"id",
      Splits.rendezvousShard($"id", "s", 8).as("a"),
      Splits.rendezvousShard($"id", "s", 8).as("b"),
      Splits.rendezvousShard($"id", "other", 8).as("c"))
    assert(again.where($"a" =!= $"b").count() === 0L)
    assert(again.where($"a" =!= $"c").count() > 0L, "salt must re-deal")
  }
}
