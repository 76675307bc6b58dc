package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted skew join: row-identical to the plain join, with the hot key
  * spread across salt buckets. */
class SkewJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key
    val big = (0 until 1000).map(i =>
      (i.toLong, if (i < 900) "hot" else s"k${i % 7}", i * 1.5))
      .toDF("id", "key", "v")
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0)).toDF("key", "w")
    val salted = SkewJoin.salted(big, small, Seq("key"), col("id"), nSalt = 4)
      .select("id", "key", "v", "w")
    val plain = big.join(small, "key").select("id", "key", "v", "w")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt spreads a hot key across nSalt groups") {
    val big = (0 until 64).map(i => (i.toLong, "hot")).toDF("id", "key")
    val buckets = big
      .withColumn("salt", pmod(hash(col("id")), lit(8)))
      .select("salt").distinct().count()
    assert(buckets > 4, "hash salt should hit most of the 8 buckets")
  }
}
