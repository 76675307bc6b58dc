package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.UidDictionary

/** Reference-parity: UID dictionary guarantees — deterministic ids,
  * immutability under extension, forward+reverse consistency, width
  * exhaustion (`uid/UIDProviderTest.scala`, `uid/UIDCacheTest.scala`,
  * widths `core/MarketDB.scala:23-24`). */
class UidDictionarySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("build is deterministic: ids dense in name order") {
    val df = Seq("RTS", "FORTS", "RTS", "MICEX").toDF("market")
    val dict = UidDictionary.build(df, "market")
    val got = dict.orderBy("uid").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("FORTS", 1L), ("MICEX", 2L), ("RTS", 3L)))
  }

  test("extend never renumbers existing ids") {
    val dict = UidDictionary.build(Seq("b", "d").toDF("n"), "n")
    val extended = UidDictionary.extend(dict, Seq("a", "b", "c").toDF("n"), "n")
    val got = extended.orderBy("uid").collect().map(r => (r.getString(0), r.getLong(1)))
    // b,d keep 1,2; a,c appended as 3,4 in name order
    assert(got.toSeq === Seq(("b", 1L), ("d", 2L), ("a", 3L), ("c", 4L)))
  }

  test("encode/decode round-trip via broadcast join") {
    val facts = Seq(("RTS", 1.0), ("FORTS", 2.0)).toDF("market", "v")
    val dict = UidDictionary.build(facts, "market")
    val enc = UidDictionary.encode(facts, dict, "market", "market_uid")
    assert(enc.where(col("market_uid").isNull).count() === 0)
    val dec = UidDictionary.decode(
      enc.drop("market"), dict, "market_uid", "market")
    assert(dec.select("market").distinct().count() === 2)
  }

  test("fixed-width id space exhaustion is rejected") {
    // 1-byte market ids (MarketDB.scala:23): capacity 255
    val dict = UidDictionary.build(
      (1 to 255).map(i => f"m$i%03d").toDF("n"), "n")
    val ex = intercept[IllegalArgumentException] {
      UidDictionary.extend(dict, Seq("overflow").toDF("n"), "n", maxWidthBytes = 1)
    }
    assert(ex.getMessage.contains("exhausted"))
  }
}
