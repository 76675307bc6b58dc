package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RtsCsv

/** Reference-parity: RTS archive parse — golden count 60 valid trades
  * per day file (`TradeDataIterateeTest.scala:26`), header/blank
  * filtering, reject quarantine (FIXTURES.md §A.3). Fixture is
  * synthesized with the same format:
  * `code;contract;price;amount;dat_time;trade_id;Nosystem`. */
class RtsCsvSpec extends AnyFunSuite with SparkTestBase {

  // the ONE golden fixture generator — shared with q82's oracle, so
  // the spec matrix and the cross-engine parse check cannot drift
  private def writeFixture(): String = RtsCsv.writeGoldenFixture()

  test("parses 60 valid trades, quarantines 2 rejects") {
    val path = writeFixture()
    val trades = RtsCsv.trades(spark, Seq(path))
    assert(trades.count() === 60)
    val rejects = RtsCsv.rejects(spark, Seq(path))
    assert(rejects.count() === 2)
    val reasons = rejects.select("reject_reason").collect().map(_.getString(0)).sorted
    assert(reasons === Array("bad dat_time", "bad price"))
  }

  test("zip archive source filters entries and parses 60 trades") {
    val dir = Files.createTempDirectory("rtszip").toFile
    val csv = ("code;contract;price;amount;dat_time;trade_id;Nosystem" +:
      (0 until 60).map(i =>
        f"RIH2;RTS-3.12;${157000 + i}%d.00000;1;2012-02-01 10:00:${i % 60}%02d.000;${497757776L + i}%d;0"))
      .mkString("\n")
    val zipPath = new java.io.File(dir, "FT120201.zip")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("120201ft.csv"))
    zos.write(csv.getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    zos.write("ignore me".getBytes("UTF-8")); zos.closeEntry()
    zos.close()

    val trades = RtsCsv.tradesFromZip(spark, zipPath.getAbsolutePath)
    assert(trades.count() === 60) // golden count, TradeDataIterateeTest.scala:26
    assert(trades.select("market").distinct().head().getString(0) === "RTS")
  }

  test("decimal ingest holds 5-dp prices exactly, round-trips parquet") {
    val dir = Files.createTempDirectory("rtsdec").toFile
    // 0.00001 and 157000.12345 are NOT binary-representable: a double
    // path would show .000009999… / .123449999…; DECIMAL(18,5) is exact
    val content = Seq(
      "code;contract;price;amount;dat_time;trade_id;Nosystem",
      "RIH2;RTS-3.12;0.00001;1;2012-02-01 10:00:00.000;1;0",
      "RIH2;RTS-3.12;157000.12345;2;2012-02-01 10:00:01.000;2;0",
      "RIH2;RTS-3.12;not_a_price;1;2012-02-01 10:00:02.000;3;0"
    ).mkString("\n")
    val f = new java.io.File(dir, "120201ft.csv")
    Files.writeString(f.toPath, content)

    val t = RtsCsv.tradesDecimal(spark, Seq(f.getAbsolutePath))
    val priceType = t.schema("price").dataType
    assert(priceType === org.apache.spark.sql.types.DecimalType(18, 5))
    assert(t.count() === 2) // bad price still quarantined
    val prices = t.orderBy("tradeId").collect()
      .map(_.getDecimal(3).toPlainString)
    assert(prices === Array("0.00001", "157000.12345"))

    // parquet round-trip preserves the exact decimal
    val out = new java.io.File(dir, "out").getAbsolutePath
    t.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("price").dataType ===
      org.apache.spark.sql.types.DecimalType(18, 5))
    assert(back.orderBy("tradeId").collect().map(_.getDecimal(3).toPlainString)
      === Array("0.00001", "157000.12345"))

    // the documented cast boundary: explicit, caller-chosen
    val asDouble = t.withColumn("price",
      org.apache.spark.sql.functions.col("price").cast("double"))
    assert(asDouble.schema("price").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("typed schema and constant market") {
    val path = writeFixture()
    val t = RtsCsv.trades(spark, Seq(path))
    assert(t.schema.fieldNames.toSeq ===
      Seq("market", "security", "tradeId", "price", "amount", "time", "nosystem"))
    val first = t.orderBy("tradeId").head()
    assert(first.getString(0) === "RTS")
    assert(first.getString(1) === "RTS-3.12")
    assert(first.getLong(2) === 497757776L)
    assert(first.getDouble(3) === 157000.0)
  }
}
