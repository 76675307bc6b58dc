package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** RTS exchange archive CSV source — the batch ETL entry of the
  * reference (`marketdb-loader/.../loader/TradeData.scala:36-100`):
  * `;`-separated lines `code;contract;price;amount;dat_time;trade_id;Nosystem`,
  * with header lines starting `code;contract` and blank lines skipped
  * (`TradeData.scala:74-75`), constant market "RTS"
  * (`TradeData.scala:30`).
  *
  * Spark-first design: declarative `spark.read.csv` with an explicit
  * schema; validation does not throw per row (the reference uses
  * `guard(...)` producing `Rejected`,
  * `model/AggregateRoot.scala:20-21`) — instead invalid rows carry a
  * `reject_reason` and are split into a quarantine side output, keeping
  * the happy path codegen-friendly and fully distributed.
  */
object RtsCsv {

  /** Fixed scratch dir + deterministic golden fixture (the RtsCsvSpec
    * matrix: 60 valid rows + a bad-price and a bad-time reject) — q82
    * writes it here and BOTH engines re-parse the same bytes, putting
    * the CSV parse semantics themselves (double/long try_cast,
    * millisecond timestamp format, quarantine reasons) under the
    * DuckDB oracle gate. */
  val scratchCsvDir: String = "/tmp/graft_q82_rts"

  def writeGoldenFixture(): String = {
    val rows = (0 until 60).map { i =>
      f"RIH2;RTS-3.12;${157000 + i}%d.00000;${1 + i % 5}%d;2012-02-01 10:${i / 60}%02d:${i % 60}%02d.00${i % 10}%d;${497757776L + i}%d;${if (i % 7 == 0) 1 else 0}%d"
    }
    val bad = Seq(
      "RIH2;RTS-3.12;not_a_price;1;2012-02-01 10:00:00.000;999000001;0",
      "RIH2;RTS-3.12;157000.00000;1;garbage-time;999000002;0")
    val content =
      ("code;contract;price;amount;dat_time;trade_id;Nosystem" +: (rows ++ bad))
        .mkString("\n")
    val dir = new java.io.File(scratchCsvDir)
    dir.mkdirs()
    // the oracle globs *.csv here while Spark reads the one returned
    // path — clear stale files so both sides see the same bytes (the
    // q58/q76 scratch parquet gets this for free from mode(overwrite))
    Option(dir.listFiles()).foreach(_.filter(_.getName.endsWith(".csv"))
      .foreach(_.delete()))
    val f = new java.io.File(dir, "120201ft.csv")
    java.nio.file.Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  /** Raw read: header/blank filtering via the csv reader options. */
  def readRaw(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true") // drops the `code;contract;...` header line
      .option("mode", "PERMISSIVE")
      .schema(Schemas.rtsTradeCsv)
      .csv(paths: _*)
      // blank-line guard (`TradeData.scala:74`): csv usually drops them,
      // but a lone separator row survives — require the key fields.
      .where(col("contract").isNotNull || col("trade_id").isNotNull)

  /** Typed parse (`TradeData.scala:36-48`) with reject-reason column
    * instead of exceptions. `try_cast`/`try_to_timestamp` yield NULL
    * for malformed values (ANSI mode would throw), which the guard
    * below converts to a quarantine reason. */
  def parse(raw: DataFrame): DataFrame = {
    val parsed = raw.select(
      lit("RTS").as("market"),
      col("contract").as("security"),
      expr("try_cast(trade_id AS LONG)").as("tradeId"),
      expr("try_cast(price AS DOUBLE)").as("price"),
      expr("try_cast(amount AS INT)").as("amount"),
      expr(s"try_to_timestamp(dat_time, '${Schemas.rtsTimeFormat}')").as("time"),
      (col("Nosystem") === "1").as("nosystem"))
    parsed.withColumn(
      "reject_reason",
      when(col("security").isNull, "missing security")
        .when(col("tradeId").isNull, "bad trade_id")
        .when(col("price").isNull, "bad price")
        .when(col("amount").isNull, "bad amount")
        .when(col("time").isNull, "bad dat_time"))
  }

  /** Zip archive read (`TradeData.scala:61-86`): `binaryFile` source +
    * per-partition unzip, keeping only `*ft.csv`/`*ot.csv` entries
    * (F3, `TradeData.scala:77-78`) and dropping header/blank lines
    * (F2, `:74-75`). Each executor streams its archives — no driver
    * involvement, scales with archive count. */
  def readZipRaw(spark: SparkSession, zipGlob: String,
      entrySuffixes: Seq[String] = Seq("ft.csv", "ot.csv")): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile")
      .load(zipGlob)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val zis = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        Iterator.continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => entrySuffixes.exists(s => e.getName.toLowerCase.endsWith(s)))
          .flatMap { _ =>
            val content = new String(zis.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            content.split("\r?\n").iterator
          }.toVector
      }
      .filter(l => l.nonEmpty && !l.startsWith("code;contract"))
    val cols = Schemas.rtsTradeCsv.fieldNames
    val split = split_part_all(lines.toDF("line"), cols)
    split
  }

  private def split_part_all(df: DataFrame, names: Seq[String]): DataFrame =
    df.select(names.zipWithIndex.map { case (n, i) =>
      element_at(split(col("line"), ";"), i + 1).as(n)
    }: _*)

  /** Decimal-typed parse variant (SURVEY §1.3 fidelity): the reference
    * holds price as `BigDecimal` with the RTS feed's 5-decimal scale
    * (`marketdb-api/.../model/Payload.scala:13`); `tradesDecimal`
    * parses the price text straight to DECIMAL(18,5) with NO double
    * intermediate — a 5-dp price like 0.00001 or 157000.12345 is held
    * exactly. The catalog/oracle surface stays double (CLAUDE.md hard
    * rule 3); this is the lossless-money ingest path, with the
    * double cast boundary at the caller's explicit choice
    * (`.withColumn("price", col("price").cast("double"))`). */
  def parseDecimal(raw: DataFrame): DataFrame = {
    val parsed = raw.select(
      lit("RTS").as("market"),
      col("contract").as("security"),
      expr("try_cast(trade_id AS LONG)").as("tradeId"),
      expr("try_cast(price AS DECIMAL(18,5))").as("price"),
      expr("try_cast(amount AS INT)").as("amount"),
      expr(s"try_to_timestamp(dat_time, '${Schemas.rtsTimeFormat}')").as("time"),
      (col("Nosystem") === "1").as("nosystem"))
    parsed.withColumn(
      "reject_reason",
      when(col("security").isNull, "missing security")
        .when(col("tradeId").isNull, "bad trade_id")
        .when(col("price").isNull, "bad price")
        .when(col("amount").isNull, "bad amount")
        .when(col("time").isNull, "bad dat_time"))
  }

  /** Valid rows with exact DECIMAL(18,5) prices. */
  def tradesDecimal(spark: SparkSession, paths: Seq[String]): DataFrame =
    parseDecimal(readRaw(spark, paths))
      .where(col("reject_reason").isNull).drop("reject_reason")

  /** Zip → typed trades (valid rows). */
  def tradesFromZip(spark: SparkSession, zipGlob: String): DataFrame =
    parse(readZipRaw(spark, zipGlob))
      .where(col("reject_reason").isNull).drop("reject_reason")

  /** Valid rows only, reject column dropped. */
  def trades(spark: SparkSession, paths: Seq[String]): DataFrame =
    parse(readRaw(spark, paths)).where(col("reject_reason").isNull).drop("reject_reason")

  /** Quarantine side output — the `Rejected` path of the reference's
    * event-sourced pipeline (`model/Trade.scala:52-54`). */
  def rejects(spark: SparkSession, paths: Seq[String]): DataFrame =
    parse(readRaw(spark, paths)).where(col("reject_reason").isNotNull)
}
