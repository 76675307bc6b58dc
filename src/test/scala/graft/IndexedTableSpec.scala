package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BloomAttachment, IncrementalBloomIndex,
  IndexedTable, MultiColZoneMapIndex, ZoneMapIndex}
import graft.operators.IndexedTable.{KeyIn, Range}

/** readWhere facade (IndexedTable class doc): attached skipping
  * indexes prune by default, never answer — every read must equal
  * the plain filter bit-for-bit, the prune must reach the scan as a
  * partition filter, and predicates no index covers run residual-
  * only with identical results. */
class IndexedTableSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rm(dir: String): Unit = {
    def r(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(r)); x.delete() }
    r(new java.io.File(dir))
  }

  // 400 rows over 8 arrival-correlated units: k ascends with unit,
  // v = k * 3 rides along, g is arrival-UNcorrelated (prunes nothing)
  private lazy val table = {
    val base = "/tmp/graft_idxtbl_spec"
    rm(base)
    val t = spark.range(400).select(col("id").as("k"),
      (col("id") / 50).cast("int").as("unit"),
      (col("id") * 3L).as("v"), (col("id") % 7L).as("g"))
    t.write.partitionBy("unit").parquet(s"$base/tbl")
    val zm = ZoneMapIndex(s"$base/zm", buckets = 4)
    zm.init(spark, "int", "long")
    zm.applyBatch(t, "unit", "k", 0L)
    val mc = MultiColZoneMapIndex(s"$base/mc", Seq("k", "v"), buckets = 4)
    mc.init(spark, "int", Seq("long", "long"))
    mc.applyBatch(t, "unit", 0L)
    val bl = IncrementalBloomIndex(s"$base/bl", nShards = 16, buckets = 4)
    bl.init(spark)
    bl.applyBatch(t, "k", 0L)
    (s"$base/tbl", t, zm, mc, bl)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("zone-map range == the plain filter; prune reaches the partition scan") {
    val (path, t, zm, _, _) = table
    val it = IndexedTable(path, zoneMaps = Map("k" -> zm))
    val got = it.readWhere(spark, Seq(Range("k", lit(100L), lit(160L))))
    assert(rows(got) === (100L to 160L).toSet)
    // strict prune: 2 of 8 units survive the stats
    assert(it.prunedUnits(spark, Seq(Range("k", lit(100L), lit(160L))))
      .get === Set(2L, 3L))
    // ...and the prune is a PARTITION filter on the scan, not a row
    // filter after a full read
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("unit"),
      s"expected a partition filter on unit:\n$p")
  }

  test("multi-col conjunction == the plain box filter, one probe") {
    val (path, _, _, mc, _) = table
    val it = IndexedTable(path, multiCol = Some(mc))
    val got = it.readWhere(spark, Seq(
      Range("k", lit(60L), lit(120L)), Range("v", lit(200L), lit(330L))))
    // box: k in [60,120] AND v=3k in [200,330] -> k in [67..110]
    assert(rows(got) === (67L to 110L).toSet)
  }

  test("single-col maps of different columns INTERSECT their prunes") {
    val (path, _, zm, mc, _) = table
    // two single-column attachments (k via zm, v via a 1-col use of
    // the multi-col index would double-cover; use zm twice instead):
    // k's units [2,3] ∩ an impossible k range elsewhere -> empty
    val it = IndexedTable(path, zoneMaps = Map("k" -> zm))
    val empty = it.readWhere(spark, Seq(
      Range("k", lit(100L), lit(160L)), Range("k", lit(300L), lit(350L))))
    assert(rows(empty) === Set.empty[Long])
    // empty intersection short-circuits to the typed empty frame
    assert(empty.columns.contains("k"))
  }

  test("bloom point lookup == the plain IN filter; false positives die") {
    val (path, _, _, _, bl) = table
    val probes = Seq(7L, 123L, 999L).toDF("k") // 999 not in the table
    val it = IndexedTable(path,
      blooms = Seq(BloomAttachment("k", bl)))
    val got = it.readWhere(spark, Seq(KeyIn("k", probes)))
    assert(rows(got) === Set(7L, 123L))
  }

  test("an uncovered predicate prunes nothing but filters exactly") {
    val (path, _, zm, _, _) = table
    val it = IndexedTable(path, zoneMaps = Map("k" -> zm))
    // g has no index: residual-only
    val got = it.readWhere(spark, Seq(
      Range("k", lit(100L), lit(160L)), Range("g", lit(0L), lit(1L))))
    assert(rows(got) === (100L to 160L).filter(k => k % 7 <= 1).toSet)
    assert(it.prunedUnits(spark, Seq(Range("g", lit(0L), lit(1L))))
      === None, "no covering index -> no prune claim")
  }

  test("composed range + point predicates agree with the plain filters") {
    val (path, t, zm, _, bl) = table
    val probes = (0L until 400L by 31L).toDF("k")
    val it = IndexedTable(path, zoneMaps = Map("k" -> zm),
      blooms = Seq(BloomAttachment("k", bl)))
    val got = it.readWhere(spark, Seq(
      Range("k", lit(50L), lit(350L)), KeyIn("k", probes)))
    val expect = t.where(col("k").between(50L, 350L))
      .join(probes, Seq("k"), "left_semi")
    assert(rows(got) === rows(expect))
  }
}
