package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BloomAttachment, IncrementalBloomIndex, IndexedTable, ZoneMapIndex}

/** One-off phase profiler for the q234 gate (round-16 VERDICT item 3:
  * the 6.9→11 s driver-tail mover) — times each phase of the gate so
  * the facade serve cost separates from index-build/rebuild cost.
  * Run: `SPARK_GRAFT_CPUS=4 sbt "runMain graft.tools.Q234Profile
  * /root/testdata/sf0.1"`. */
object Q234Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[q234prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm like Bench
    s.range(1000000).selectExpr("sum(id)").collect()
    (1 to 2).foreach { pass =>
      println(s"[q234prof] ---- pass $pass ----")
      val base = "/tmp/graft_q234_profile"
      val fs = org.apache.hadoop.fs.FileSystem
        .get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val orders = graft.sources.Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val mx = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val w = mx / 8 + 1
      val cut = 2 * w / 5
      val withUnit = phase("checkpoint orders")(orders
        .withColumn("unit", expr(s"o_orderkey div $w").cast("int"))
        .localCheckpoint())
      phase("write table")(withUnit.write.mode("overwrite")
        .partitionBy("unit").parquet(s"$base/tbl"))
      val idx = ZoneMapIndex(s"$base/idx")
      phase("zone init+apply") {
        idx.init(s, "int", "long")
        idx.applyBatch(withUnit, "unit", "o_orderkey", 0L)
      }
      val bloom = IncrementalBloomIndex(s"$base/bidx",
        nShards = 64, words = 1024)
      phase("bloom init+apply") {
        bloom.init(s)
        bloom.applyBatch(withUnit, "o_orderkey", 0L)
      }
      val doomed = col("unit").isin(2, 3) && (col("o_orderkey") % w) < cut
      phase("delete rewrite")(s.read.parquet(s"$base/tbl").where(!doomed)
        .repartition(col("unit"))
        .write.mode("overwrite").partitionBy("unit").parquet(s"$base/opt"))
      val opt = s.read.parquet(s"$base/opt")
      def mn2: Long = idx.read(s).where(col("unit") === 2).head().getLong(1)
      val mnBefore = phase("mn2 before")(mn2)
      val probeBefore = phase("zone probe before")(
        idx.matchingUnits(s, lit(2 * w), lit(2 * w + cut / 2)))
      import graft.expressions.BloomMightContainCol
      val deletedProbes = withUnit.where(doomed)
        .select("o_orderkey").orderBy("o_orderkey").limit(40)
        .localCheckpoint()
      def bloomPairs: Long = bloom.read(s).join(broadcast(
          deletedProbes.select(xxhash64(col("o_orderkey")).as("__h"))
            .distinct()))
        .where(BloomMightContainCol(col("__h"), col("bloom_bits"), 7))
        .count()
      val pairsBefore = phase("bloom pairs before")(bloomPairs)
      phase("zone rebuildUnits")(idx.rebuildUnits(
        opt.where(col("unit").isin(Seq(2, 3).map(Integer.valueOf(_)): _*)),
        "unit", "o_orderkey",
        withUnit.where(doomed).select("unit").distinct()))
      phase("bloom rebuildShards")(bloom.rebuildShards(opt, "o_orderkey",
        withUnit.where(doomed)
          .select(bloom.shardOf(col("o_orderkey")).as("shard")).distinct()))
      phase("mn2 after")(require(mn2 > mnBefore))
      phase("zone probe after")(
        idx.matchingUnits(s, lit(2 * w), lit(2 * w + cut / 2)))
      phase("bloom pairs after")(bloomPairs)
      val (lo2, hi2) = (2 * w + cut, 2 * w + cut + w / 5)
      val table234 = IndexedTable(s"$base/opt",
        zoneMaps = Map("o_orderkey" -> idx),
        blooms = Seq(BloomAttachment("o_orderkey", bloom)))
      val probes = withUnit.where(col("o_orderkey") % 97 === 0)
        .select("o_orderkey")
      // facade serves
      phase("facade range serve")(table234.readWhere(s, Seq(
          IndexedTable.Range("o_orderkey", lit(lo2), lit(hi2))))
        .select("o_orderkey", "o_custkey", "o_totalprice").count())
      phase("facade point serve")(table234.readWhere(s, Seq(
          IndexedTable.KeyIn("o_orderkey", probes)))
        .select("o_orderkey", "o_custkey", "o_totalprice").count())
      // r14 hand-composed serves, for the A/B
      phase("hand range serve") {
        val units2 = idx.matchingUnits(s, lit(lo2), lit(hi2))
        opt.where(col("unit")
            .isin(units2.map(u => Integer.valueOf(u.toInt)): _*))
          .where(col("o_orderkey") >= lo2 && col("o_orderkey") <= hi2)
          .count()
      }
      phase("hand point serve") {
        val shardSet = bloom.matchingShards(s, probes, "o_orderkey")
        opt.where(bloom.shardOf(col("o_orderkey"))
            .isin(shardSet.map(Long.box): _*))
          .join(broadcast(probes.distinct()), Seq("o_orderkey"), "left_semi")
          .count()
      }
      probes.unpersist()
    }
    s.stop()
  }
}
