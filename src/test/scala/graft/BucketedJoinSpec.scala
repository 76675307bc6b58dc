package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables (SCALE.md): writing both fact
  * tables bucketed by the join key lets the sort-merge join consume
  * the bucket layout directly — zero Exchange in the join plan, the
  * shuffle was paid once at write time. This is the 100 TB pattern for
  * repeated big-big joins (e.g. lineitem ⋈ orders every query). */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without a shuffle") {
    val li = graft.sources.Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = graft.sources.Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // disable broadcast so the join must use the bucket layout
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"), first("o_totalprice").as("tp"))
      joined.queryExecution.executedPlan.execute().count()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the join itself consumes bucketed scans: the only Exchange
      // allowed is the one AFTER the join for the groupBy — none feeds
      // the SortMergeJoin
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(joinSection.contains("Scan"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"join inputs were shuffled despite buckets:\n$plan")
      // correctness unchanged vs the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      val got = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey")).count()
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
