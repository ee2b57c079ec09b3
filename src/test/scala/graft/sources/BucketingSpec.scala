package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.analytics.Tables

/** Bucketed layout: co-located joins plan with NO shuffle on either side,
  * and `=` filters on the bucket key prune to a single bucket. */
class BucketingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val wh = "/tmp/graft_bucketed"

  test("join of two tables bucketed on the join key has no Exchange; results match the shuffled join") {
    import org.apache.spark.sql.{functions => F}
    val orders = Tables.orders(spark, sfDir)
      .select(F.col("o_orderkey"), F.col("o_totalprice"))
    val lineitem = Tables.lineitem(spark, sfDir)
      .select(F.col("l_orderkey"), F.col("l_quantity"))
    Bucketing.writeBucketed(orders, "orders_b", s"$wh/orders_b", 8, "o_orderkey")
    Bucketing.writeBucketed(lineitem, "lineitem_b", s"$wh/lineitem_b", 8, "l_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the co-location claim is what's actually tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "lineitem_b")
        .join(Bucketing.readBucketed(spark, "orders_b"),
          F.col("l_orderkey") === F.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        plan should not include "Exchange hashpartitioning"
      }
      val expected = lineitem
        .join(orders, F.col("l_orderkey") === F.col("o_orderkey")).count()
      joined.count() shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("equality filter on the bucket key prunes to a single bucket's files") {
    import org.apache.spark.sql.{functions => F}
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select(F.col("o_orderkey"), F.col("o_totalprice")),
      "orders_bp", s"$wh/orders_bp", 8, "o_orderkey")
    // the auto-bucketed-scan rule keeps bucketed reading only for plans
    // with an interesting partitioning (join/agg); a lone filter needs it
    // forced on before the pruning shows up
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val plan = Bucketing.readBucketed(spark, "orders_bp")
        .filter(F.col("o_orderkey") === 42)
        .queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SelectedBucketsCount: 1 out of 8")
      }
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS orders_bp")
    }
  }
}
