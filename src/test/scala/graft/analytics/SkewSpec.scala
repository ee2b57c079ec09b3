package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Skew handling, both flavors: the deterministic salted join (plan-time)
  * and AQE's runtime skew-join split. */
class SkewSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def skewedFacts = {
    val s = spark; import s.implicits._
    // key 0 is ~100x hotter than every other key
    ((0 until 20000).map(i => (0L, i.toLong)) ++
      (1 until 100).flatMap(k => (0 until 200).map(i => (k.toLong, i.toLong))))
      .toDF("k", "payload")
  }

  private def dim = {
    val s = spark; import s.implicits._
    (0 until 100).map(k => (k.toLong, s"name_$k")).toDF("k", "k_name")
  }

  test("salted join equals the plain join, and the join key carries the salt") {
    val plain = skewedFacts.join(dim, "k")
      .groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(skewedFacts, dim, "k", nSalts = 8)
    val saltedCounts = salted
      .groupBy("k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    saltedCounts shouldBe plain
    val plan = salted.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include("graft_salt")   // salt participates in the join keys
      plan should not include "CartesianProduct"
    }
  }

  test("salted join equals plain join on random data and salt counts (seeded)") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    (1 to 3).foreach { round =>
      val facts = (0 until 2000)
        .map(i => (rng.nextInt(30).toLong, i.toLong)).toDF("k", "payload")
      val dims = (0 until 30).map(k => (k.toLong, s"d$k")).toDF("k", "k_name")
      val nSalts = Seq(1, 3, 16)(round - 1)
      val plain = facts.join(dims, "k")
        .select("k", "payload", "k_name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val salted = Skew.saltedJoin(facts, dims, "k", nSalts)
        .select("k", "payload", "k_name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      withClue(s"nSalts=$nSalts") { salted shouldBe plain }
    }
  }

  test("AQE splits the skewed partition at runtime (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the non-skewed side is one row per key (so the join output stays
      // linear); the skew is in the facts side's shuffle partition sizes
      val s = spark; import s.implicits._
      val other = (0 until 100).map(k => (k.toLong, k.toLong)).toDF("k", "other")
      val joined = skewedFacts.join(other, "k")
      // AQE finalizes a plan only when THAT queryExecution runs — .count()
      // would build and execute a different (aggregated) plan
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) { plan should include("skew=true") }
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
