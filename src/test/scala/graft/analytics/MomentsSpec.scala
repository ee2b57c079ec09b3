package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** q39's reason to exist: statistics from EXACT integer moments are
  * invariant to partitioning, while Spark's native double-folding
  * corr/covar are not. These specs pin both halves of that claim. */
class MomentsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q39 output is bit-identical across partitioning layouts") {
    def run(parts: Int) = {
      val li = Tables.lineitem(spark, sfDir).repartition(parts)
      // rebuild q39 over the repartitioned input (same expressions)
      val m = li.select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))").as("x"),
        col("l_quantity").cast("decimal(38,0)").as("y"))
      m.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
        .select(col("l_returnflag"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("corr"))
        .orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    val one = run(1)
    one.map(_._2).foreach(c => math.abs(c) should be <= 1.0)
    // exact moments ⇒ the SAME double bits regardless of how rows split
    run(7) shouldBe one
    run(32) shouldBe one
  }

  test("q39 corr agrees with Spark's native corr to float tolerance (sanity)") {
    val li = Tables.lineitem(spark, sfDir)
    val native = li.groupBy(col("l_returnflag"))
      .agg(corr(col("l_extendedprice") * 100, col("l_quantity")).as("c"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    ExtendedQueries.q39ExactMoments(spark, sfDir)
      .select(col("l_returnflag"), col("corr"))
      .collect().foreach { r =>
        r.getDouble(1) shouldBe native(r.getString(0)) +- 1e-9
      }
  }
}
