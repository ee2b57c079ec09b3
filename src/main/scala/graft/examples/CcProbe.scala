package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: round-count/wall-clock comparison of the two connected-
  * components cores (n4 min-label propagation vs n6 large-star/small-star)
  * on (a) the real near-dup pair graph at a given SF — tiny dense clusters,
  * label-prop's best case — and (b) a synthetic chain, the high-diameter
  * shape where label-prop pays one round per hop. Feeds SCALE.md.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chainN = args.lift(1).map(_.toInt).getOrElse(96)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s n=$n%6d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val real = graft.analytics.NearDup.minhashNearDup(spark, d)
      .select(col("doc_a"), col("doc_b")).cache()
    real.count()
    time("real graph: label-prop (n4)")(
      graft.analytics.NearDup.connectedComponentsLabelProp(real).count())
    time("real graph: big-star   (n6)")(
      graft.analytics.NearDup.connectedComponentsBigStar(real).count())

    val chain = (0L until (chainN - 1).toLong).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b").cache()
    chain.count()
    time(s"$chainN-chain: big-star   (n6)")(
      graft.analytics.NearDup.connectedComponentsBigStar(chain).count())
    time(s"$chainN-chain: label-prop (n4)")(
      graft.analytics.NearDup.connectedComponentsLabelProp(chain).count())
    // full registered queries (pair graph computed inside, as the bench
    // sees them) — pins the pairs-input caching in the label-prop core
    time("full n4 (uncached pair input)")(
      graft.analytics.NearDup.minhashClusters(spark, d).count())
    time("full n6 (uncached pair input)")(
      graft.analytics.NearDup.minhashClustersBigStar(spark, d).count())
    spark.stop()
  }
}
