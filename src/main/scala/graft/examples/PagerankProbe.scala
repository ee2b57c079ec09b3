package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): g1's phase split —
  * the corpus-sized edge fold (lag window + pair aggregation) vs the
  * 10-iteration exact-integer rank fixpoint on the ≤|types|² edge table.
  * Warm min-of-3 each, for the r14 optimization attribution.
  * Usage: runMain graft.examples.PagerankProbe [sfDir]
  */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-12s min=${ts.min}%6.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val ev = graft.analytics.Tables.events(spark, sf)
    // the corpus-sized part alone: lag window -> (src,dst,w) fold -> pnum
    def edges = {
      val trans = ev.select(
        lag(col("event_type"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
          .as("src"),
        col("event_type").as("dst"))
      val e = trans.filter(col("src").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val o = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
        .withColumnRenamed("src", "osrc")
      e.join(o, col("src") === col("osrc"))
        .select(col("src"), col("dst"),
          expr("(w * 1000000) div outw").as("pnum"))
    }
    time("edge-fold") { edges.write.format("noop").mode("overwrite").save() }
    time("nodes") { ev.select(col("event_type")).distinct()
      .write.format("noop").mode("overwrite").save() }
    time("g1-full") {
      graft.analytics.GraphOps.eventPagerank(spark, sf).count(); ()
    }
    val n = edges.count()
    val t = ev.select(col("event_type")).distinct().count()
    println(s"[probe] edge rows=$n distinct types=$t")
    spark.stop()
  }
}
