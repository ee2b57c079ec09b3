package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): phase attribution for
  * f6 (sort-clustered layout rewrite) and e15 (IVF-PQ encode chain) — the
  * two remaining mid-tier entries with no phase-level floor attribution.
  * Warm min-of-3, noop sinks (guide §1.4).
  * Usage: runMain graft.examples.LayoutProbe [sfDir]
  */
object LayoutProbe {
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
      println(f"[probe] $tag%-26s min=${ts.min}%6.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- f6 phases ----
    val li = graft.analytics.Tables.lineitem(spark, sf)
    time("f6-scan-only") { noop(li) }
    time("f6-range-exchange-only") {
      noop(li.repartitionByRange(spark.sparkContext.defaultParallelism,
        col("l_shipdate")).sortWithinPartitions(col("l_shipdate")))
    }
    val tmp = graft.analytics.Scratch.dir("probe-clust")
    time("f6-rewrite-write") {
      li.repartitionByRange(spark.sparkContext.defaultParallelism,
          col("l_shipdate")).sortWithinPartitions(col("l_shipdate"))
        .write.mode("overwrite").parquet(tmp)
    }
    time("f6-pruned-reread-agg") {
      spark.read.parquet(tmp)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows")).count(); ()
    }
    time("f6-full-entry") {
      graft.analytics.FormatQueries.f6ClusteredLayout(spark, sf).count(); ()
    }

    // ---- e15 phases ----
    time("e15-full-entry") {
      graft.analytics.Similarity.ivfPqTopK(spark, sf).count(); ()
    }
    spark.stop()
  }
}
