package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): e17's phase split —
  * the cached embedding scan + count, the staged-graph read, and the
  * 3-hop beam search — warm min-of-3, for the r14 attribution.
  * Usage: runMain graft.examples.GraphAnnProbe [sfDir]
  */
object GraphAnnProbe {
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
    // warm the shared graph stage first so the search phases are isolated
    graft.analytics.Similarity.graphAnnTopK(spark, sf).count()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    time("emb-scan") {
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .write.format("noop").mode("overwrite").save()
    }
    time("emb-count") { emb.count(); () }
    time("e17-full") {
      graft.analytics.Similarity.graphAnnTopK(spark, sf).count(); ()
    }
    spark.stop()
  }
}
