package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): e9's fine-cell
  * occupancy histogram and per-stage timing at a given SF — attributes
  * the sf30 decade-check regression between the assignment passes and the
  * Σ occupancy² in-cell self-join (SCALE.md r11).
  * Usage: runMain graft.examples.KnnProbe [sfDir]
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/localdata/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.Similarity

    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val side = Similarity.sideFor(n)
    println(s"[probe] n=$n side=$side cells=${side.toLong * side}")
    val t0 = System.nanoTime()
    val hist = Similarity.fineCellHistogram(spark, sf, side, side)
      .agg(count(lit(1)).as("cells"), sum(col("o")).as("assigned"),
        max(col("o")).as("max_occ"), sum(col("o") * col("o")).as("sum_o2"))
      .head()
    val t1 = System.nanoTime()
    println(s"[probe] cells=${hist.getLong(0)} assigned=${hist.getLong(1)} " +
      s"max_occ=${hist.getLong(2)} sum_o2=${hist.getLong(3)}")
    println(f"[probe] assignment+hist: ${(t1 - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
