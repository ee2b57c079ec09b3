package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only: stage-level timing of g3's backbone derivation at a given SF
  * (sf10 slope investigation). */
object SlopeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val po = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    t("1 po distinct count")(po.count())

    val pairs = po.select(col("ok"), col("pk").as("pa"))
      .join(po.select(col("ok"), col("pk").as("pb")), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
    t("2 pair fold count")(pairs.count())

    t("3 takeordered 5000")(
      pairs.orderBy(col("w").desc, col("pa"), col("pb")).limit(5000).count())

    t("4 localCheckpoint of takeordered")(
      pairs.orderBy(col("w").desc, col("pa"), col("pb")).limit(5000)
        .localCheckpoint(true).count())

    // cached-po variant
    val poc = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("5 cache materialize")(poc.count())
    val pairsC = poc.select(col("ok"), col("pk").as("pa"))
      .join(poc.select(col("ok"), col("pk").as("pb")), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
    t("6 pair fold over cache")(pairsC.count())
    t("7 takeordered over cache")(
      pairsC.orderBy(col("w").desc, col("pa"), col("pb")).limit(5000)
        .localCheckpoint(true).count())
    poc.unpersist(true)
    spark.stop()
  }
}
