package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev-only probe (not part of the driver contract): d7's df profile —
  * Σdf and Σdf² (the direct strategy's exact candidate row volume) plus
  * the dispatch decision, for the SCALE.md r11 sf30 law attribution.
  * Usage: runMain graft.examples.ContainProbe [sfDir]
  */
object ContainProbe {
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
    graft.functions.GraftFunctions.register(spark)
    val (sumDf, sumDf2) = graft.analytics.Dedup.containmentDfProfile(spark, sf)
    println(s"[probe] sumDf=$sumDf sumDf2=$sumDf2 " +
      s"direct=${graft.analytics.Dedup.containmentDirectEligible(sumDf, sumDf2)}")
    spark.stop()
  }
}
