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
    // r14 phase attribution: profile pass vs the direct join+agg vs the
    // registered (cached+checkpointed) form — warm min-of-3 each.
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-12s min=${ts.min}%6.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("profile") { graft.analytics.Dedup.containmentDfProfile(spark, sf); () }
    time("direct") { graft.analytics.Dedup.containmentDedupDirect(spark, sf).count(); () }
    time("registered") { graft.analytics.Dedup.containmentDedup(spark, sf).count(); () }
    // finer slices of the direct path
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    def shingles = graft.analytics.Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("graft_shingle_hashes(split(text, ' '), 3)").as("sgs"))
      .filter(size(col("sgs")) > 0)
    def inc = shingles.select(col("doc_id"),
      size(col("sgs")).cast("long").as("sz"), explode(col("sgs")).as("h"))
    time("shingles") { shingles.write.format("noop").mode("overwrite").save() }
    time("incidences") { inc.write.format("noop").mode("overwrite").save() }
    val probe = inc.select(col("doc_id").as("a_id"), col("sz").as("sa"), col("h"))
    val index = inc.select(col("doc_id").as("b_id"), col("sz").as("sb"), col("h"))
    val joined = probe.join(index, "h")
      .filter(col("a_id") =!= col("b_id") && lit(2L) * col("sb") >= col("sa"))
    time("join-noop") { joined.write.format("noop").mode("overwrite").save() }
    val agged = joined.groupBy(col("a_id"), col("b_id"), col("sa"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(lit(2L) * col("n_shared") >= col("sa"))
    time("join+agg") { agged.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
