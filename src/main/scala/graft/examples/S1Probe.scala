package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe: s1 stage costs — corpus-build time vs drained stream run
  * (r10: the build is the distributed ShardedCorpus path; the old
  * driver-collect mock is probed alongside for the comparison).
  * Usage: S1Probe [sfDir] [shards] */
object S1Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val nEvents = spark.read.parquet(s"$d/events.parquet").count()
    val shards = args.lift(1).map(_.toInt)
      .getOrElse(math.max(8L, math.min(256L, nEvents / 12500L)).toInt)
    println(s"events=$nEvents shards=$shards")
    val c = time("sharded build")(
      graft.sources.ShardedCorpus.clientFor(spark, s"$d/events.parquet", shards))
    time("lazy shard loads")(
      c.listShards("x").foreach(s =>
        c.getRecords(c.iteratorAtIndex("x", s.shardId, 0L), 1)))
    (1 to 2).foreach { i =>
      time(s"stream run $i") {
        graft.analytics.StreamingQueries.streamCountByType(spark, d).count()
      }
    }
    spark.stop()
  }
}
