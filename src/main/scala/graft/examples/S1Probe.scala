package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe: s1 stage costs at sf0.1. */
object S1Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
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
    val client = time("collect client")(
      graft.sources.EventStream.clientFromParquet(spark, s"$d/events.parquet", 8))
    (1 to 2).foreach { i =>
      time(s"stream run $i") {
        graft.analytics.StreamingQueries.streamCountByType(spark, d).count()
      }
    }
    spark.stop()
  }
}
