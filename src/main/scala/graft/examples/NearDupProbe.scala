package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does n1 spend time at sf0.1 (native signature path)? */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time(name: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-26s run$i n=$n%8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val hashed = docs.selectExpr("doc_id",
      "graft_shingle_hashes(split(regexp_replace(lower(text), '\\\\s+', ' '), ' ')) AS sh")
    time("native shingle hashes")(hashed.agg(sum(size(col("sh")))).head().getLong(0))
    val sig = hashed.withColumn("sig", expr("graft_minhash(sh)"))
    time("native signatures")(sig.agg(sum(pmod(element_at(col("sig"), 1), lit(1000000L)))).head().getLong(0))
    val banded = sig.select(col("doc_id"), posexplode(
      array((0 until 32).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * 2 + 1, 2))): _*)).as(Seq("band", "bandHash")))
    time("banded")(banded.count())
    val cand = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bandHash") === col("b.bandHash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("candidates")(cand.count())
    time("full n1")(graft.analytics.NearDup.minhashNearDup(spark, d).count())
    spark.stop()
  }
}
