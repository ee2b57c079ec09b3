package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: n1's banding recall at an arbitrary SF, checked against a
  * Spark-side brute-force all-pairs ground truth (codegen'd merge-walk
  * Jaccard over the same xxhash64 shingle sets n1 verifies with — 12.5M
  * pairs at sf0.1 takes seconds on 32 cores, vs ~1 h for the DuckDB
  * string-list oracle).
  *
  * Exists because r5 found the original multiply-shift family
  * `x·A(h)+B(h)` NEVER overflowed (30-bit x × 32-bit A < 2⁶²), making
  * every "permutation" monotone in x — all 64 rows picked the same
  * argmin, so banding recall collapsed to ≈J and five J=0.89–0.99 pairs
  * escaped at sf0.1. Prints every escaped pair; exits nonzero if any.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val lsh = graft.analytics.NearDup.minhashNearDup(spark, d)
      .select(col("doc_a"), col("doc_b")).cache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val sh = docs.selectExpr("doc_id",
        "graft_shingle_hashes(split(regexp_replace(lower(text), '\\\\s+', ' '), ' ')) AS sh")
      .filter("size(sh) > 0").cache()
    // all-pairs ground truth: broadcast one side, codegen'd sorted-merge Jaccard
    val brute = sh.as("a").join(broadcast(sh.as("b")),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard", expr("graft_jaccard_sorted(a.sh, b.sh)"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("jaccard")).cache()

    val missed = brute.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
    val extra  = lsh.join(brute, Seq("doc_a", "doc_b"), "left_anti")
    val (nb, nl) = (brute.count(), lsh.count())
    val missedRows = missed.collect() // bounded: escaped pairs only
    val nExtra = extra.count()
    println(s"brute-force pairs=$nb  lsh pairs=$nl  missed=${missedRows.length}  extra=$nExtra")
    missedRows.foreach(r => println(s"  MISSED ${r.getLong(0)} ${r.getLong(1)} J=${r.getDouble(2)}"))
    spark.stop()
    if (missedRows.nonEmpty || nExtra > 0) sys.exit(1)
  }
}
