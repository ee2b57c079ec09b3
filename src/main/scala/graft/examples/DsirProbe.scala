package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): time s18's two
  * passes separately — the λ-table aggregation and the scoring pass —
  * to attribute the sf30 decade-check regression (SCALE.md r11).
  * Usage: runMain graft.examples.DsirProbe [sfDir]
  */
object DsirProbe {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lamSql =
      """WITH w AS (SELECT doc_id, lang, split(lower(text), ' ') AS ws FROM sdocs),
        |h AS (SELECT lang, graft_md5_prefix_hashes(
        |      transform(sequence(1, size(ws) - 1),
        |        i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) AS th
        |  FROM w WHERE size(ws) >= 2),
        |b AS (SELECT lang, bucket FROM h
        |  LATERAL VIEW explode(transform(th, t -> t % 1024)) e AS bucket),
        |tab AS (SELECT bucket, count(1) AS rawc,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
        |  FROM b GROUP BY bucket)
        |SELECT map_from_entries(collect_list(struct(bucket,
        |    CAST(length(bin(((tc + 1) * 1048576) div (rawc + 1))) - 1 - 20
        |      AS BIGINT)))) AS lmap
        |FROM tab""".stripMargin
    def lamDf() = graft.analytics.Views.sql(spark, docs, "sdocs", lamSql)
    time("lambda agg cold") { lamDf().count() }
    val lam = time("lambda agg + checkpoint") { lamDf().localCheckpoint() }
    time("batch scoring pass") {
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .crossJoin(broadcast(lam))
        .select(col("doc_id"), expr(
          """transform(graft_md5_prefix_hashes(transform(sequence(1, size(ws) - 1),
            |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))),
            |  t -> element_at(lmap, t % 1024))""".stripMargin).as("lams"))
        .select(col("doc_id"), size(col("lams")).cast("long").as("n_feats"),
          expr("aggregate(lams, 0L, (a, x) -> a + x)").as("importance"))
        .count()
    }
    spark.stop()
  }
}
