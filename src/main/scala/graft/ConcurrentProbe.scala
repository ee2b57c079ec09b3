package graft

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Dev-only (VERDICT r11 #6): concurrent mixed workload at DATA scale on
  * one shared FAIR session — ConcurrencySpec gates correctness at test
  * scale; this probe runs a mixed read/write/staged set at sf1+ and
  * reports (a) hash equality of every concurrent result against its
  * sequential run, and (b) the timing interaction — per-query in-flight
  * times and the sequential-sum vs concurrent-wall ratio — the evidence
  * SCALE.md records for the boot-dispersion root-cause (scratch/persist
  * IO contention is the prime suspect).
  *
  * Usage: ConcurrentProbe <sfDir> [comma-separated query names]
  */
object ConcurrentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/sf1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      // write-heavy (f6/f8), join-heavy (d7/n6), stage-cache siblings
      // (e9+e17 share the graph; t24+p22 share the KN perdoc stage)
      "f6_clustered_layout", "f8_keyed_merge", "d7_containment_dedup",
      "n6_neardup_clusters_bigstar", "e9_knn_graph_2level", "e17_graph_ann",
      "t24_perplexity_filter", "p22_curriculum_schedule"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hashAndCount(name: String): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val h = rows.map(_.toString).sorted
        .foldLeft(1125899906842597L)((a, s) => a * 31 + s.hashCode)
      (h, rows.length.toLong, dt)
    }

    // pass 1 — sequential reference (scratch swept between queries, the
    // bench discipline)
    val seqRes = names.map { n =>
      val r = hashAndCount(n)
      graft.analytics.Scratch.sweep()
      n -> r
    }.toMap
    val seqSum = seqRes.values.map(_._3).sum

    // pass 2 — all-at-once on the shared session (FAIR pools per thread)
    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val w0 = System.nanoTime()
    val conc = Await.result(Future.sequence(names.map { n =>
      Future {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", n)
        n -> hashAndCount(n)
      }
    }), 60.minutes).toMap
    val wall = (System.nanoTime() - w0) / 1e9
    pool.shutdown()
    graft.analytics.Scratch.sweep()

    val mismatches = names.filter(n =>
      seqRes(n)._1 != conc(n)._1 || seqRes(n)._2 != conc(n)._2)
    def r2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val per = names.map(n =>
      s"""\"$n\":{"rows":${seqRes(n)._2},"seq":${r2(seqRes(n)._3)},"conc":${r2(conc(n)._3)}}""")
      .mkString("{", ",", "}")
    println(s"""{"probe":"concurrent","sf":"$sfDir","queries":$per,""" +
      s""""seq_sum":${r2(seqSum)},"conc_wall":${r2(wall)},""" +
      s""""speedup":${r2(seqSum / wall)},""" +
      s""""hash_mismatches":${mismatches.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    spark.stop()
    if (mismatches.nonEmpty) sys.exit(1)
  }
}
