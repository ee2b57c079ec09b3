package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only probe (not part of the driver contract): decomposes the
  * streaming family's per-entry cost — the suite's largest un-attributed
  * block (25 entries × ~1–1.4 s settled at sf0.1) — below entry level for
  * the first time. A [[StreamingQueryListener]] captures every
  * micro-batch's `durationMs` breakdown (triggerExecution, queryPlanning,
  * addBatch, walCommit, commitOffsets, latestOffset, getBatch) plus state
  * operator commit times, and the probe reports, per entry:
  *   total wall  =  Σ triggerExecution  +  "outside" (query start/stop,
  *   source schema read, post-drain batch read — everything the progress
  *   events cannot see).
  * Usage: runMain graft.examples.StreamProbe [sfDir] [entries,csv]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val entries = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("s1_stream_count_by_type", "s6_stream_window_counts",
        "s8_stream_interval_join", "s9_stream_sessions",
        "s15_stream_left_outer", "s11_stream_neardup"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // progress collector: durationMs per batch + state-store commit times
    val lock = new Object
    val batches = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, Long], Long, Long)] // (batchId, durationMs, rows, stateCommitMs)
    var starts = 0
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        lock.synchronized { starts += 1 }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        lock.synchronized {
          import scala.jdk.CollectionConverters._
          val d = e.progress.durationMs.asScala.map { case (k, v) => (k, v.longValue()) }.toMap
          val st = e.progress.stateOperators
            .map(s => s.allUpdatesTimeMs + s.commitTimeMs + s.allRemovalsTimeMs).sum
          batches += ((e.progress.batchId, d, e.progress.numInputRows, st))
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    // JIT/codegen warm-up at the smallest SF (the Bench discipline)
    entries.foreach { name =>
      try { graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count(); () }
      catch { case t: Throwable => println(s"[probe] warm $name FAILED: ${t.getMessage}") }
    }
    graft.analytics.Scratch.sweep()

    entries.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        lock.synchronized { batches.clear(); starts = 0 }
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        val total = (System.nanoTime() - t0) / 1e9
        // listener events are async — give the bus a beat to drain
        Thread.sleep(300)
        val (bs, nStarts) = lock.synchronized { (batches.toVector, starts) }
        val trig = bs.map(_._2.getOrElse("triggerExecution", 0L)).sum / 1e3
        val keys = Seq("latestOffset", "getBatch", "queryPlanning",
          "addBatch", "walCommit", "commitOffsets")
        val sums = keys.map(k => k -> bs.map(_._2.getOrElse(k, 0L)).sum / 1e3)
        val state = bs.map(_._4).sum / 1e3
        val rows = bs.map(_._3).sum
        println(f"[probe] $name run$run total=$total%6.2f s | queries=$nStarts batches=${bs.size} rows=$rows")
        println(f"[probe]   triggerExec=$trig%5.2f outside=${total - trig}%5.2f | " +
          sums.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ") +
          f" stateOps=$state%.2f")
      }
    }
    spark.stop()
  }
}
