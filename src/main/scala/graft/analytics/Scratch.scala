package graft.analytics

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Shared scratch-directory helper for queries whose operator IS a write
  * (format round-trips, stream sinks, checkpoints).
  *
  * Every dir is tracked and deleted either by [[sweep]] (harness-driven —
  * Bench/Verify call it between queries, keeping peak disk bounded during
  * a 148-query rehearsal instead of accumulating tens of GB of dead
  * stream/table copies whose IO contention skews later write-heavy
  * timings) or by the JVM shutdown hook as the final backstop. The
  * returned DataFrames are LAZY (and s10's re-read respects
  * `_spark_metadata`), so deletion must not happen before the caller
  * materializes — sweep only between queries, never mid-query.
  * Without any cleanup, Bench's warm-up + min-of-N runs accumulate full
  * table copies under /tmp per run (ADVICE r7 for the streaming family;
  * ADVICE r8 for f1–f6, whose f6 copy is the entire sorted lineitem
  * table at rehearsal SFs).
  */
private[graft] object Scratch {

  private val live = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))

  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    live.add(p)
    p.toString
  }

  /** Delete every scratch dir created so far. Call ONLY between queries —
    * a query's lazy consumers must have materialized first. Best-effort:
    * never throws. */
  def sweep(): Unit = {
    // release the engine slices' resident mock-shard cache with the same
    // between-query cadence (r12): at sf30 an unbounded cache held ~9 GB
    // of dead KRecord objects across the rest of the sweep
    try graft.sources.ShardedCorpus.evictAll()
    catch { case _: Throwable => () }
    var p = live.poll()
    while (p != null) {
      try {
        import scala.jdk.CollectionConverters._
        val all = Files.walk(p)
        try all.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(f => { Files.deleteIfExists(f); () })
        finally all.close()
      } catch { case _: Throwable => () }
      p = live.poll()
    }
  }
}
