package graft.analytics

import java.nio.file.Files

/** Shared scratch-directory helper for queries whose operator IS a write
  * (format round-trips, stream sinks, checkpoints).
  *
  * Every dir is registered for deletion in a JVM shutdown hook: the
  * returned DataFrames are LAZY (and s10's re-read respects
  * `_spark_metadata`), so deletion must not happen before the caller
  * materializes — a shutdown hook is the earliest safe point needing no
  * cooperation from callers. Without it, Bench's warm-up + min-of-N runs
  * accumulate full table copies under /tmp per run (ADVICE r7 for the
  * streaming family; ADVICE r8 for f1–f6, whose f6 copy is the entire
  * sorted lineitem table at rehearsal SFs).
  */
private[analytics] object Scratch {
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      try {
        val all = Files.walk(p)
        try all.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(f => { Files.deleteIfExists(f); () })
        finally all.close()
      } catch { case _: Throwable => () } // best-effort: never block shutdown
    }))
    p.toString
  }
}
