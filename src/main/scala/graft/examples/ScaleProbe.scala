package graft.examples

import org.apache.spark.sql.SparkSession

import graft.analytics.{Dedup, NearDup, PipelineOps, Similarity, Tables}

/** Dev-only round-8 rehearsal probe (not part of the driver contract):
  * measures the scale-hardening work at a given SF —
  *
  *   - `e7`: the kNN graph under the NEW self-scaling default (two-level
  *     codebook, k1 = k2 ≈ n^(1/4)) vs the single-level K ≈ √n knob; the
  *     old oracle-pinned K=16 default (803 s at sf10, VERDICT r7) is
  *     behind the separate `e7old` mode so the probe doesn't burn 15 min
  *     by accident;
  *   - `d7`: candidate volume with the prefix filter alone vs with
  *     PPJoin's length + positional filters, plus the full verified run —
  *     the SCALE.md candidate-count comparison;
  *   - `family`: the MinHash family sequentially in one session — the
  *     shared corpus signature table means n1 pays the signature pass
  *     once and d9/n4/n6/n7/p17/p18 reuse it.
  *
  * Usage: runMain graft.examples.ScaleProbe [sfDir] [mode,mode,...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val modes: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set("e7", "d7", "family")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n%d")
    }

    if (modes("e7")) {
      val n = Tables.embeddings(spark, sfDir).count()
      println(s"[probe] embeddings n=$n")
      time("e7 self-scaling default (two-level)") {
        Similarity.knnGraph(spark, sfDir).count()
      }
      time("e7 single-level K=sqrt(n) knob") {
        Similarity.knnGraph(spark, sfDir,
          nCells0 = math.ceil(math.sqrt(n.toDouble)).toInt).count()
      }
    }
    if (modes("e7old")) {
      time("e7 single-level K=16 (old default)") {
        Similarity.knnGraph(spark, sfDir, nCells0 = 16).count()
      }
    }
    if (modes("d7")) {
      time("d7 candidates: prefix+length only") {
        Dedup.containmentCandidates(spark, sfDir, positional = false).count()
      }
      time("d7 candidates: +positional") {
        Dedup.containmentCandidates(spark, sfDir).count()
      }
      time("d7 full verified run") {
        Dedup.containmentDedup(spark, sfDir).count()
      }
    }
    if (modes("family")) {
      time("n1 minhash near-dup (pays the sig pass)") {
        NearDup.minhashNearDup(spark, sfDir).count()
      }
      time("d9 fuzzy decontamination (reuses sigs)") {
        NearDup.minhashDecontaminate(spark, sfDir).count()
      }
      time("n4 clusters (reuses sigs)") {
        NearDup.minhashClusters(spark, sfDir).count()
      }
      time("n7 cluster rep (reuses sigs)") {
        NearDup.clusterRepresentative(spark, sfDir).count()
      }
      time("p17 leakage-safe split (reuses sigs)") {
        PipelineOps.p17LeakageSafeSplit(spark, sfDir).count()
      }
      time("p18 split-leakage audit (reuses sigs)") {
        PipelineOps.p18SplitLeakageAudit(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
