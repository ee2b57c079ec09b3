package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (64-dim float vectors):
  *
  *   - e1 brute-force cosine top-k: the exactness baseline. Probe set is
  *     tiny and broadcast; the big side streams through one codegen'd pass
  *     (dot product via `zip_with` + `aggregate` fold — no UDF). Per-probe
  *     top-k via window `row_number ≤ k` over probe partitions — never a
  *     global sort of the pair set.
  *   - e2 LSH-bucketed top-k: the 100 TB path. Sign-of-random-hyperplane
  *     signatures (hyperplanes derived deterministically from xxhash64, no
  *     driver-side randomness), bucket join on signature bands, cosine
  *     verify only within buckets.
  *   - e3 embedding near-dup: all pairs with cosine ≥ 0.95, via the same
  *     bucketed candidates — the embedding analog of MinHash dedup.
  *
  * Cosine values are double folds over float inputs; cross-engine float
  * summation isn't hash-stable, so e1's oracle pins ONLY (probe, neighbor,
  * rank) — rank ties are broken by vec_id in both engines. e2/e3 are
  * probabilistic-recall operators → rows-only checks.
  */
object Similarity {

  import Tables._

  private val dim = 64

  /** Native one-pass cosine (graft_cosine, codegen'd) — the higher-order
    * zip_with/aggregate formulation is interpreted per element. */
  private def cosine(a: String, b: String): Column = expr(s"graft_cosine($a, $b)")

  private def withVec(df: DataFrame, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("v", col(vecCol).cast("array<double>"))
  }

  /** e1 — brute-force cosine top-k for probe vectors (vec_id < 8, k=5). */
  def bruteCosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes)
      .join(emb, col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosine("pv", "v"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Rank-only oracle: DuckDB recomputes cosine with the same
    * double-accumulation fold (list_transform + list_sum over doubles),
    * identical tie-break. */
  val bruteCosineOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e)
      |SELECT probe_id, neighbor_id, rank FROM (
      |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
      |               / (a.vnorm * b.vnorm) DESC, b.vec_id) AS rank
      |  FROM n a JOIN n b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id < 8)
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** 32-bit sign signature against deterministic hyperplanes — native
    * codegen'd expression (graft_hyperplane_sig); the plane matrix is a
    * compile-time constant, nothing random at the driver. */
  private def signature(v: Column): Column = expr(s"graft_hyperplane_sig(${v.toString})")

  /** Two 16-bit bands of the 32-plane signature — 65k buckets per band, so
    * label-clustered corpora (vectors sharing sign patterns) don't produce
    * giant buckets. */
  private def withBands(df: DataFrame): DataFrame =
    df.withColumn("bands", array((0 until 2).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*))

  /** e2 — LSH-bucketed ANN: candidates share at least one signature band
    * with the probe; cosine verify + top-k within candidates only.
    * Candidates are ID PAIRS until after dedup — vectors never ride
    * through the exploded join or the distinct. */
  def lshCosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("v"), signature(col("v")).as("sig"))
    // top-k ANN wants RECALL at moderate similarity → short bands, many of
    // them (8 bands × 4 bits): P(candidate | cos≈0.4) ≈ 0.75 while still
    // pruning ~half the corpus per probe. Near-dup (e3) uses long bands.
    val annBanded = emb.withColumn("bands", array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 4).bitwiseAND(0xFL).as("key"))): _*))
    val banded = annBanded.select(col("vec_id"), explode(col("bands")).as("bk"))
    val probeBands = banded.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("bk"))
    val candidates = broadcast(probeBands)
      .join(banded, probeBands("bk") === banded("bk") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    candidates
      .join(broadcast(emb.select(col("vec_id").as("probe_id"), col("v").as("pv"))), "probe_id")
      .join(emb.select(col("vec_id"), col("v")), "vec_id")
      .withColumn("cosine", cosine("pv", "v"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** e3 — embedding-cosine near-dup: pairs with cosine ≥ 0.95 among LSH
    * bucket-mates (same signature → near-certain candidates for near-dups).
    * The corpus has no natural embedding near-dups (max pairwise cosine
    * ≈ 0.51), so the operator runs on the table unioned with a scaled copy
    * (same direction ⇒ cosine 1) — every original must pair with its copy. */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val base = embeddings(s, d)
    val doubled = base.unionByName(
      base.withColumn("vec_id", col("vec_id") + 1000000L)
        .withColumn("embedding", transform(col("embedding"), x => x * 2.0f)))
    val emb = withVec(doubled, "embedding")
      .select(col("vec_id"), col("v"), signature(col("v")).as("sig"))
    // id-only candidate pairs from bucket self-join; vectors join back
    // AFTER dedup — the distinct shuffles 16-byte pairs, never vectors
    val banded = withBands(emb).select(col("vec_id"), explode(col("bands")).as("bk"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    candidates
      .join(emb.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cosine", cosine("va", "vb"))
      .filter(col("cosine") >= 0.95)
      .select(col("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** e4 — IVF-bucketed ANN, the other classic scale path: a deterministic
    * coarse codebook (every Kth vector is a centroid — a fixed, reproducible
    * "training"), each vector assigned to its nearest centroid (one pass,
    * centroids broadcast), probes search only the `nProbe` nearest cells.
    * At 100 TB the assignment is the only full scan; per-probe work is
    * bounded by cell occupancy × nProbe. Rows-only (recall is approximate). */
  def ivfCosineTopK(s: SparkSession, d: String, k: Int = 5, nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    // codebook: vectors at ids 0, 31, 62, ... — deterministic, no limit()
    // (limit on unordered data picks arbitrary rows), no iterative training
    val centroids = emb
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    // assignment: argmax cosine over broadcast centroids (one codegen'd pass)
    val assignScore = Window.partitionBy(col("vec_id")).orderBy(col("cscore").desc, col("cell_id"))
    val assigned = emb.join(broadcast(centroids))
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crk", row_number().over(assignScore))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("cell_id"))
    // probes: the nProbe nearest cells per probe vector
    val probeScore = Window.partitionBy(col("probe_id")).orderBy(col("cscore").desc, col("cell_id"))
    val probeCells = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .join(broadcast(centroids))
      .withColumn("cscore", cosine("pv", "cv"))
      .withColumn("crk", row_number().over(probeScore))
      .filter(col("crk") <= nProbe)
      .select(col("probe_id"), col("pv"), col("cell_id"))
    // search only the probed cells
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probeCells)
      .join(assigned, "cell_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosine("pv", "v"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_ann_brute_topk" -> ((s: SparkSession, d: String) => bruteCosineTopK(s, d)),
    "e2_ann_lsh_topk" -> ((s: SparkSession, d: String) => lshCosineTopK(s, d)),
    "e3_embedding_neardup" -> (embeddingNearDup _),
    "e4_ann_ivf_topk" -> ((s: SparkSession, d: String) => ivfCosineTopK(s, d))
  )

  /** e2/e3 omitted: probabilistic recall → rows-only checks. */
  val oracles: Map[String, String] = Map(
    "e1_ann_brute_topk" -> bruteCosineOracle
  )
}
