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

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("vnorm", norm(col(vecCol).cast("array<double>")))
      .withColumn("v", col(vecCol).cast("array<double>"))

  /** e1 — brute-force cosine top-k for probe vectors (vec_id < 8, k=5). */
  def bruteCosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = withNorm(embeddings(s, d), "embedding").select(col("vec_id"), col("v"), col("vnorm"))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("vnorm").as("pnorm"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes)
      .join(emb, col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", dot(col("pv"), col("v")) / (col("pnorm") * col("vnorm")))
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

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * centered pseudo-uniform derived from xxhash64 — executors compute it
    * inline, nothing is broadcast or randomized at the driver. */
  private def planeComponent(plane: Int, i: Column): Column =
    (pmod(xxhash64(lit(plane), i), lit(2001L)).cast("double") - 1000.0d) / 1000.0d

  /** 16-bit sign signature of a vector against 16 deterministic hyperplanes. */
  private def signature(v: Column): Column =
    (0 until 16).map { p =>
      val proj = aggregate(
        zip_with(v, transform(sequence(lit(0), lit(dim - 1)), i => planeComponent(p, i)),
          (x, h) => x * h),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** e2 — LSH-bucketed ANN: candidates share at least one 8-bit signature
    * band with the probe; cosine verify + top-k within candidates only. */
  def lshCosineTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = withNorm(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("v"), col("vnorm"), signature(col("v")).as("sig"))
      .withColumn("bands", array((0 until 2).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 8).bitwiseAND(0xFFL).as("key"))): _*))
    val banded = emb.select(col("vec_id"), col("v"), col("vnorm"), explode(col("bands")).as("bk"))
    val probes = banded.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("vnorm").as("pnorm"), col("bk"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes)
      .join(banded, probes("bk") === banded("bk") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("pv"), col("pnorm"), col("vec_id"), col("v"), col("vnorm"))
      .distinct()
      .withColumn("cosine", dot(col("pv"), col("v")) / (col("pnorm") * col("vnorm")))
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
    val emb = withNorm(doubled, "embedding")
      .select(col("vec_id"), col("v"), col("vnorm"), signature(col("v")).as("sig"))
      .withColumn("bands", array((0 until 2).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 8).bitwiseAND(0xFFL).as("key"))): _*))
    val banded = emb.select(col("vec_id"), col("v"), col("vnorm"), explode(col("bands")).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("a.v").as("va"), col("a.vnorm").as("na"),
        col("b.vec_id").as("vec_b"), col("b.v").as("vb"), col("b.vnorm").as("nb"))
      .distinct()
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.95)
      .select(col("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_ann_brute_topk" -> ((s: SparkSession, d: String) => bruteCosineTopK(s, d)),
    "e2_ann_lsh_topk" -> ((s: SparkSession, d: String) => lshCosineTopK(s, d)),
    "e3_embedding_neardup" -> (embeddingNearDup _)
  )

  /** e2/e3 omitted: probabilistic recall → rows-only checks. */
  val oracles: Map[String, String] = Map(
    "e1_ann_brute_topk" -> bruteCosineOracle
  )
}
