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
  * Cosine values are double folds over float inputs; the oracles pin
  * (probe, neighbor, rank) / id pairs, never raw floats — rank ties are
  * broken by vec_id in both engines. Every operator here is fully
  * oracle-derived: the LSH hyperplanes are exact rationals embedded as SQL
  * literals, so DuckDB recomputes signatures, buckets, assignment, and
  * top-k independently (r4; previously e2/e3/e4 were rows-only).
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
  /** Near-dup banding (e3). False-candidate volume grows as
    * bands · n² / 2^bits — the one super-linear term in the family
    * (measured: e3's slope is the suite's worst at sf1/sf10). 16-bit
    * bands are right for ~10⁴–10⁶ vectors; past that, 32 bits (one
    * full-signature band — at cos ≥ 0.95 per-bit agreement is ~0.9, so a
    * 32-bit exact match still recalls ~3.4% per genuine pair… the real
    * 10⁸+ deployment widens `HyperplaneConstants.numPlanes` and keeps
    * bits ≈ log₂(n) + 8; the knob exists so the growth law is a
    * configuration decision, not a rewrite). Resolution (VERDICT r7
    * item 1): explicit `bits0` (the e3 oracle pins 16 through the
    * registered query) → `spark.graft.ann.neardupBandBits` → SELF-SCALING
    * on corpus rows (≤10⁶ → 16, else 32). */
  private def withBands(df: DataFrame, bits0: Int = 0,
      selfScaleRows: => Long = 0L): DataFrame = {
    val bits =
      if (bits0 > 0) bits0
      else df.sparkSession.conf.getOption("spark.graft.ann.neardupBandBits") match {
        case Some(c) => c.toInt
        case None => if (selfScaleRows <= 1000000L) 16 else 32
      }
    require(bits == 8 || bits == 16 || bits == 32,
      s"neardup band bits must be 8, 16, or 32, got $bits")
    val nb = 32 / bits
    val mask = (1L << bits) - 1
    df.withColumn("bands", array((0 until nb).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * bits).bitwiseAND(mask).as("key"))): _*))
  }

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
    // probe vectors only — candidates always carry probe_id < 8, so the
    // broadcast is 8 rows, never the corpus (a driver-OOM at 100 TB otherwise)
    val probeVecs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    candidates
      .join(broadcast(probeVecs), "probe_id")
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
  def embeddingNearDup(s: SparkSession, d: String, bits0: Int = 0): DataFrame = {
    val base = embeddings(s, d)
    val doubled = base.unionByName(
      base.withColumn("vec_id", col("vec_id") + 1000000L)
        .withColumn("embedding", transform(col("embedding"), x => x * 2.0f)))
    // cached: the signature scan feeds BOTH self-join sides and BOTH
    // verify joins — uncached, the cast + 32-plane projection runs 4× over
    // the doubled corpus (measured 48 s at sf10; the sig table is the
    // "materialize signatures once" step, same as n1/n3/n5)
    val emb = withVec(doubled, "embedding")
      .select(col("vec_id"), col("v"), signature(col("v")).as("sig"))
      .cache()
    // id-only candidate pairs from bucket self-join; vectors join back
    // AFTER dedup — the distinct shuffles 16-byte pairs, never vectors
    val banded = withBands(emb, bits0, 2L * base.count())
      .select(col("vec_id"), explode(col("bands")).as("bk"))
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

  /** e20 — INCREMENTAL IVF MAINTENANCE (assign-only append): the index
    * lifecycle operation every production ANN deployment runs daily —
    * new vectors arrive, and rebuilding the whole index is the one cost
    * you cannot pay at 100 TB. The newest fifth of the corpus (by id —
    * appends carry increasing ids) is treated as the DELTA BATCH: the
    * coarse codebook is trained on the BASE only (e4's deterministic
    * every-31st rule, restricted below the cutoff), the delta is
    * assigned in its OWN pass against that FROZEN codebook, and search
    * spans the union of base and delta posting lists, flagging each hit's
    * provenance. Because per-row assignment depends only on the (frozen)
    * codebook, the union provably equals a full rebuild under the same
    * codebook — the invariant RoundTwelveBOpsSpec pins with an in-memory
    * one-pass replay, and the property that makes assign-only appends
    * SAFE to run forever (recall drifts only as the codebook ages, the
    * e5/e19-style recall audits' job to watch).
    *
    * Scale shape: the delta pass scans ONLY delta bytes (the vec_id
    * cutoff is a pushed parquet filter), which is the entire point: at
    * steady state the daily cost is |delta| · nCells codegen'd cosines +
    * a union of narrow (id, cell) tables — the base is never re-read.
    * Probe-side work is identical to e4 (broadcast codebook, bounded
    * per-cell candidates). Self-scaling cutoff: T = ⌊4n/5⌋ from one
    * count aggregate (the e9 discipline); the codebook self-limits to
    * ids below min(496, T) so centroids always live in the base. */
  def incrementalIvfTopK(s: SparkSession, d: String, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("v"))
    incrementalIvfTopKDf(s, emb, k, nCells, nProbe)
  }

  /** e20 on an explicit (vec_id, v) frame — spec seam for the
    * rebuild-equality replay. */
  private[graft] def incrementalIvfTopKDf(s: SparkSession, emb: DataFrame,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val t = 4L * emb.count() / 5L // append cutoff: newest fifth is delta
    val centroids = emb
      .filter(col("vec_id") % 31 === 0 &&
        col("vec_id") < math.min(31L * nCells, t))
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    val assignScore = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell_id"))
    def assign(part: DataFrame): DataFrame = part.join(broadcast(centroids))
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crk", row_number().over(assignScore))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("cell_id"))
    // the maintenance op: base posting lists + a SEPARATE delta-only
    // assignment pass against the frozen codebook, unioned
    val assigned = assign(emb.filter(col("vec_id") < t))
      .unionByName(assign(emb.filter(col("vec_id") >= t)))
    val probeScore = Window.partitionBy(col("probe_id"))
      .orderBy(col("cscore").desc, col("cell_id"))
    val probeCells = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .join(broadcast(centroids))
      .withColumn("cscore", cosine("pv", "cv"))
      .withColumn("crk", row_number().over(probeScore))
      .filter(col("crk") <= nProbe)
      .select(col("probe_id"), col("pv"), col("cell_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probeCells)
      .join(assigned, "cell_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosine("pv", "v"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"),
        (col("vec_id") >= t).cast("long").as("from_delta"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** e20 oracle — DuckDB re-derives cutoff, base-trained codebook, and
    * search; it assigns all vectors in ONE pass, which equals the
    * engine's base∪delta union because per-row assignment depends only
    * on the frozen codebook — the rebuild-equality invariant itself. */
  val incrementalIvfOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |c0 AS (SELECT (4 * count(*)) // 5 AS t FROM e),
      |cent AS (SELECT vec_id AS cell_id, v AS cv, vnorm AS cnorm
      |         FROM n CROSS JOIN c0
      |         WHERE vec_id % 31 = 0 AND vec_id < least(496, t)),
      |assigned AS (SELECT vec_id, cell_id FROM (
      |    SELECT n.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c) WHERE crk = 1),
      |pcells AS (SELECT probe_id, cell_id FROM (
      |    SELECT n.vec_id AS probe_id, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c WHERE n.vec_id < 8) WHERE crk <= 4)
      |SELECT probe_id, neighbor_id, rank, from_delta FROM (
      |  SELECT p.probe_id, s.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
      |      list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) DESC,
      |      s.vec_id) AS rank,
      |    CAST(CASE WHEN s.vec_id >= c0.t THEN 1 ELSE 0 END AS BIGINT) AS from_delta
      |  FROM pcells p JOIN assigned s ON s.cell_id = p.cell_id
      |       JOIN n a ON a.vec_id = p.probe_id
      |       JOIN n b ON b.vec_id = s.vec_id
      |       CROSS JOIN c0
      |  WHERE s.vec_id <> p.probe_id)
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e21 — CODEBOOK-DRIFT RECALL AUDIT: recall@5 against brute truth for
    * the FULL-corpus-trained codebook (e4) vs e20's FROZEN base-trained
    * codebook, per probe — the number an incremental-index deployment
    * watches to decide WHEN to retrain: e20's rebuild-equality makes
    * appends safe, and this audit quantifies the only cost left, recall
    * decay as the codebook ages past its training distribution. Closes
    * the recall-gate pattern over the maintenance member exactly as
    * e5/e12/e16/e19 do for their index families.
    *
    * Pure composition of three registered plans; top-k sets are tiny
    * (8 probes × 5), so the audit joins are broadcast-sized no matter
    * the corpus. */
  def codebookDriftRecall(s: SparkSession, d: String): DataFrame = {
    val brute = bruteCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"))
    val full = ivfCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("fhit"))
    val frozen = incrementalIvfTopK(s, d).select(col("probe_id"),
      col("neighbor_id"), lit(1).as("zhit"))
    brute
      .join(full, Seq("probe_id", "neighbor_id"), "left")
      .join(frozen, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("fhit")).as("full_hits"), count(col("zhit")).as("frozen_hits"))
      .withColumn("drift", col("full_hits") - col("frozen_hits"))
      .orderBy(col("probe_id"))
  }

  /** e21 oracle — the e1/e4/e20 oracles verbatim as CTEs (the e5
    * pattern), so the audit inherits their independent re-derivations. */
  def codebookDriftRecallOracle: String =
    s"""WITH brute AS ($bruteCosineOracle),
      |ivf AS ($ivfCosineOracle),
      |inc AS ($incrementalIvfOracle)
      |SELECT b.probe_id,
      |  count(f.probe_id) AS full_hits,
      |  count(z.probe_id) AS frozen_hits,
      |  count(f.probe_id) - count(z.probe_id) AS drift
      |FROM brute b
      |LEFT JOIN ivf f ON f.probe_id = b.probe_id
      |  AND f.neighbor_id = b.neighbor_id
      |LEFT JOIN inc z ON z.probe_id = b.probe_id
      |  AND z.neighbor_id = b.neighbor_id
      |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin

  /** e7 — MUTUAL k-NN GRAPH construction: every vector's top-k cosine
    * neighbors among its IVF cell-mates (the e4 codebook/assignment,
    * reused verbatim), kept only where the preference is RECIPROCAL
    * (a in b's top-k AND b in a's top-k). The mutual-kNN graph is the
    * curation workhorse behind density-based pruning, diversity
    * sampling, and graph-ANN index builds — and reciprocal-nearest
    * filtering is the standard trick to strip hub vectors (high-degree
    * false neighbors) without any tunable threshold. Within-cell
    * candidacy makes the result exactly reproducible (and
    * oracle-replayable) instead of depending on an index traversal
    * order.
    *
    * Scale shape: one broadcast-codebook assignment scan (e4's only
    * full pass), then a cell-keyed self-join whose quadratic term is
    * bounded by per-cell occupancy — nCells grows with the corpus
    * (the c2/SemDeDup K ≈ √n rule) so occupancy stays flat. The
    * directed top-k reduces each (src, cell) group to k rows BEFORE
    * the mutual join, which therefore joins two O(n·k) edge lists on
    * the (src, dst) pair key. Like c2 the self-join carries vectors
    * (dense in-cell candidates; an id-only pair distinct would shuffle
    * the pair set twice more).
    *
    * The in-cell quadratic term (n/K)²·K is the operator's growth law
    * (measured: 0.48 s at sf0.1 → 9.7 s at sf1 with K fixed at 16 — a
    * 20× slope for 10× data, exactly the occupancy square): K must grow
    * with the corpus, the c2/SemDeDup K ≈ √n rule.
    *
    * Parameter resolution (VERDICT r7 item 1 — the old oracle-pinned
    * default 16 was a measured 803 s scale-killer at sf10):
    *   - `nCells0 > 0`: explicit single-level K — what the e7 oracle pins
    *     (the registered query passes 16, immune to session config);
    *   - else `spark.graft.knn.cells` set: single-level K from config
    *     (the SCALE.md rehearsal knob, back-compatible);
    *   - else SELF-SCALING: the TWO-LEVEL codebook ([[knnGraphTwoLevel]],
    *     k1 = k2 ≈ n^(1/3) — the r11 balance rule, see [[sideFor]]):
    *     assignment n·(k1+k2) ≈ 2·n^(4/3) and in-cell verify Σocc² ≈
    *     n²/(k1·k2) = n^(4/3) — both terms the same exponent, the IVF
    *     cell-count optimum (the original n^(1/4) rule left the verify
    *     term at n^1.5 and it dominated from sf30 up). The one count()
    *     job is noise next to the assignment scan it sizes. */
  def knnGraph(s: SparkSession, d: String, k: Int = 3, nCells0: Int = 0): DataFrame = {
    if (nCells0 > 0) return knnGraphSingleLevel(s, d, k, nCells0)
    val conf = s.conf.getOption("spark.graft.knn.cells")
    conf match {
      case Some(c) => knnGraphSingleLevel(s, d, k, c.toInt)
      case None =>
        val side = sideFor(embeddings(s, d).count())
        knnGraphTwoLevel(s, d, k, side, side)
    }
  }

  /** Smallest s in [4, 512] with s³ ≥ n — the k1 = k2 ≈ n^(1/3) two-level
    * side rule as EXACT integer arithmetic, so the DuckDB oracle replays
    * it bit-for-bit from `count(*)` (a `ceil(pow(n, 1.0/3))` would hinge
    * on libm ULPs at exact cubes).
    *
    * Why n^(1/3), not the original n^(1/4) (r11 sf30 decade check): the
    * two-level cost has TWO terms — assignment n·(k1+k2) and the in-cell
    * verify self-join Σ occupancy² ≈ n²/(k1·k2). With s = n^(1/4) the
    * assignment is n^1.25 but the verify term is n²/√n = n^1.5, and at
    * sf30 the verify term dominated (measured Σo² = 1.0·10⁹ pairs,
    * 204–385 s; the documented law covered only the assignment). The
    * exponents BALANCE at s = n^(1/3): assignment 2·n^(4/3), verify
    * n²/n^(2/3) = n^(4/3) — the classic IVF cell-count optimum. The 512
    * cap keeps the broadcast fine codebook executor-sized (512² = 262k
    * cells ≈ 140 MB of 64-dim centroids; beyond n = 512³ ≈ 1.3·10⁸ the
    * verify term gracefully degrades toward n²/262k). */
  private[graft] def sideFor(n: Long): Int =
    (4 to 512).find(s => s.toLong * s * s >= n).getOrElse(512)

  /** Smallest s in [4, 4096] with s² ≥ n — the single-level K ≈ √n
    * occupancy rule, same exact-integer discipline. */
  private[analytics] def cellsFor(n: Long): Int =
    (4 to 4096).find(s => s.toLong * s >= n).getOrElse(4096)

  /** The single-level e7 at K = cellsFor(count) — self-scaling from the
    * corpus row count with the exact integer rule [[knnGraphOracle]]
    * replays. DEMOTED from the registered gate surface in r10 (VERDICT r9
    * #3a): both its compute terms (n·K assignment, (n/K)²·K in-cell
    * verify) are n^1.5 at K=√n by construction — the measured single-level
    * CONTRAST to e9's balanced n^(4/3) two-level path, which is what
    * `knnGraph` dispatches to unconfigured and what the bench should
    * measure. It
    * stays correctness-gated (KnnGraphContrastSpec re-derives the mutual
    * graph brute-force in-JVM; PlanSpec pins the join/limit shapes) and
    * keeps its DuckDB oracle + the isolated measurement protocol in
    * SCALE.md §e7. */
  def knnGraphSelfScaled(s: SparkSession, d: String, k: Int = 3): DataFrame =
    knnGraphSingleLevel(s, d, k, cellsFor(embeddings(s, d).count()))

  /** The REGISTERED e9: two-level at side = sideFor(count) — exactly the
    * plan [[knnGraph]]'s unconfigured default dispatches to, so the gate
    * covers the production path verbatim. */
  def knnGraphTwoLevelSelfScaled(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val side = sideFor(embeddings(s, d).count())
    knnGraphTwoLevel(s, d, k, side, side)
  }

  /** The self-scaled reciprocal graph, STAGED per (JVM, dataset)
    * (VERDICT r11 #3): e9 and e17 consume the SAME deterministic index
    * build, so the first of them to run materializes it through
    * [[StageCache]] and the other reads the staged parquet — exactly
    * production's amortization (an ANN graph is built once and searched
    * per query), and it removes the duplicated n^(4/3) build from the
    * bench's heaviest family. Content is a pure function of the dataset
    * (self-scaled side, deterministic ties), so both gates stay
    * byte-identical to the inline build. */
  private[analytics] def stagedTwoLevelGraph(s: SparkSession, d: String): DataFrame =
    StageCache.getOrBuild(s, s"e9graph:k3:$d") {
      knnGraphTwoLevelSelfScaled(s, d)
    }.orderBy(col("vec_a"), col("vec_b"))

  /** Single-level e7 core (K explicit). The mutual-pair result (≤ n·k
    * rows of two longs) is eagerly checkpointed so the corpus-sized
    * assignment cache releases NOW instead of at ContextCleaner GC — the
    * ADVICE r8 session-lifetime-cache rule, applied to the two biggest
    * remaining holders (e7/e9) after g2/t10. */
  def knnGraphSingleLevel(s: SparkSession, d: String, k: Int, nCells: Int): DataFrame = {
    val (out, assigned) = knnGraphSingleLevelPlan(s, d, k, nCells)
    val pinned = out.localCheckpoint(true)
    assigned.unpersist(false)
    pinned
  }

  /** e7's LAZY plan + the persisted assignment table — exposed so PlanSpec
    * can gate the join/limit shapes (the registered query's eager
    * checkpoint truncates the inspectable plan to an RDD scan). */
  private[graft] def knnGraphSingleLevelPlan(s: SparkSession, d: String, k: Int,
      nCells: Int): (DataFrame, DataFrame) = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val centroids = emb
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    // argmax as a partial+final struct-max (the n7 idiom), NOT a window:
    // the broadcast join's n·K candidate rows are consecutive per vec_id,
    // so the map-side partial_max collapses them to ONE row per vec_id
    // before any exchange — the window formulation shuffled and sorted all
    // n·K rows (the dominant term of e7's 50–84 s at sf10). Tie order is
    // the window's (cscore desc, cell_id asc): max of (cscore, -cell_id).
    // cached: feeds both sides of the in-cell self-join
    val assigned = emb.join(broadcast(centroids))
      .select(col("vec_id"), col("v"),
        struct(cosine("v", "cv").as("cscore"), (-col("cell_id")).as("nid"),
          col("cell_id").as("cid")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), max(col("cand")).as("best"))
      .select(col("vec_id"), col("v"), col("best.cid").as("cell_id"))
      // deserialized cache is the measured winner: an r9 experiment with
      // MEMORY_AND_DISK_SER traded ~12 s of min time for ser/deser CPU on
      // the self-join's repeated reads (62.6–83.2 s vs 50.1–73.2 s across
      // three isolated sf10 runs) — the spread is rig GC noise either way,
      // within the 1.5× bound (SCALE.md r9)
      .cache()
    val wTop = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    val topk = assigned.as("a").join(assigned.as("b"),
        col("a.cell_id") === col("b.cell_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        cosine("a.v", "b.v").as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("src"), col("dst"))
    val out = topk.as("x").join(topk.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src") &&
          col("x.src") < col("x.dst"))
      .select(col("x.src").as("vec_a"), col("x.dst").as("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
    (out, assigned)
  }

  /** e9 — TWO-LEVEL (coarse-then-fine) codebook kNN graph: the IVF/IMI
    * refinement that kills single-level e7's n·K assignment term (n^1.5
    * under the K ≈ √n occupancy rule — SCALE.md's own analysis, VERDICT r7
    * item 2). Level 1: k1 deterministic coarse centroids (the e4
    * every-31st-vector rule, coarse_id = vec_id div 31), cosine-argmax
    * assignment — one broadcast scan, n·k1 comparisons. Level 2: within
    * each coarse cell, the k2 LOWEST-ID members become fine centroids (a
    * deterministic, SQL-replayable "training"); each vector argmaxes over
    * its OWN cell's fine centroids only — an equi-join on coarse_id, n·k2
    * comparisons. Fine cells are (coarse_id, fine_id) pairs, K = k1·k2 of
    * them; with k1 = k2 = n^(1/3) (the r11 balance rule — [[sideFor]])
    * both the assignment n·(k1+k2) and the in-cell verify Σocc² ≈
    * n²/(k1·k2) land on the same n^(4/3) exponent.
    *
    * The directed top-k + reciprocal tail is e7's verbatim, keyed on the
    * composite cell. The registered e9 entry runs at side = sideFor(count)
    * — the same dispatch as [[knnGraph]]'s unconfigured default — and its
    * oracle re-derives the side from count(*) with the identical integer
    * rule, so the gate covers the production configuration at any SF. */
  def knnGraphTwoLevel(s: SparkSession, d: String, k: Int = 3,
      k1: Int = 4, k2: Int = 4): DataFrame = {
    val (out, caches) = knnGraphTwoLevelPlan(s, d, k, k1, k2)
    // eager small-result checkpoint → both corpus-sized assignment caches
    // release NOW (the e7/g2/t10 rule)
    val pinned = out.localCheckpoint(true)
    caches.foreach(_.unpersist(false))
    pinned
  }

  /** e9's LAZY plan + its two persisted assignment tables (see
    * [[knnGraphSingleLevelPlan]] for why PlanSpec needs the lazy form). */
  private[graft] def knnGraphTwoLevelPlan(s: SparkSession, d: String, k: Int,
      k1: Int, k2: Int): (DataFrame, Seq[DataFrame]) = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val coarse = emb
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * k1)
      .select(expr("vec_id div 31").as("coarse_id"), col("v").as("cv"))
    val wCoarse = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("coarse_id"))
    // cached: feeds the fine-centroid selection AND the fine assignment
    val coarseAssigned = emb.join(broadcast(coarse))
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("coarse_id"))
      .cache()
    val wFineSel = Window.partitionBy(col("coarse_id")).orderBy(col("vec_id"))
    val fine = coarseAssigned
      .withColumn("frk", row_number().over(wFineSel))
      .filter(col("frk") <= k2)
      .select(col("coarse_id"), col("vec_id").as("fine_id"), col("v").as("fv"))
    val wFine = Window.partitionBy(col("vec_id"))
      .orderBy(col("fscore").desc, col("fine_id"))
    // cached: feeds both sides of the in-cell self-join
    val assigned = coarseAssigned.join(broadcast(fine), "coarse_id")
      .withColumn("fscore", cosine("v", "fv"))
      .withColumn("rk2", row_number().over(wFine))
      .filter(col("rk2") === 1)
      .select(col("vec_id"), col("v"), col("coarse_id"), col("fine_id"))
      .cache()
    val wTop = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    val topk = assigned.as("a").join(assigned.as("b"),
        col("a.coarse_id") === col("b.coarse_id") &&
          col("a.fine_id") === col("b.fine_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        cosine("a.v", "b.v").as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("src"), col("dst"))
    val out = topk.as("x").join(topk.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src") &&
          col("x.src") < col("x.dst"))
      .select(col("x.src").as("vec_a"), col("x.dst").as("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
    (out, Seq(coarseAssigned, assigned))
  }

  /** Dev/probe helper: the (coarse, fine) cell occupancy table of e9's
    * assignment — Σ occupancy² is the in-cell self-join's exact row
    * volume, the term the sf30 decade check interrogates. */
  private[graft] def fineCellHistogram(s: SparkSession, d: String,
      k1: Int, k2: Int): DataFrame = {
    val (out, caches) = knnGraphTwoLevelPlan(s, d, 3, k1, k2)
    out.queryExecution // force analysis so caches exist
    val assigned = caches.last
    val h = assigned.groupBy(col("coarse_id"), col("fine_id"))
      .agg(count(lit(1)).as("o")).localCheckpoint(true)
    caches.foreach(_.unpersist(false))
    h
  }

  /** e9 oracle — both codebook levels re-derived independently: the side
    * from count(*) via the exact-integer s³ ≥ n rule (prm), coarse
    * centroids/assignment (the e4 CTEs), the per-cell lowest-side
    * fine-centroid selection, the in-cell fine argmax, then e7's directed
    * top-k + reciprocal tail on the composite cell key. Ties break on
    * (coarse_id | fine_id | vec_id) in both engines. */
  /** e9's CTE chain up to the directed in-cell top-k — shared verbatim by
    * [[knnGraphTwoLevelOracle]] and [[graphAnnOracle]] so both gates
    * re-derive the identical graph. */
  private val knnTwoLevelCtes: String =
    """WITH prm AS (SELECT coalesce(min(s), 512) AS side
      |  FROM generate_series(4, 512) t(s)
      |  WHERE s * s * s >= (SELECT count(*) FROM embeddings)),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |coarse AS (SELECT vec_id // 31 AS coarse_id, v AS cv, vnorm AS cnorm FROM n
      |           WHERE vec_id % 31 = 0 AND vec_id < 31 * (SELECT side FROM prm)),
      |ca AS (SELECT vec_id, coarse_id FROM (
      |    SELECT n.vec_id, c.coarse_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.coarse_id) AS crk
      |    FROM n, coarse c) WHERE crk = 1),
      |fine AS (SELECT coarse_id, fine_id FROM (
      |    SELECT coarse_id, vec_id AS fine_id,
      |      row_number() OVER (PARTITION BY coarse_id ORDER BY vec_id) AS frk
      |    FROM ca) WHERE frk <= (SELECT side FROM prm)),
      |fa AS (SELECT vec_id, coarse_id, fine_id FROM (
      |    SELECT ca.vec_id, ca.coarse_id, f.fine_id,
      |      row_number() OVER (PARTITION BY ca.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> nv.v[i] * nf.v[i])) / (nv.vnorm * nf.vnorm) DESC,
      |        f.fine_id) AS rk2
      |    FROM ca JOIN fine f ON f.coarse_id = ca.coarse_id
      |    JOIN n nv ON nv.vec_id = ca.vec_id
      |    JOIN n nf ON nf.vec_id = f.fine_id) WHERE rk2 = 1),
      |topk AS (SELECT src, dst FROM (
      |    SELECT a.vec_id AS src, b.vec_id AS dst,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> na.v[i] * nb.v[i])) / (na.vnorm * nb.vnorm) DESC,
      |        b.vec_id) AS rk
      |    FROM fa a JOIN fa b
      |      ON b.coarse_id = a.coarse_id AND b.fine_id = a.fine_id
      |     AND b.vec_id <> a.vec_id
      |    JOIN n na ON na.vec_id = a.vec_id
      |    JOIN n nb ON nb.vec_id = b.vec_id) t
      |  WHERE rk <= 3)""".stripMargin

  val knnGraphTwoLevelOracle: String = knnTwoLevelCtes +
    """
      |SELECT x.src AS vec_a, x.dst AS vec_b
      |FROM topk x JOIN topk y ON y.src = x.dst AND y.dst = x.src
      |WHERE x.src < x.dst ORDER BY vec_a, vec_b""".stripMargin

  /** e17 — GRAPH-TRAVERSAL ANN (the HNSW/DiskANN/NSG family member,
    * Malkov & Yashunin 2016; Subramanya et al. 2019): answer top-k by
    * GREEDY BEAM SEARCH over e9's reciprocal kNN graph instead of
    * scanning cells — the modern production ANN default, and the last
    * index family missing from e1/e2/e4/e6/e10/e11/e13/e15. Entry point
    * is per-probe: the best of e9's k1 coarse centroids (the IVF-graph
    * hybrid entry rule — cheap, deterministic, replayable). Each of the
    * `hops` rounds expands the beam by its graph neighbors and re-ranks
    * beam ∪ neighbors to width `beam` by exact cosine (ties on node id —
    * the greedy-search-without-visited-list formulation, which is
    * order-free and therefore SQL-replayable, unlike the priority-queue
    * variant). The final answer is the exact top-k of the surviving
    * beam, excluding the probe itself. Output shape matches e1.
    *
    * Scale shape: the graph build is e9's n^(4/3) two-level pass —
    * amortized exactly as in production (built once, searched per
    * query): e17 reads the [[StageCache]]-staged graph e9 also serves
    * from, so one dataset pays one build per JVM. Search
    * touches per hop: one equi-join of the ≤|probes|·beam broadcast beam
    * against the O(n·k) edge table, one id-lookup equi-join into the
    * corpus for vectors (at deployment scale both are bucketed point
    * lookups; here they are broadcast-hash probes — no shuffle of the
    * corpus side), and a |probes|·beam·(k+1)-row window. Beam state is
    * eagerly checkpointed per hop, so lineage stays flat and the
    * registered plan is equi-joins off an RDD scan. Candidate volume is
    * independent of corpus size — the defining property of graph ANN. */
  def graphAnnTopK(s: SparkSession, d: String, k: Int = 5, beam: Int = 8,
      hops: Int = 3): DataFrame = {
    // cached ONCE for the whole operator: the graph build's own scans
    // (identical canonical plan → CacheManager substitution), the probe
    // and coarse-entry slices, and every hop's id→vector lookup all hit
    // this instead of re-reading the parquet — the operator's one
    // corpus-sized persist, released before returning (the e9 rule)
    val emb = withVec(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("v")).cache()
    val side = sideFor(emb.count())
    // the graph build is SHARED with e9 via the stage cache (VERDICT
    // r11 #3) — first consumer builds, this one reads the staged parquet
    val rec = stagedTwoLevelGraph(s, d)
    val edges = rec.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .unionByName(rec.select(col("vec_b").as("src"), col("vec_a").as("dst")))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val coarse = emb.filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * side)
      .select(col("vec_id").as("node"), col("v").as("cv"))
    val wEntry = Window.partitionBy(col("probe_id"))
      .orderBy(col("escore").desc, col("node"))
    val wBeam = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("node"))
    // |probes| × k1 — both sides bounded; the cross scan IS the entry rule
    var beamDf = broadcast(probes).join(coarse)
      .withColumn("escore", cosine("pv", "cv"))
      .withColumn("erk", row_number().over(wEntry))
      .filter(col("erk") === 1)
      .select(col("probe_id"), col("node"))
    // Each hop's beam is CACHED (lazy), not eagerly materialized: the
    // whole search then runs as ONE job whose hop boundaries are the
    // beam-broadcast sub-stages, instead of `hops` sequential jobs each
    // paying full scheduling latency. Every beam is ≤ |probes|·beam rows.
    val hopCaches = Seq.newBuilder[DataFrame]
    (1 to hops).foreach { h =>
      val neigh = broadcast(beamDf).join(edges, col("node") === col("src"))
        .select(col("probe_id"), col("dst").as("node"))
      val cand = beamDf.unionByName(neigh).distinct()
      // the last hop keeps its scores: the final top-k re-ranks the
      // SAME beam by the SAME cosine, so no further corpus lookup runs
      val scored = broadcast(cand).join(emb, col("node") === col("vec_id"))
        .join(broadcast(probes), "probe_id")
        .withColumn("cos", cosine("pv", "v"))
        .withColumn("rk", row_number().over(wBeam))
        .filter(col("rk") <= beam)
      beamDf = (if (h < hops) scored.select(col("probe_id"), col("node"))
                else scored.select(col("probe_id"), col("node"), col("cos")))
        .cache()
      hopCaches += beamDf
    }
    val out = beamDf
      .filter(col("node") =!= col("probe_id"))
      .withColumn("rank", row_number().over(wBeam).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("node").as("neighbor_id"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
      .localCheckpoint(true)
    hopCaches.result().foreach(_.unpersist(false))
    emb.unpersist(false)
    out
  }

  /** e17 oracle — e9's full two-level CTE chain re-derived via
    * [[knnTwoLevelCtes]], the reciprocal edge set symmetrized, and the
    * 3-hop beam search unrolled: per-probe entry at the best coarse
    * centroid, each hop expands by graph neighbors and re-ranks
    * beam ∪ neighbors to width 8 with the shared cosine fold (ties on
    * node id), final exact top-5 excluding the probe. */
  val graphAnnOracle: String = {
    val cosPN = "list_sum(list_transform(generate_series(1, 64), " +
      "i -> p.pv[i] * nv.v[i])) / (p.pnorm * nv.vnorm)"
    val rounds = (1 to 3).map { r =>
      s"""c$r AS (SELECT DISTINCT probe_id, node FROM (
         |    SELECT probe_id, node FROM b${r - 1}
         |    UNION ALL
         |    SELECT b.probe_id, ed.dst FROM b${r - 1} b
         |    JOIN edges ed ON ed.src = b.node) u),
         |b$r AS (SELECT probe_id, node FROM (
         |    SELECT c.probe_id, c.node,
         |      row_number() OVER (PARTITION BY c.probe_id ORDER BY
         |        $cosPN DESC, c.node) AS rk
         |    FROM c$r c JOIN n nv ON nv.vec_id = c.node
         |    JOIN probes p ON p.probe_id = c.probe_id) t WHERE rk <= 8)""".stripMargin
    }.mkString(",\n")
    knnTwoLevelCtes + s""",
       |rec AS (SELECT x.src AS vec_a, x.dst AS vec_b
       |  FROM topk x JOIN topk y ON y.src = x.dst AND y.dst = x.src
       |  WHERE x.src < x.dst),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM rec
       |          UNION ALL SELECT vec_b, vec_a FROM rec),
       |probes AS (SELECT vec_id AS probe_id, v AS pv, vnorm AS pnorm
       |           FROM n WHERE vec_id < 8),
       |b0 AS (SELECT probe_id, node FROM (
       |    SELECT p.probe_id, c.coarse_id * 31 AS node,
       |      row_number() OVER (PARTITION BY p.probe_id ORDER BY
       |        list_sum(list_transform(generate_series(1, 64),
       |          i -> p.pv[i] * c.cv[i])) / (p.pnorm * c.cnorm) DESC,
       |        c.coarse_id) AS erk
       |    FROM probes p, coarse c) t WHERE erk = 1),
       |$rounds
       |SELECT probe_id, node AS neighbor_id, rank FROM (
       |  SELECT b.probe_id, b.node,
       |    row_number() OVER (PARTITION BY b.probe_id ORDER BY
       |      $cosPN DESC, b.node) AS rank
       |  FROM b3 b JOIN n nv ON nv.vec_id = b.node
       |  JOIN probes p ON p.probe_id = b.probe_id
       |  WHERE b.node <> b.probe_id) z
       |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  }

  /** e7 oracle — e4's codebook/assignment CTEs re-derived, the directed
    * in-cell top-k, then the reciprocal join; ties break by vec_id in
    * both engines, so the edge set hashes exactly. */
  val knnGraphOracle: String =
    """WITH prm AS (SELECT coalesce(min(s), 4096) AS kk
      |  FROM generate_series(4, 4096) t(s)
      |  WHERE s * s >= (SELECT count(*) FROM embeddings)),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |cent AS (SELECT vec_id AS cell_id, v AS cv, vnorm AS cnorm FROM n
      |         WHERE vec_id % 31 = 0 AND vec_id < 31 * (SELECT kk FROM prm)),
      |assigned AS (SELECT vec_id, cell_id FROM (
      |    SELECT n.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c) WHERE crk = 1),
      |topk AS (SELECT src, dst FROM (
      |    SELECT a.vec_id AS src, b.vec_id AS dst,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> na.v[i] * nb.v[i])) / (na.vnorm * nb.vnorm) DESC,
      |        b.vec_id) AS rk
      |    FROM assigned a JOIN assigned b
      |      ON b.cell_id = a.cell_id AND b.vec_id <> a.vec_id
      |    JOIN n na ON na.vec_id = a.vec_id
      |    JOIN n nb ON nb.vec_id = b.vec_id) t
      |  WHERE rk <= 3)
      |SELECT x.src AS vec_a, x.dst AS vec_b
      |FROM topk x JOIN topk y ON y.src = x.dst AND y.dst = x.src
      |WHERE x.src < x.dst ORDER BY vec_a, vec_b""".stripMargin

  /** e8 — MMR (maximal marginal relevance) DIVERSITY RE-RANKING: from each
    * probe's brute-force top-5 (e1's exact candidate set), greedily select
    * 3 by `λ·cos(probe, c) − (1−λ)·max_{s∈selected} cos(c, s)` with
    * λ = 0.7 — the standard redundancy-penalized retrieval used to keep
    * near-identical neighbors from crowding a result set (and, in corpus
    * curation, to pick diverse exemplars per cluster). The greedy loop is
    * UNROLLED for fixed depth 3, so the whole operator is three
    * argmax-over-a-tiny-set stages — no iteration state, no driver loop.
    *
    * Determinism: every cosine is the shared double fold; the MMR score
    * is two IEEE multiplies and a subtract applied identically in both
    * engines (0.3 written literally, never computed as 1 − 0.7); argmax
    * ties break on vec_id. Scale shape: the corpus-wide work is exactly
    * e1's scored scan; everything after operates on 8 probes × 5
    * candidates and the 5×4 in-set pair sims — broadcast-sized forever. */
  def mmrRerank(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val lam = 0.7; val oneMinusLam = 0.3
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos_pc").desc, col("vec_id"))
    val cands = broadcast(probes)
      .join(emb, col("vec_id") =!= col("probe_id"))
      .withColumn("cos_pc", cosine("pv", "v"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id").as("cand"), col("cos_pc"))
      .cache()
    // in-set pair similarities (5×4 per probe; vectors join back by id)
    val sims = cands.as("a").join(cands.as("b"),
        col("a.probe_id") === col("b.probe_id") && col("a.cand") =!= col("b.cand"))
      .select(col("a.probe_id").as("probe_id"), col("a.cand").as("ca"),
        col("b.cand").as("cb"))
      .join(emb.select(col("vec_id").as("ca"), col("v").as("va")), "ca")
      .join(emb.select(col("vec_id").as("cb"), col("v").as("vb")), "cb")
      .withColumn("sim", cosine("va", "vb"))
      .select(col("probe_id"), col("ca"), col("cb"), col("sim"))
    def argmax(df: DataFrame, score: Column): DataFrame = {
      val ws = Window.partitionBy(col("probe_id")).orderBy(score.desc, col("cand"))
      df.withColumn("srk", row_number().over(ws)).filter(col("srk") === 1)
        .select(col("probe_id"), col("cand"))
    }
    val s1 = argmax(cands, col("cos_pc"))
    val c2 = cands.join(s1.select(col("probe_id"), col("cand").as("sel1")), "probe_id")
      .filter(col("cand") =!= col("sel1"))
      .join(sims.select(col("probe_id"), col("ca").as("cand"),
        col("cb").as("sel1"), col("sim")), Seq("probe_id", "cand", "sel1"))
      .withColumn("sco", lit(lam) * col("cos_pc") - lit(oneMinusLam) * col("sim"))
    val s2 = argmax(c2, col("sco"))
    // two explicit sim lookups (vs sel1, sel2), then the max penalty
    val c3 = cands
      .join(s1.select(col("probe_id"), col("cand").as("sel1")), "probe_id")
      .join(s2.select(col("probe_id"), col("cand").as("sel2")), "probe_id")
      .filter(col("cand") =!= col("sel1") && col("cand") =!= col("sel2"))
      .join(sims.select(col("probe_id"), col("ca").as("cand"),
        col("cb").as("sel1"), col("sim").as("sim1")), Seq("probe_id", "cand", "sel1"))
      .join(sims.select(col("probe_id"), col("ca").as("cand"),
        col("cb").as("sel2"), col("sim").as("sim2")), Seq("probe_id", "cand", "sel2"))
      .withColumn("sco", lit(lam) * col("cos_pc") -
        lit(oneMinusLam) * greatest(col("sim1"), col("sim2")))
    val s3 = argmax(c3, col("sco"))
    s1.withColumn("mmr_rank", lit(1L))
      .unionByName(s2.withColumn("mmr_rank", lit(2L)))
      .unionByName(s3.withColumn("mmr_rank", lit(3L)))
      .select(col("probe_id"), col("mmr_rank"), col("cand").as("vec_id"))
      .orderBy(col("probe_id"), col("mmr_rank"))
  }

  /** e8 oracle — e1's scored-candidate derivation, the in-set pair sims,
    * and the unrolled 3-step greedy replayed in SQL with the identical
    * literal coefficients and tie-breaks. */
  val mmrRerankOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |sc AS (SELECT probe_id, cand, cos_pc FROM (
      |  SELECT a.vec_id AS probe_id, b.vec_id AS cand,
      |    list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) AS cos_pc,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) DESC,
      |      b.vec_id) AS rk
      |  FROM n a JOIN n b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id < 8) WHERE rk <= 5),
      |ps AS (SELECT x.probe_id, x.cand AS ca, y.cand AS cb,
      |    list_sum(list_transform(generate_series(1, 64), i -> na.v[i] * nb.v[i])) / (na.vnorm * nb.vnorm) AS sim
      |  FROM sc x JOIN sc y ON y.probe_id = x.probe_id AND y.cand != x.cand
      |  JOIN n na ON na.vec_id = x.cand JOIN n nb ON nb.vec_id = y.cand),
      |s1 AS (SELECT probe_id, cand FROM (
      |  SELECT probe_id, cand, row_number() OVER (PARTITION BY probe_id ORDER BY cos_pc DESC, cand) rk
      |  FROM sc) WHERE rk = 1),
      |c2 AS (SELECT sc.probe_id, sc.cand, 0.7 * sc.cos_pc - 0.3 * ps.sim AS sco
      |  FROM sc JOIN s1 ON s1.probe_id = sc.probe_id AND sc.cand != s1.cand
      |  JOIN ps ON ps.probe_id = sc.probe_id AND ps.ca = sc.cand AND ps.cb = s1.cand),
      |s2 AS (SELECT probe_id, cand FROM (
      |  SELECT probe_id, cand, row_number() OVER (PARTITION BY probe_id ORDER BY sco DESC, cand) rk
      |  FROM c2) WHERE rk = 1),
      |c3 AS (SELECT sc.probe_id, sc.cand,
      |    0.7 * sc.cos_pc - 0.3 * greatest(p1.sim, p2.sim) AS sco
      |  FROM sc
      |  JOIN s1 ON s1.probe_id = sc.probe_id
      |  JOIN s2 ON s2.probe_id = sc.probe_id
      |  JOIN ps p1 ON p1.probe_id = sc.probe_id AND p1.ca = sc.cand AND p1.cb = s1.cand
      |  JOIN ps p2 ON p2.probe_id = sc.probe_id AND p2.ca = sc.cand AND p2.cb = s2.cand
      |  WHERE sc.cand != s1.cand AND sc.cand != s2.cand),
      |s3 AS (SELECT probe_id, cand FROM (
      |  SELECT probe_id, cand, row_number() OVER (PARTITION BY probe_id ORDER BY sco DESC, cand) rk
      |  FROM c3) WHERE rk = 1)
      |SELECT probe_id, CAST(1 AS BIGINT) AS mmr_rank, cand AS vec_id FROM s1
      |UNION ALL SELECT probe_id, 2, cand FROM s2
      |UNION ALL SELECT probe_id, 3, cand FROM s3
      |ORDER BY probe_id, mmr_rank""".stripMargin

  /** e2 oracle — DuckDB recomputes the ENTIRE LSH definition independently:
    * the hyperplane matrix is a compile-time constant of exact rationals
    * (n/1e6, n integer), so its values are embedded as literal lists and the
    * signature, banding, candidate join, and cosine top-k are all derived in
    * SQL. Generated from [[graft.functions.HyperplaneConstants]] so the
    * oracle can never drift from the engine's constants. */
  private def planesValuesSql: String =
    graft.functions.HyperplaneConstants.planes.zipWithIndex.map { case (row, p) =>
      val lst = row.map(w =>
        s"CAST(${math.round(w * 1000000.0)} AS DOUBLE)/1000000.0").mkString(", ")
      s"($p, [$lst])"
    }.mkString(", ")

  def lshCosineOracle: String =
    s"""WITH pl(p, w) AS (VALUES $planesValuesSql),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |proj AS (SELECT e.vec_id, pl.p,
      |    list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * pl.w[i])) AS pr
      |  FROM e, pl),
      |sig AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
      |  FROM proj GROUP BY vec_id),
      |bands AS (SELECT vec_id, t.b, (sig >> (t.b * 4)) & 15 AS key
      |  FROM sig CROSS JOIN generate_series(0, 7) t(b)),
      |cand AS (SELECT DISTINCT pb.vec_id AS probe_id, cb.vec_id AS vec_id
      |  FROM bands pb JOIN bands cb ON pb.b = cb.b AND pb.key = cb.key AND cb.vec_id <> pb.vec_id
      |  WHERE pb.vec_id < 8),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e)
      |SELECT probe_id, neighbor_id, rank FROM (
      |  SELECT c.probe_id, c.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY c.probe_id ORDER BY
      |      list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) DESC,
      |      c.vec_id) AS rank
      |  FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.vec_id)
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e3 oracle — same independently-derived signature (planes as literals);
    * the doubled corpus is ×2 float scaling, which is exact in IEEE
    * arithmetic on both engines, so signatures and the 0.95 cosine
    * threshold agree bit-for-bit. */
  def embeddingNearDupOracle: String =
    s"""WITH pl(p, w) AS (VALUES $planesValuesSql),
      |base AS (SELECT vec_id, embedding FROM embeddings
      |         UNION ALL
      |         SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x * 2 AS FLOAT)) FROM embeddings),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM base),
      |proj AS (SELECT e.vec_id, pl.p,
      |    list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * pl.w[i])) AS pr
      |  FROM e, pl),
      |sig AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
      |  FROM proj GROUP BY vec_id),
      |bands AS (SELECT vec_id, t.b, (sig >> (t.b * 16)) & 65535 AS key
      |  FROM sig CROSS JOIN generate_series(0, 1) t(b)),
      |cand AS (SELECT DISTINCT ba.vec_id AS vec_a, bb.vec_id AS vec_b
      |  FROM bands ba JOIN bands bb ON ba.b = bb.b AND ba.key = bb.key AND ba.vec_id < bb.vec_id),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e)
      |SELECT vec_a, vec_b FROM cand c JOIN n a ON a.vec_id = c.vec_a JOIN n b ON b.vec_id = c.vec_b
      |WHERE list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) >= 0.95
      |ORDER BY vec_a, vec_b""".stripMargin

  /** e4 oracle — the IVF path has no engine-specific hashing at all
    * (deterministic codebook + cosine argmax), so DuckDB re-derives
    * codebook, assignment, probe cells, and the final top-k outright. */
  val ivfCosineOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |cent AS (SELECT vec_id AS cell_id, v AS cv, vnorm AS cnorm FROM n
      |         WHERE vec_id % 31 = 0 AND vec_id < 496),
      |assigned AS (SELECT vec_id, cell_id FROM (
      |    SELECT n.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c) WHERE crk = 1),
      |pcells AS (SELECT probe_id, cell_id FROM (
      |    SELECT n.vec_id AS probe_id, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c WHERE n.vec_id < 8) WHERE crk <= 4)
      |SELECT probe_id, neighbor_id, rank FROM (
      |  SELECT p.probe_id, s.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
      |      list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) DESC,
      |      s.vec_id) AS rank
      |  FROM pcells p JOIN assigned s ON s.cell_id = p.cell_id
      |       JOIN n a ON a.vec_id = p.probe_id
      |       JOIN n b ON b.vec_id = s.vec_id
      |  WHERE s.vec_id <> p.probe_id)
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e5 — recall@5 of the two approximate paths (LSH e2, IVF e4) against
    * the brute-force ground truth (e1), per probe, as exact integers:
    * regression insurance for LSH/IVF parameter changes — a band-width or
    * nProbe tweak that silently costs recall flips this query's hash even
    * if e2/e4 stay internally consistent. Pure composition of the three
    * ANN plans: top-k sets are tiny (8 probes × 5), so the joins are
    * broadcast-sized no matter the corpus. */
  def annRecall(s: SparkSession, d: String): DataFrame = {
    val brute = bruteCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"))
    val lsh = lshCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("lhit"))
    val ivf = ivfCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("ihit"))
    brute
      .join(lsh, Seq("probe_id", "neighbor_id"), "left")
      .join(ivf, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("lhit")).as("lsh_hits"), count(col("ihit")).as("ivf_hits"))
      .orderBy(col("probe_id"))
  }

  /** e5 oracle — the e1/e2/e4 oracles verbatim as CTEs (DuckDB supports a
    * nested WITH inside a CTE body), so the recall check inherits their
    * independent re-derivations rather than trusting the engine's output. */
  def annRecallOracle: String =
    s"""WITH brute AS ($bruteCosineOracle),
      |lsh AS ($lshCosineOracle),
      |ivf AS ($ivfCosineOracle)
      |SELECT b.probe_id,
      |  count(l.probe_id) AS lsh_hits,
      |  count(i.probe_id) AS ivf_hits
      |FROM brute b
      |LEFT JOIN lsh l ON l.probe_id = b.probe_id AND l.neighbor_id = b.neighbor_id
      |LEFT JOIN ivf i ON i.probe_id = b.probe_id AND i.neighbor_id = b.neighbor_id
      |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin

  /** e12 — REFINE-RECALL AUDIT: recall@5 against e1's brute-force truth
    * for the SQ8 index used RAW (e10) vs through e11's exact re-rank of
    * its top-32 candidates — the measurement that justifies shipping the
    * two-stage shape: quantization error that reorders the top-5 cannot
    * survive the refine unless the true neighbor fell outside the coarse
    * cut entirely. e5's composition pattern: the top-k sets are tiny, so
    * every join is broadcast-sized no matter the corpus. */
  def refineRecall(s: SparkSession, d: String): DataFrame = {
    val brute = bruteCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"))
    val raw = sq8TopK(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("qhit"))
    val refined = twoStageRerank(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("rhit"))
    brute
      .join(raw, Seq("probe_id", "neighbor_id"), "left")
      .join(refined, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("qhit")).as("sq8_hits"), count(col("rhit")).as("refined_hits"))
      .orderBy(col("probe_id"))
  }

  /** e12 oracle — the e1/e10/e11 oracles verbatim as CTEs (e5's nested-WITH
    * trick), so the audit inherits their independent re-derivations. */
  def refineRecallOracle: String =
    s"""WITH brute AS ($bruteCosineOracle),
      |sq8r AS ($sq8Oracle),
      |ref AS ($twoStageRerankOracle)
      |SELECT b.probe_id,
      |  count(q.probe_id) AS sq8_hits,
      |  count(r.probe_id) AS refined_hits
      |FROM brute b
      |LEFT JOIN sq8r q ON q.probe_id = b.probe_id AND q.neighbor_id = b.neighbor_id
      |LEFT JOIN ref r ON r.probe_id = b.probe_id AND r.neighbor_id = b.neighbor_id
      |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin

  /** e13 — METADATA-FILTERED ANN (the "filtered vector search" every
    * vector store ships): each probe retrieves its top-k ONLY among
    * corpus vectors sharing its `label` — the per-tenant / per-language /
    * per-license search shape. The filter is a plain equi-condition on
    * the typed metadata column, so it joins the index scan as a
    * PRE-filter: candidates are cut to the label partition BEFORE any
    * distance work (post-filtering top-k then discarding mismatches
    * under-fills k — the classic filtered-ANN bug this query's oracle
    * would catch, since it computes true in-label top-k).
    *
    * Scale shape: e1's sanctioned broadcast-probe pass with the label
    * equi-condition fused into the join — at 100 TB the label column is
    * the partition/bucket key of the vector table (f4's layout), so the
    * same predicate prunes directories before the scan. */
  def filteredAnn(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("label"), col("v"))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
        col("v").as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(probes)
      .join(emb, col("vec_id") =!= col("probe_id") &&
        col("label") === col("plabel"))
      .withColumn("cosine", cosine("pv", "v"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("label").cast("long").as("label"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** e13 oracle — e1's rank-only derivation with the label condition in
    * the join. */
  val filteredAnnOracle: String =
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e)
      |SELECT probe_id, neighbor_id, label, rank FROM (
      |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
      |    CAST(b.label AS BIGINT) AS label,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY list_sum(list_transform(generate_series(1, 64),
      |        i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) DESC, b.vec_id) AS rank
      |  FROM n a JOIN n b
      |    ON b.vec_id != a.vec_id AND b.label = a.label
      |  WHERE a.vec_id < 8)
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e14 — HYBRID RETRIEVAL WITH RECIPROCAL-RANK FUSION (Cormack et al.
    * 2009 — the RRF every hybrid search stack ships): fuse a LEXICAL
    * candidate list (t20's exact-BIGINT BM25, top-50 per probe) with a
    * VECTOR candidate list (e1's brute cosine top-50, `vec_id` = `doc_id`
    * by corpus construction) into one ranking,
    * RRF(d) = Σ_legs 1/(60 + rank_leg(d)) — staged exactly as
    * 2²⁰ div (60 + rank) per leg (ranks are already deterministic
    * integers in both engines, so the fused score is exact BIGINT; no
    * floats anywhere). `n_legs` reports 1- vs 2-leg hits — the classic
    * RRF diagnostic for how much the modalities agree.
    *
    * Scale shape: each leg keeps its own sanctioned shape (BM25's
    * broadcast-probe posting join; e1's broadcast-probe scan — a
    * production deployment swaps that leg for e2/e5/e10, the fusion is
    * leg-agnostic: ranks in, ranks out); fusion itself touches only
    * |probes|·50·2 id-rank rows — driver-free, corpus-free, and the
    * per-probe top-10 window pushes its limit map-side. */
  def hybridRrf(s: SparkSession, d: String, k: Int = 10,
      legK: Int = 50): DataFrame = {
    val lex = TextAnalytics.bm25TopK(s, d, k = legK)
      .select(col("probe_id"), col("doc_id").as("id"), col("rnk").as("r"))
    val emb = withVec(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("v"))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val vec = broadcast(probes)
      .join(emb, col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", cosine("pv", "v"))
      .withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= legK)
      .select(col("probe_id"), col("vec_id").as("id"), col("r"))
    val wf = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf_q").desc, col("id"))
    lex.unionByName(vec)
      .withColumn("c", expr("1048576 div (60 + r)"))
      .groupBy(col("probe_id"), col("id"))
      .agg(sum(col("c")).as("rrf_q"), count(lit(1)).as("n_legs"))
      .withColumn("rnk", row_number().over(wf).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("id").as("doc_id"), col("rrf_q"),
        col("n_legs"), col("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** e14 oracle — t20's BM25 chain at k=50 + e1's rank derivation at
    * k=50, fused with the identical integer RRF staging. */
  val hybridRrfOracle: String =
    """WITH tf AS (SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |        FROM documents) t
      |  GROUP BY doc_id, token),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS a
      |  FROM dl),
      |rq AS (SELECT doc_id, (dl * tot.n * 1024) // tot.a AS rq
      |  FROM dl CROSS JOIN tot),
      |dfx AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
      |nm AS (SELECT token,
      |    CAST(length(bin(tot.n // df)) - 1 AS BIGINT) AS ib,
      |    (tot.n * 1024) //
      |      (df * (CAST(1 AS BIGINT) << (length(bin(tot.n // df)) - 1))) AS m
      |  FROM dfx CROSS JOIN tot),
      |l1 AS (SELECT token, ib, CASE WHEN m*m >= 2097152 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN m*m >= 2097152 THEN (m*m) // 2048 ELSE (m*m) // 1024 END AS m
      |  FROM nm),
      |l2 AS (SELECT token, ib, 2*a + CASE WHEN m*m >= 2097152 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN m*m >= 2097152 THEN (m*m) // 2048 ELSE (m*m) // 1024 END AS m
      |  FROM l1),
      |l3 AS (SELECT token, ib, 2*a + CASE WHEN m*m >= 2097152 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN m*m >= 2097152 THEN (m*m) // 2048 ELSE (m*m) // 1024 END AS m
      |  FROM l2),
      |l4 AS (SELECT token, ib, 2*a + CASE WHEN m*m >= 2097152 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN m*m >= 2097152 THEN (m*m) // 2048 ELSE (m*m) // 1024 END AS m
      |  FROM l3),
      |l5 AS (SELECT token, ib, 2*a + CASE WHEN m*m >= 2097152 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN m*m >= 2097152 THEN (m*m) // 2048 ELSE (m*m) // 1024 END AS m
      |  FROM l4),
      |idf AS (SELECT token,
      |    64*ib + 2*a + CASE WHEN m*m >= 2097152 THEN 1 ELSE 0 END AS idf_q64
      |  FROM l5),
      |pt AS (SELECT DISTINCT doc_id AS probe_id, token
      |  FROM tf WHERE doc_id < 5),
      |sc AS (SELECT pt.probe_id, tf.doc_id,
      |    CAST(sum(idf.idf_q64 *
      |        ((22528 * tf.tf * 1024) //
      |         (10240 * tf.tf + 3072 + 9 * rq.rq))) AS BIGINT) AS score_q
      |  FROM pt JOIN tf ON pt.token = tf.token AND pt.probe_id <> tf.doc_id
      |  JOIN idf ON pt.token = idf.token
      |  JOIN rq ON tf.doc_id = rq.doc_id
      |  GROUP BY pt.probe_id, tf.doc_id),
      |lex AS (SELECT probe_id, doc_id AS id, rnk AS r FROM (
      |  SELECT probe_id, doc_id,
      |    row_number() OVER (PARTITION BY probe_id
      |      ORDER BY score_q DESC, doc_id) AS rnk
      |  FROM sc) x WHERE rnk <= 50),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |nrm AS (SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |vec AS (SELECT probe_id, neighbor_id AS id, rank AS r FROM (
      |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY list_sum(list_transform(generate_series(1, 64),
      |        i -> a.v[i] * b.v[i])) / (a.vnorm * b.vnorm) DESC, b.vec_id) AS rank
      |  FROM nrm a JOIN nrm b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id < 5) y WHERE rank <= 50),
      |u AS (SELECT probe_id, id, 1048576 // (60 + r) AS c FROM lex
      |  UNION ALL SELECT probe_id, id, 1048576 // (60 + r) AS c FROM vec),
      |f AS (SELECT probe_id, id, CAST(sum(c) AS BIGINT) AS rrf_q,
      |    CAST(count(*) AS BIGINT) AS n_legs
      |  FROM u GROUP BY probe_id, id)
      |SELECT probe_id, doc_id, rrf_q, n_legs, rnk FROM (
      |  SELECT probe_id, id AS doc_id, rrf_q, n_legs,
      |    CAST(row_number() OVER (PARTITION BY probe_id
      |      ORDER BY rrf_q DESC, id) AS BIGINT) AS rnk
      |  FROM f) z
      |WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin

  /** c1 — K-MEANS CLUSTERING (Lloyd's) over the embedding corpus: K=4,
    * two full assignment iterations, init centroids = the first K vectors.
    * This is the semantic-clustering primitive behind embedding-based corpus
    * curation (topic balancing, semantic dedup cells, IVF codebook
    * training — e4 consumes exactly this artifact class).
    *
    * The whole derivation is ENGINE-NEUTRAL integer arithmetic so DuckDB
    * replays both iterations bit-for-bit (the q24/n5 discipline):
    *
    *   - coordinates quantized once: q_i = round(x_i · 10^6) + 10^6 — an
    *     exact, strictly-positive BIGINT grid (inputs are |x| < 0.6);
    *   - distances are integer squared-L2 folds: Σ (q_i − c_i)² ≤ 64·(1.2·10^6)²
    *     ≈ 9·10^13, comfortably inside int64; argmin ties break on cluster id;
    *   - updated centroids are FLOOR-DIVIDED means, `sum div n` on positive
    *     ints — exact in both engines (a real-valued mean would reintroduce
    *     cross-engine rounding at the ULP).
    *
    * Scale shape (the e4 codebook pattern): each iteration is one scan of
    * the corpus against a K-row broadcast codebook (the one sanctioned
    * broadcast-nested-loop), then a (cid, pos) partial+final aggregation
    * whose output is K·dim rows regardless of corpus size. The quantized
    * corpus is cached across the two iterations. Iteration count is fixed
    * (2) — the production pattern for huge corpora, where each Lloyd round
    * is a full job and convergence-to-fixpoint is not run to exhaustion. */
  def kmeansClusters(s: SparkSession, d: String, kClusters: Int = 4): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) + 1000000)")
        .as("q"))
      .cache()
    val init = emb.filter(col("vec_id") < kClusters)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    def assign(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      emb.join(broadcast(cents))
        .withColumn("dist", expr(
          "aggregate(zip_with(q, cq, (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("q"), col("cid"))
    }
    val cents1 = assign(init)
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("sum(v) div count(1)").as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), p -> p.m)").as("cq"))
    assign(cents1)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("vec_id")).as("id_sum"),
        min(col("vec_id")).as("min_id"),
        max(col("vec_id")).as("max_id"))
      .select(col("cid").as("cluster_id"), col("n_members"), col("id_sum"),
        col("min_id"), col("max_id"))
      .orderBy(col("cluster_id"))
  }

  /** c1 oracle — DuckDB replays quantization, both assignment rounds, and
    * the floor-divided centroid update independently; `//` on the positive
    * sums matches Spark's `div` exactly. */
  val kmeansOracle: String =
    """WITH q AS (SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) + 1000000) AS q
      |  FROM embeddings),
      |init AS (SELECT vec_id AS cid, q AS cq FROM q WHERE vec_id < 4),
      |d1 AS (SELECT q.vec_id, q.q, i.cid,
      |    list_sum(list_transform(generate_series(1, 64),
      |      j -> (q.q[j] - i.cq[j]) * (q.q[j] - i.cq[j]))) AS dist
      |  FROM q CROSS JOIN init i),
      |a1 AS (SELECT vec_id, q, cid FROM (
      |    SELECT vec_id, q, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
      |    FROM d1) WHERE rk = 1),
      |e1 AS (SELECT cid, j AS pos, q[j] AS v
      |  FROM a1 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) js),
      |c1m AS (SELECT cid, pos, CAST(sum(v) AS BIGINT) // count(*) AS m
      |  FROM e1 GROUP BY 1, 2),
      |c1 AS (SELECT cid, list(m ORDER BY pos) AS cq FROM c1m GROUP BY 1),
      |d2 AS (SELECT q.vec_id, i.cid,
      |    list_sum(list_transform(generate_series(1, 64),
      |      j -> (q.q[j] - i.cq[j]) * (q.q[j] - i.cq[j]))) AS dist
      |  FROM q CROSS JOIN c1 i),
      |a2 AS (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
      |    FROM d2) WHERE rk = 1)
      |SELECT cid AS cluster_id, count(*) AS n_members,
      |  CAST(sum(vec_id) AS BIGINT) AS id_sum,
      |  min(vec_id) AS min_id, max(vec_id) AS max_id
      |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin

  /** c2 — SEMANTIC DEDUP (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): drop documents whose EMBEDDING is near-identical to
    * another document in the same semantic cell, where cells come from the
    * e4 codebook (deterministic every-31st-vector centroids, cosine-argmax
    * assignment). The cell structure is the whole point at scale: pairwise
    * cosine is only ever evaluated WITHIN a cell, bounding the quadratic
    * term by (corpus/nCells)² per cell instead of corpus² — nCells grows
    * with the corpus (SemDeDup uses K ≈ √n) so per-cell occupancy stays
    * flat. The keep rule is deterministic and fully parallel: a vector is
    * dropped iff some LOWER-ID cell-mate has cosine ≥ τ (the paper keeps a
    * random member per dup group; min-id is the reproducible choice, same
    * as d1/d5).
    *
    * The corpus has no natural embedding near-dups (max pairwise cosine
    * ≈ 0.51), so like e3 the operator runs on the table unioned with a
    * ×2-scaled copy (+1M ids): scaling by a power of two is exact in IEEE
    * arithmetic, so each copy lands in its original's cell with cosine
    * exactly 1 and must be dropped — n_dropped = n_originals per cell.
    *
    * Scale shape: one broadcast-codebook assignment pass (the only full
    * scan), then a cell-keyed self-join that CARRIES the vectors — with
    * dense in-cell candidates, re-joining vectors by id after a pair
    * `distinct` would shuffle the O(n²/cells) pair set twice more; carrying
    * them keeps the shuffle at O(n) vector rows and reduces the pair stream
    * to bare dropped ids inside the join operator (opposite trade to e3,
    * where LSH candidates are sparse). */
  def semanticDedup(s: SparkSession, d: String, tau: Double = 0.95,
      nCells0: Int = 0): DataFrame = {
    // SemDeDup's scale knob (K ≈ √n): per-cell occupancy n/K drives the
    // quadratic verify term (n/K)²·K — K must grow with the corpus.
    // Resolution (VERDICT r7 item 1): explicit arg (the oracle pins 16
    // through the registered query — immune to session config) →
    // `spark.graft.semdedup.cells` (rehearsal knob) → SELF-SCALING
    // K = √(2n) from a corpus count (capped at 65536; if K outruns the
    // every-31st id range the codebook self-limits to the ids present).
    val nCells = if (nCells0 > 0) nCells0
      else s.conf.getOption("spark.graft.semdedup.cells") match {
        case Some(c) => c.toInt
        case None =>
          val n = 2L * embeddings(s, d).count() // operator runs doubled
          math.max(16, math.min(65536,
            math.ceil(math.sqrt(n.toDouble)).toInt))
      }
    val base = embeddings(s, d)
    val doubled = base.unionByName(
      base.withColumn("vec_id", col("vec_id") + 1000000L)
        .withColumn("embedding", transform(col("embedding"), x => x * 2.0f)))
    // cached: feeds the centroid filter, the assignment scan, and (via
    // `assigned`) both sides of the cell self-join
    val emb = withVec(doubled, "embedding").select(col("vec_id"), col("v")).cache()
    val centroids = emb
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    val assignScore = Window.partitionBy(col("vec_id")).orderBy(col("cscore").desc, col("cell_id"))
    val assigned = emb.join(broadcast(centroids))
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crk", row_number().over(assignScore))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("cell_id"), col("v"))
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell_id") === col("b.cell_id") &&
          col("a.vec_id") < col("b.vec_id") &&
          cosine("a.v", "b.v") >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
      .withColumn("is_dup", lit(1))
    assigned.join(dropped, Seq("vec_id"), "left")
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_total"),
        count(col("is_dup")).as("n_dropped"),
        sum(when(col("is_dup").isNull, col("vec_id"))).as("kept_id_sum"))
      .select(col("cell_id").as("cluster_id"), col("n_total"),
        col("n_dropped"), col("kept_id_sum"))
      .orderBy(col("cluster_id"))
  }

  /** c2 oracle — DuckDB re-derives the doubled corpus, the e4 codebook
    * assignment, and the in-cell ≥ τ pair set independently (cosine at the
    * threshold is the e3-validated identical double fold; copy pairs sit at
    * exactly 1.0 and natural pairs below 0.51, so the τ = 0.95 boundary is
    * never within float noise). */
  val semanticDedupOracle: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x * 2 AS FLOAT)) FROM embeddings),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM base),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |cent AS (SELECT vec_id AS cell_id, v AS cv, vnorm AS cnorm FROM n
      |         WHERE vec_id % 31 = 0 AND vec_id < 496),
      |assigned AS (SELECT vec_id, cell_id FROM (
      |    SELECT n.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i])) / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c) WHERE crk = 1),
      |dropped AS (SELECT DISTINCT b.vec_id
      |  FROM assigned a JOIN assigned b
      |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      |  JOIN n na ON na.vec_id = a.vec_id JOIN n nb ON nb.vec_id = b.vec_id
      |  WHERE list_sum(list_transform(generate_series(1, 64), i -> na.v[i] * nb.v[i])) / (na.vnorm * nb.vnorm) >= 0.95)
      |SELECT a.cell_id AS cluster_id, CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
      |  CAST(sum(CASE WHEN d.vec_id IS NULL THEN a.vec_id END) AS BIGINT) AS kept_id_sum
      |FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** e6 — PRODUCT QUANTIZATION with ADC (Jégou et al. 2011): the
    * vector-COMPRESSION scale path next to e2's LSH and e4's IVF. The
    * 64-dim space splits into M=4 subspaces of 16 dims; each subspace gets
    * a deterministic 8-centroid codebook (the e4 every-31st-vector rule,
    * sliced per subspace), and every corpus vector is encoded as 4 small
    * codes — 4 bytes of index state per vector instead of 256 bytes of
    * floats, the representation that lets a 100 TB corpus's index fit in
    * cluster RAM. A probe precomputes its 4×8-entry lookup table of
    * subspace distances (ADC), and each candidate's approximate distance
    * is four table lookups summed in fixed order — no float vector is
    * touched after encoding.
    *
    * Scale shape: encoding is one scan against the broadcast 32-row
    * codebook (`graft_l2sq`, codegen'd, argmin via an (id, m)-partitioned
    * rank); the ADC pass joins the 4-column code table against a 256-row
    * broadcast LUT four times — per-probe cost is O(corpus) LUT lookups,
    * never O(corpus · dim) float math. Fully oracle-derived: DuckDB
    * rebuilds slices, codebooks, codes, LUT, and the fixed-order ADC sum
    * (left-to-right double adds match the engine's `(((d0+d1)+d2)+d3)`).
    * Rank ties break by vec_id in both engines. */
  def pqAdcTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val nSub = 4; val subDim = 16; val nCode = 8
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val sliced = emb
      .select(col("vec_id"), posexplode(array(
        (0 until nSub).map(m => slice(col("v"), m * subDim + 1, subDim)): _*)))
      .select(col("vec_id"), col("pos").as("m"), col("col").as("vs"))
    val codebook = sliced
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * nCode)
      .select(expr("vec_id div 31").cast("int").as("cell"), col("m"), col("vs").as("cs"))
    val dist = sliced.join(broadcast(codebook), "m")
      .withColumn("dist", expr("graft_l2sq(vs, cs)"))
    val wEnc = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist"), col("cell"))
    val codeCols = (0 until nSub).map(m =>
      max(when(col("m") === m, col("cell"))).as(s"c$m"))
    val codes = dist
      .withColumn("rn", row_number().over(wEnc)).filter(col("rn") === 1)
      .groupBy(col("vec_id"))
      .agg(codeCols.head, codeCols.tail: _*)
    val lut = dist.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("m"), col("cell"), col("dist"))
    def lutFor(m: Int): DataFrame = lut.filter(col("m") === m)
      .select(col("probe_id").as(s"p$m"), col("cell").as(s"cell$m"),
        col("dist").as(s"d$m"))
    val adc = codes
      .join(broadcast(lutFor(0)), col("c0") === col("cell0"))
      .join(broadcast(lutFor(1)),
        col("c1") === col("cell1") && col("p1") === col("p0"))
      .join(broadcast(lutFor(2)),
        col("c2") === col("cell2") && col("p2") === col("p0"))
      .join(broadcast(lutFor(3)),
        col("c3") === col("cell3") && col("p3") === col("p0"))
      .select(col("p0").as("probe_id"), col("vec_id"),
        (col("d0") + col("d1") + col("d2") + col("d3")).as("adc"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
    adc.filter(col("vec_id") =!= col("probe_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val pqAdcOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |sub AS (SELECT vec_id, t.m, v[t.m*16+1 : t.m*16+16] AS s
      |  FROM e CROSS JOIN generate_series(0, 3) t(m)),
      |cb AS (SELECT vec_id // 31 AS cell, m, s AS cs FROM sub
      |  WHERE vec_id % 31 = 0 AND vec_id < 248),
      |dist AS (SELECT sub.vec_id, sub.m, cb.cell,
      |    list_sum(list_transform(generate_series(1, 16),
      |      i -> (sub.s[i] - cb.cs[i]) * (sub.s[i] - cb.cs[i]))) AS dist
      |  FROM sub JOIN cb USING (m)),
      |codes AS (SELECT vec_id, m, cell AS code FROM (
      |    SELECT vec_id, m, cell,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cell) AS rn
      |    FROM dist) t WHERE rn = 1),
      |cw AS (SELECT vec_id,
      |    max(CASE WHEN m = 0 THEN code END) AS c0,
      |    max(CASE WHEN m = 1 THEN code END) AS c1,
      |    max(CASE WHEN m = 2 THEN code END) AS c2,
      |    max(CASE WHEN m = 3 THEN code END) AS c3
      |  FROM codes GROUP BY 1),
      |lut AS (SELECT vec_id AS probe_id, m, cell, dist FROM dist WHERE vec_id < 8),
      |a AS (SELECT cw.vec_id, l0.probe_id,
      |    ((l0.dist + l1.dist) + l2.dist) + l3.dist AS adc
      |  FROM cw
      |  JOIN lut l0 ON l0.m = 0 AND l0.cell = cw.c0
      |  JOIN lut l1 ON l1.m = 1 AND l1.cell = cw.c1 AND l1.probe_id = l0.probe_id
      |  JOIN lut l2 ON l2.m = 2 AND l2.cell = cw.c2 AND l2.probe_id = l0.probe_id
      |  JOIN lut l3 ON l3.m = 3 AND l3.cell = cw.c3 AND l3.probe_id = l0.probe_id)
      |SELECT probe_id, vec_id AS neighbor_id, rank FROM (
      |  SELECT probe_id, vec_id,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY adc, vec_id) AS rank
      |  FROM a WHERE vec_id <> probe_id) t
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e10 — SCALAR QUANTIZATION (SQ8) ANN: the third compression scheme in
    * the index family (e2 LSH signatures, e6 product quantization). Every
    * dimension is linearly quantized to an 8-bit code against per-dimension
    * corpus [min, max] — 64 bytes per vector instead of 256, with NO
    * codebook training (one stats pass), which is why FAISS ships SQ8 as
    * the default compromise between flat and PQ indexes. Search is
    * symmetric: the probe is quantized with the same grid and ranked by
    * exact INTEGER squared L2 over codes (≤ 64·255² < 2^23 — exact in any
    * engine, no float-sum order sensitivity), so the full
    * (probe, neighbor, rank, dist_sq) tuple hash-matches DuckDB.
    *
    * Scale shape: the "training" pass is a partial+final (dim → min/max)
    * aggregation folded to ONE 64-row stats array that broadcasts to the
    * encode scan — the corpus is never shuffled, never exploded; encoding
    * is a single projection (`transform` over the vector against the
    * broadcast grid). Search reuses e1's sanctioned conditioned
    * broadcast-probe pass over the 64-byte codes (4× less traffic than
    * float vectors), with the codegen'd `graft_l2sq` doing the distance
    * (integer-valued doubles — exact). At 100 TB the code table is the
    * resident index; the stats row is the SQ codebook analog of e4/e6's
    * broadcast codebooks. */
  def sq8TopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    // one partial+final stats pass, folded to a single 64-element grid row
    val grid = emb
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx"))))
        .as("st"))
      .cache() // 1 row; two join consumers (probes branch + corpus encode)
    // encode: pure projection against the broadcast grid — ((x−mn)·255)/(mx−mn)
    // evaluated in IEEE double with the same association as the oracle
    val codes = emb.join(broadcast(grid))
      .select(col("vec_id"), expr(
        """transform(v, (x, ix) ->
          |  CASE WHEN st[ix].mx = st[ix].mn THEN 0L
          |       ELSE least(255L, floor(((x - st[ix].mn) * 255.0D)
          |                              / (st[ix].mx - st[ix].mn))) END)"""
          .stripMargin).as("c"))
    val probes = codes.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("c").as("pc"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist_sq"), col("vec_id"))
    broadcast(probes)
      .join(codes, col("vec_id") =!= col("probe_id"))
      .withColumn("dist_sq", expr(
        "CAST(graft_l2sq(CAST(pc AS ARRAY<DOUBLE>), CAST(c AS ARRAY<DOUBLE>)) AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("dist_sq"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** DuckDB re-derives the grid, the codes, and the exact integer distance;
    * the only IEEE step (the quantization expression) is written with the
    * identical association in both engines, and everything downstream is
    * integer arithmetic. Parameterized on k so e11 can reuse the identical
    * derivation for its coarse stage. */
  private def sq8OracleAt(k: Int): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |st AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
      |  FROM e CROSS JOIN generate_series(1, 64) t(i) GROUP BY i),
      |codes AS (SELECT vec_id, list(code ORDER BY i) AS c FROM (
      |    SELECT e.vec_id, st.i,
      |      CASE WHEN st.mx = st.mn THEN 0
      |           ELSE least(255, CAST(floor(((e.v[st.i] - st.mn) * 255.0)
      |                                      / (st.mx - st.mn)) AS BIGINT)) END AS code
      |    FROM e CROSS JOIN st) q
      |  GROUP BY vec_id),
      |pairs AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(generate_series(1, 64),
      |      i -> (a.c[i] - b.c[i]) * (a.c[i] - b.c[i]))) AS BIGINT) AS dist_sq
      |  FROM codes a JOIN codes b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id < 8)
      |SELECT probe_id, neighbor_id, rank, dist_sq FROM (
      |  SELECT probe_id, neighbor_id, dist_sq,
      |    row_number() OVER (PARTITION BY probe_id
      |      ORDER BY dist_sq, neighbor_id) AS rank
      |  FROM pairs) t
      |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin

  val sq8Oracle: String = sq8OracleAt(5)

  /** e11 — TWO-STAGE RETRIEVAL (coarse-quantized scan + exact re-rank):
    * the production serving shape FAISS ships as `IndexRefine` and every
    * vector database implements — a compressed index (e10's SQ8 codes,
    * 64 bytes/vector) screens the corpus down to `coarseK` candidates per
    * probe by exact INTEGER code distance, then ONLY those candidates'
    * full float vectors are fetched for an exact-cosine re-rank to top-k.
    * Recall beats e10 alone (quantization error cannot reorder the final
    * ranking, only the candidate cut) at a fraction of e1's cost.
    *
    * Scale shape: stage 1 is e10's resident-index scan — the corpus
    * never shuffles, candidates leave as (probe, id, coarse_rank)
    * triples, |probes|·coarseK rows total. Stage 2 broadcasts that tiny
    * candidate set against the float table twice (probe-side, then
    * neighbor-side id equi-joins — Bloom/DPP-prunable at 100 TB, where
    * "fetch the candidate vectors" is the point lookup the refine tier is
    * built around), so full vectors are read only for candidate ids. The
    * windowed top-k partitions by probe. */
  def twoStageRerank(s: SparkSession, d: String, k: Int = 5,
      coarseK: Int = 32): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val cand = sq8TopK(s, d, coarseK)
      .select(col("probe_id"), col("neighbor_id"), col("rank").as("coarse_rank"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // the candidate side is the build side of BOTH id joins (the hint does
    // not propagate through a join, so re-hint the stage-1 result — without
    // it the planner is free to broadcast the CORPUS side at small stats)
    broadcast(broadcast(cand)
        .join(emb.select(col("vec_id").as("probe_id"), col("v").as("pv")),
          "probe_id"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .withColumn("cosine", cosine("pv", "nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("coarse_rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** e11 oracle — the e10 coarse derivation verbatim (nested WITH, the e5
    * composition trick) at coarseK = 32, then e1's exact-cosine evaluation
    * order for the re-rank; rank-only plus the coarse rank, so the only
    * float (the cosine) never reaches the hash. */
  val twoStageRerankOracle: String =
    s"""WITH coarse AS (${sq8OracleAt(32)}),
      |e2s AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |n2s AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm
      |  FROM e2s)
      |SELECT probe_id, neighbor_id, rank, coarse_rank FROM (
      |  SELECT c.probe_id, c.neighbor_id, c.rank AS coarse_rank,
      |    row_number() OVER (PARTITION BY c.probe_id ORDER BY
      |      list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
      |        / (a.vnorm * b.vnorm) DESC,
      |      c.neighbor_id) AS rank
      |  FROM coarse c JOIN n2s a ON a.vec_id = c.probe_id
      |       JOIN n2s b ON b.vec_id = c.neighbor_id) t
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** d8 — SEMANTIC decontamination: flag every corpus vector whose best
    * cosine against the benchmark embedding set reaches τ = 0.9 — the
    * embedding-space member of the decontamination family (d3 exact
    * 5-grams, d4 bloom, d6 overlap fraction), catching paraphrased or
    * reformatted benchmark leakage that no n-gram test can see.
    *
    * Scale shape: the benchmark set is SMALL by definition → broadcast;
    * the corpus streams through ONE codegen'd cosine pass (the
    * sanctioned conditioned nested-loop shape e1 uses), and the verdict
    * aggregation is partial+final on vec_id, so per-vector state never
    * leaves its map task until reduced to (max, count). Every corpus
    * vector reports (n_hits, max_cos, verdict) — the audit artifact, not
    * just the flagged subset. */
  def semanticDecontaminate(s: SparkSession, d: String, tau: Double = 0.9,
      nBench: Int = 32): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val bench = emb.filter(col("vec_id") < nBench)
      .select(col("vec_id").as("bench_id"), col("v").as("bv"))
    broadcast(bench)
      .join(emb.filter(col("vec_id") >= nBench), col("vec_id") =!= col("bench_id"))
      .withColumn("cos", cosine("bv", "v"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("n_hits"),
        max(col("cos")).as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= tau)
      .orderBy(col("vec_id"))
  }

  /** d8 oracle — brute force over all (benchmark, corpus) pairs with the
    * same dot/(√·√) evaluation order as `graft_cosine`; max over doubles
    * is order-independent, so the verdict hashes exactly. */
  val semanticDecontaminateOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id < 32),
      |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 32),
      |p AS (SELECT c.vec_id,
      |    list_sum(list_transform(generate_series(1, 64), i -> c.v[i] * b.bv[i])) /
      |      (sqrt(list_sum(list_transform(c.v, x -> x * x))) *
      |       sqrt(list_sum(list_transform(b.bv, x -> x * x)))) AS cos
      |  FROM c, b)
      |SELECT vec_id,
      |  CAST(sum(CASE WHEN cos >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |  max(cos) AS max_cos, max(cos) >= 0.9 AS contaminated
      |FROM p GROUP BY 1 ORDER BY vec_id""".stripMargin

  /** e15 — IVF-PQ with ADC (Jégou et al. 2011 §IV, the FAISS `IndexIVFPQ`
    * shape): the index layout actual 100 TB deployments run, combining the
    * family's two orthogonal compressions — e4's coarse inverted file
    * (search only `nProbe` cells per probe) and e6's product quantization,
    * applied to the RESIDUAL v − centroid rather than the raw vector
    * (residuals concentrate near 0 across all cells, so one shared
    * 8-codeword sub-codebook covers every cell — the standard IVFADC
    * trick). Each vector's index state is (cell_id, 4 codes) ≈ 5 bytes;
    * a probe precomputes one 4×8 distance LUT PER PROBED CELL (the
    * residual ADC table depends on the probe-to-centroid offset), and a
    * candidate's approximate distance is four lookups summed in fixed
    * order.
    *
    * Determinism discipline: coarse codebook/assignment are e4's verbatim
    * (every-31st rule, cosine argmax, window-rank tie-break by cell);
    * residual sub-codebooks take the residuals of every-29th vector
    * (coprime to 31, so the two samples interleave); encode argmin orders
    * by (dist, code); the ADC sum is the left-to-right double chain
    * `((d0+d1)+d2)+d3` in both engines; rank ties break by vec_id.
    * Rank-only output — no float reaches the hash.
    *
    * Scale shape: assignment is the one full scan (broadcast 16-row coarse
    * codebook); residual encode is a second narrow pass against the
    * broadcast 32-row sub-codebook (per-vector argmin via partial+final
    * struct-min aggregation — candidates fold map-side before any
    * exchange); the search joins the 5-byte code table
    * against a broadcast ≤1024-row LUT whose cell equi-join IS the IVF
    * pruning — non-probed cells drop at the join, so per-probe work is
    * occupancy × nProbe LUT lookups and the corpus float table is never
    * touched after encoding. */
  def ivfPqTopK(s: SparkSession, d: String, k: Int = 5, nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val nSub = 4; val subDim = 16; val nCode = 8
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val centroids = emb
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    // coarse assignment (e4 verbatim) + residual v − centroid
    val assignScore = Window.partitionBy(col("vec_id")).orderBy(col("cscore").desc, col("cell_id"))
    val assigned = emb.join(broadcast(centroids))
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crk", row_number().over(assignScore))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("cell_id"),
        expr("zip_with(v, cv, (x, y) -> x - y)").as("r"))
    val sliced = assigned
      .select(col("vec_id"), col("cell_id"), posexplode(array(
        (0 until nSub).map(m => slice(col("r"), m * subDim + 1, subDim)): _*)))
      .select(col("vec_id"), col("cell_id"), col("pos").as("m"), col("col").as("rs"))
    // shared residual sub-codebooks: residuals of every-29th vector
    val codebook = sliced
      .filter(col("vec_id") % 29 === 0 && col("vec_id") < 29L * nCode)
      .select(expr("vec_id div 29").cast("int").as("code"), col("m"), col("rs").as("cs"))
    // encode argmin as a PARTIAL+FINAL struct-min aggregation, not a
    // window: min(struct(dist, code)) is exactly the (dist, code) total
    // order, and the map-side combine folds the 32 candidate rows per
    // vector before any exchange — an (id, m) sort-window here shuffles
    // 32n wide rows and went 12.5×/decade at sf10 (measured; this shape
    // is ~linear)
    val codeCols = (0 until nSub).map(m =>
      min(when(col("m") === m, struct(col("dist"), col("code"))))
        .getField("code").as(s"c$m"))
    val codes = sliced.join(broadcast(codebook), "m")
      .withColumn("dist", expr("graft_l2sq(rs, cs)"))
      .groupBy(col("vec_id"), col("cell_id"))
      .agg(codeCols.head, codeCols.tail: _*)
    // probes: nProbe nearest cells, each with its probe-residual
    val probeScore = Window.partitionBy(col("probe_id")).orderBy(col("cscore").desc, col("cell_id"))
    val probeCells = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .join(broadcast(centroids))
      .withColumn("cscore", cosine("pv", "cv"))
      .withColumn("crk", row_number().over(probeScore))
      .filter(col("crk") <= nProbe)
      .select(col("probe_id"), col("cell_id"),
        expr("zip_with(pv, cv, (x, y) -> x - y)").as("pr"))
    // per-(probe, cell) residual ADC LUT: 8 probes × nProbe cells × 4×8
    val lut = probeCells
      .select(col("probe_id"), col("cell_id"), posexplode(array(
        (0 until nSub).map(m => slice(col("pr"), m * subDim + 1, subDim)): _*)))
      .select(col("probe_id"), col("cell_id"), col("pos").as("m"), col("col").as("ps"))
      .join(broadcast(codebook), "m")
      .withColumn("d", expr("graft_l2sq(ps, cs)"))
      .select(col("probe_id"), col("cell_id"), col("m"), col("code"), col("d"))
    def lutFor(m: Int): DataFrame = lut.filter(col("m") === m)
      .select(col("probe_id").as(s"p$m"), col("cell_id").as(s"cl$m"),
        col("code").as(s"code$m"), col("d").as(s"d$m"))
    // the cell equi-join on the m=0 leg IS the IVF pruning: codes in
    // non-probed cells match no LUT row and drop inside the join
    val adc = codes
      .join(broadcast(lutFor(0)),
        col("c0") === col("code0") && col("cell_id") === col("cl0"))
      .join(broadcast(lutFor(1)), col("c1") === col("code1") &&
        col("cell_id") === col("cl1") && col("p1") === col("p0"))
      .join(broadcast(lutFor(2)), col("c2") === col("code2") &&
        col("cell_id") === col("cl2") && col("p2") === col("p0"))
      .join(broadcast(lutFor(3)), col("c3") === col("code3") &&
        col("cell_id") === col("cl3") && col("p3") === col("p0"))
      .select(col("p0").as("probe_id"), col("vec_id"),
        (((col("d0") + col("d1")) + col("d2")) + col("d3")).as("adc"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
    adc.filter(col("vec_id") =!= col("probe_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** e15 oracle — DuckDB rebuilds the whole index: e4's coarse
    * codebook/assignment (the c2/s17-validated replay), the residuals, the
    * every-29th residual sub-codebooks, the (dist, code) argmin encode, the
    * per-(probe, cell) residual LUT, and the fixed-order ADC chain; the
    * cell+code equi-joins replay the IVF pruning identically. */
  val ivfPqOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm
      |  FROM e),
      |cent AS (SELECT vec_id AS cell_id, v AS cv, vnorm AS cnorm FROM n
      |         WHERE vec_id % 31 = 0 AND vec_id < 496),
      |assigned AS (SELECT vec_id, cell_id,
      |    list_transform(generate_series(1, 64), i -> v[i] - cv[i]) AS r
      |  FROM (
      |    SELECT n.vec_id, c.cell_id, n.v, c.cv,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i]))
      |          / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c) t WHERE crk = 1),
      |sub AS (SELECT vec_id, cell_id, t.m, r[t.m*16+1 : t.m*16+16] AS rs
      |  FROM assigned CROSS JOIN generate_series(0, 3) t(m)),
      |cb AS (SELECT vec_id // 29 AS code, m, rs AS cs FROM sub
      |  WHERE vec_id % 29 = 0 AND vec_id < 232),
      |dist AS (SELECT sub.vec_id, sub.cell_id, sub.m, cb.code,
      |    list_sum(list_transform(generate_series(1, 16),
      |      i -> (sub.rs[i] - cb.cs[i]) * (sub.rs[i] - cb.cs[i]))) AS dist
      |  FROM sub JOIN cb USING (m)),
      |cw AS (SELECT vec_id, cell_id,
      |    max(CASE WHEN m = 0 THEN code END) AS c0,
      |    max(CASE WHEN m = 1 THEN code END) AS c1,
      |    max(CASE WHEN m = 2 THEN code END) AS c2,
      |    max(CASE WHEN m = 3 THEN code END) AS c3
      |  FROM (SELECT vec_id, cell_id, m, code FROM (
      |      SELECT vec_id, cell_id, m, code,
      |        row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
      |      FROM dist) z WHERE rn = 1) codes
      |  GROUP BY 1, 2),
      |pcell AS (SELECT probe_id, cell_id,
      |    list_transform(generate_series(1, 64), i -> pv[i] - cv[i]) AS pr
      |  FROM (
      |    SELECT n.vec_id AS probe_id, c.cell_id, n.v AS pv, c.cv,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64), i -> n.v[i] * c.cv[i]))
      |          / (n.vnorm * c.cnorm) DESC,
      |        c.cell_id) AS crk
      |    FROM n, cent c WHERE n.vec_id < 8) t WHERE crk <= 4),
      |lut AS (SELECT probe_id, cell_id, psub.m, cb.code,
      |    list_sum(list_transform(generate_series(1, 16),
      |      i -> (psub.ps[i] - cb.cs[i]) * (psub.ps[i] - cb.cs[i]))) AS d
      |  FROM (SELECT probe_id, cell_id, t.m, pr[t.m*16+1 : t.m*16+16] AS ps
      |        FROM pcell CROSS JOIN generate_series(0, 3) t(m)) psub
      |  JOIN cb USING (m)),
      |a AS (SELECT cw.vec_id, l0.probe_id,
      |    ((l0.d + l1.d) + l2.d) + l3.d AS adc
      |  FROM cw
      |  JOIN lut l0 ON l0.m = 0 AND l0.code = cw.c0 AND l0.cell_id = cw.cell_id
      |  JOIN lut l1 ON l1.m = 1 AND l1.code = cw.c1 AND l1.cell_id = cw.cell_id
      |       AND l1.probe_id = l0.probe_id
      |  JOIN lut l2 ON l2.m = 2 AND l2.code = cw.c2 AND l2.cell_id = cw.cell_id
      |       AND l2.probe_id = l0.probe_id
      |  JOIN lut l3 ON l3.m = 3 AND l3.code = cw.c3 AND l3.cell_id = cw.cell_id
      |       AND l3.probe_id = l0.probe_id)
      |SELECT probe_id, vec_id AS neighbor_id, rank FROM (
      |  SELECT probe_id, vec_id,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY adc, vec_id) AS rank
      |  FROM a WHERE vec_id <> probe_id) t
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e16 — IVF-PQ RECALL AUDIT, closing the recall-gate pattern over the
    * index family (e5 gates LSH/IVF, e12 gates SQ8/refine): recall@5
    * against e1's brute-force cosine truth for flat PQ (e6) vs IVF-PQ
    * (e15) — the measurement that shows what the coarse pruning costs on
    * top of the quantization error (a candidate outside the probed cells
    * can never be returned, however good its code distance). e5's
    * composition shape: top-k sets are 8×5 rows, every join
    * broadcast-sized no matter the corpus. */
  def ivfPqRecall(s: SparkSession, d: String): DataFrame = {
    val brute = bruteCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"))
    val pq = pqAdcTopK(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("phit"))
    val ivfpq = ivfPqTopK(s, d).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("vhit"))
    brute
      .join(pq, Seq("probe_id", "neighbor_id"), "left")
      .join(ivfpq, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("phit")).as("pq_hits"), count(col("vhit")).as("ivfpq_hits"))
      .orderBy(col("probe_id"))
  }

  /** e16 oracle — the e1/e6/e15 oracles verbatim as CTEs (e5's nested-WITH
    * trick), so the audit inherits their independent re-derivations. */
  def ivfPqRecallOracle: String =
    s"""WITH brute AS ($bruteCosineOracle),
      |pq AS ($pqAdcOracle),
      |ivfpq AS ($ivfPqOracle)
      |SELECT b.probe_id,
      |  count(p.probe_id) AS pq_hits,
      |  count(v.probe_id) AS ivfpq_hits
      |FROM brute b
      |LEFT JOIN pq p ON p.probe_id = b.probe_id AND p.neighbor_id = b.neighbor_id
      |LEFT JOIN ivfpq v ON v.probe_id = b.probe_id AND v.neighbor_id = b.neighbor_id
      |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin

  /** 1-bit-per-dimension binary codes for e18/e19: bit i is set iff
    * x_i STRICTLY exceeds the dimension's corpus MIDRANGE (mn+mx)/2 —
    * derived from the same order-insensitive min/max stats pass as e10's
    * SQ8 grid (a float MEAN would be accumulation-order-sensitive and
    * could never hash cross-engine; the midrange is two exact extrema and
    * one IEEE add+halve written with the identical association in both
    * engines). The 64 bits pack into TWO 32-bit BIGINT words so no sign
    * bit is ever touched (the m6/m9 62-bit discipline).
    *
    * Scale shape (e10's): one partial+final (dim → min/max) pass folds to
    * a single 64-row grid that broadcasts to the encode scan; encoding is
    * a pure projection — the corpus never shuffles and the resident index
    * is 16 bytes/vector (16× smaller than float, 4× smaller than SQ8). */
  private def binaryCodes(s: SparkSession, d: String): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val grid = emb
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx"))))
        .as("st"))
      .cache() // 1 row; consumed by both the probe branch and the corpus encode
    emb.join(broadcast(grid))
      .select(col("vec_id"),
        expr("""aggregate(transform(v, (x, ix) ->
              |  CASE WHEN ix < 32 AND x > (st[ix].mn + st[ix].mx) / 2.0D
              |       THEN shiftleft(1L, ix) ELSE 0L END),
              |  0L, (acc, y) -> acc + y)""".stripMargin).as("w0"),
        expr("""aggregate(transform(v, (x, ix) ->
              |  CASE WHEN ix >= 32 AND x > (st[ix].mn + st[ix].mx) / 2.0D
              |       THEN shiftleft(1L, ix - 32) ELSE 0L END),
              |  0L, (acc, y) -> acc + y)""".stripMargin).as("w1"))
  }

  /** Hamming coarse stage shared by e18 (as its candidate cut) and e19
    * (as the raw-BQ recall leg): exact integer popcount distance over the
    * packed words, top-k per probe by (hamming, vec_id). */
  private def bqHammingTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val codes = binaryCodes(s, d)
    val probes = codes.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("w0").as("p0"),
        col("w1").as("p1"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("hamming"), col("vec_id"))
    broadcast(probes)
      .join(codes, col("vec_id") =!= col("probe_id"))
      .withColumn("hamming",
        (bit_count(col("p0").bitwiseXOR(col("w0"))) +
          bit_count(col("p1").bitwiseXOR(col("w1")))).cast("long"))
      .withColumn("coarse_rank", row_number().over(w).cast("long"))
      .filter(col("coarse_rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("coarse_rank"), col("hamming"))
  }

  /** e18 — BINARY QUANTIZATION ANN (BQ + exact re-rank): the 1-bit member
    * completing the compression family (e2 LSH projections, e6 PQ, e10
    * SQ8, e15 IVF-PQ) — the shape modern vector stores ship as their
    * memory-tier default, because 16 bytes/vector lets the WHOLE index
    * stay RAM-resident at corpus sizes where even SQ8 spills. Unlike e2's
    * random hyperplanes, the bits are axis-aligned threshold tests
    * against the corpus midrange (RaBitQ-family scalar binarization), so
    * "training" is the same one stats pass as e10. Search is e11's
    * IndexRefine shape: a Hamming-distance scan over the packed codes
    * (exact integer popcount — no float ever enters the coarse stage)
    * cuts the corpus to `coarseK` candidates, then ONLY those ids fetch
    * float vectors for the exact-cosine re-rank to top-k.
    *
    * Scale shape: coarse = broadcast-probe popcount pass over the 16-byte
    * resident codes (the cheapest full-scan in the family); re-rank =
    * candidate ids broadcast against the float table (point lookups,
    * Bloom/DPP-prunable). The windowed top-k partitions by probe. */
  def binaryQuantTopK(s: SparkSession, d: String, k: Int = 5,
      coarseK: Int = 32): DataFrame = {
    val emb = withVec(embeddings(s, d), "embedding").select(col("vec_id"), col("v"))
    val cand = bqHammingTopK(s, d, coarseK)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // candidate side is the build side of BOTH id joins (e11's re-hint rule:
    // the hint does not propagate through a join)
    broadcast(broadcast(cand)
        .join(emb.select(col("vec_id").as("probe_id"), col("v").as("pv")),
          "probe_id"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .withColumn("cosine", cosine("pv", "nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"),
        col("coarse_rank"), col("hamming"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Hamming-stage oracle at `k`, parameterized so e18 embeds it as the
    * candidate cut and e19 as the raw-BQ leg (the sq8OracleAt pattern).
    * DuckDB re-derives the grid, the midrange tests, the packed words,
    * and the integer popcount distance bit-for-bit. */
  private def bqHammingOracleAt(k: Int): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |st AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
      |  FROM e CROSS JOIN generate_series(1, 64) t(i) GROUP BY i),
      |codes AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN st.i <= 32 AND e.v[st.i] > (st.mn + st.mx) / 2
      |                  THEN (CAST(1 AS BIGINT) << (st.i - 1)) ELSE 0 END)
      |      AS BIGINT) AS w0,
      |    CAST(sum(CASE WHEN st.i > 32 AND e.v[st.i] > (st.mn + st.mx) / 2
      |                  THEN (CAST(1 AS BIGINT) << (st.i - 33)) ELSE 0 END)
      |      AS BIGINT) AS w1
      |  FROM e CROSS JOIN st GROUP BY vec_id),
      |hpairs AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
      |    CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
      |      AS BIGINT) AS hamming
      |  FROM codes a JOIN codes b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id < 8)
      |SELECT probe_id, neighbor_id, coarse_rank, hamming FROM (
      |  SELECT probe_id, neighbor_id, hamming,
      |    row_number() OVER (PARTITION BY probe_id
      |      ORDER BY hamming, neighbor_id) AS coarse_rank
      |  FROM hpairs) t
      |WHERE coarse_rank <= $k""".stripMargin

  /** e18 oracle — the Hamming derivation at coarseK = 32, then e1's
    * exact-cosine evaluation order for the re-rank; the cosine never
    * reaches the hash (rank-only, e11's rule), while the coarse rank and
    * the integer Hamming distance DO hash. */
  val binaryQuantOracle: String =
    s"""WITH coarse AS (${bqHammingOracleAt(32)}),
      |e2b AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |n2b AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm
      |  FROM e2b)
      |SELECT probe_id, neighbor_id, rank, coarse_rank, hamming FROM (
      |  SELECT c.probe_id, c.neighbor_id, c.coarse_rank, c.hamming,
      |    row_number() OVER (PARTITION BY c.probe_id ORDER BY
      |      list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
      |        / (a.vnorm * b.vnorm) DESC,
      |      c.neighbor_id) AS rank
      |  FROM coarse c JOIN n2b a ON a.vec_id = c.probe_id
      |       JOIN n2b b ON b.vec_id = c.neighbor_id) t
      |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** e19 — BINARY-QUANTIZATION RECALL AUDIT, extending the recall-gate
    * pattern to the family's last member (e5 gates LSH/IVF, e12 SQ8/
    * refine, e16 PQ/IVF-PQ): recall@5 against e1's brute truth for raw
    * Hamming@5 vs BQ+re-rank@5 — the measurement that justifies the
    * refine tier, since 1-bit codes alone lose rank resolution that the
    * exact re-rank of a 32-candidate cut recovers. e5's composition
    * shape: both legs are 8×k rows, every join broadcast-sized. */
  def bqRecall(s: SparkSession, d: String): DataFrame = {
    val brute = bruteCosineTopK(s, d).select(col("probe_id"), col("neighbor_id"))
    val raw = bqHammingTopK(s, d, 5).select(col("probe_id"), col("neighbor_id"),
      lit(1).as("bhit"))
    val reranked = binaryQuantTopK(s, d).select(col("probe_id"),
      col("neighbor_id"), lit(1).as("rhit"))
    brute
      .join(raw, Seq("probe_id", "neighbor_id"), "left")
      .join(reranked, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("bhit")).as("bq_hits"), count(col("rhit")).as("reranked_hits"))
      .orderBy(col("probe_id"))
  }

  /** e19 oracle — the e1/e18 oracles verbatim as CTEs (e5's nested-WITH
    * trick), so the audit inherits their independent re-derivations. */
  def bqRecallOracle: String =
    s"""WITH brute AS ($bruteCosineOracle),
      |bqraw AS (${bqHammingOracleAt(5)}),
      |bqref AS ($binaryQuantOracle)
      |SELECT b.probe_id,
      |  count(q.probe_id) AS bq_hits,
      |  count(r.probe_id) AS reranked_hits
      |FROM brute b
      |LEFT JOIN bqraw q ON q.probe_id = b.probe_id AND q.neighbor_id = b.neighbor_id
      |LEFT JOIN bqref r ON r.probe_id = b.probe_id AND r.neighbor_id = b.neighbor_id
      |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin

  /** e22 — EXACT RANGE (radius) SEARCH with provable IVF cell pruning:
    * "every vector within cosine ≥ τ of the probe" — the retrieval
    * primitive top-k cannot express (dedup sweeps, policy screens, and
    * recall-complete retrieval want ALL matches above a similarity bar,
    * not the best k). The suite's ANN family is top-k throughout; this
    * closes the range primitive — and unlike the LSH/PQ entries it is
    * EXACT by construction, with the oracle being the naive brute-force
    * scan the pruning must equal row-for-row.
    *
    * The pruning law (unit-sphere triangle inequality, derived purely
    * from cosines — normalized vectors are never materialized): on the
    * unit sphere d(a,b) = √(2−2·cos(a,b)), so a member x of cell c with
    * cos(x,c) ≥ cmin_c has d(x̂,ĉ) ≤ rad_c = √(2−2·cmin_c), and any hit
    * cos(p,x) ≥ τ needs d(p̂,ĉ) ≤ √(2−2τ) + rad_c. Cells failing that
    * (with 1e-9 admission slack, which only ever ADMITS more cells, so
    * exactness is one-sided-safe) are never scanned. The final
    * membership test is the e1-form raw cosine — the identical double
    * chain as the oracle, the family's established bit-compatibility.
    *
    * Scale shape: assignment is the e4 broadcast-codebook pass (n ·
    * nCells codegen'd cosines, one argmax — reusing the cscore it
    * already computes for the radius fold, so the radii are FREE); the
    * per-cell radius is a |cells|-row partial+final min; probe-side
    * admission is |probes| × |cells| against a broadcast; only admitted
    * cells' posting lists are scanned. Output is a per-probe integer
    * CHECKSUM of the hit set (count / sum / xor / min / max — exact
    * BIGINTs; sum stays under 2⁶³ through 10⁹-vector corpora), so the
    * artifact stays 8 rows while pinning the exact membership of an
    * arbitrarily large range. */
  def rangeSearch(s: SparkSession, d: String, nCells0: Int = -1): DataFrame = {
    // τ calibrated to the synthetic corpus (near-random 64-dim vectors:
    // max probe cosine ≈ 0.39-0.49 across SFs, so 0.8 would be vacuous);
    // 0.3 yields 29/33/111 hits at sf0.001/0.01/0.1 and the nearest
    // cosine sits 4.5e-4 from the boundary — 11 orders beyond any
    // engine-rounding divergence, so the threshold compare is hash-safe
    val tau = 0.3
    // cell-count resolve order (VERDICT r13 #4 — the quadratic-law
    // convention from knnGraph/semanticDedup): explicit arg → session
    // conf → K = cellsFor(n) ≈ √n. The range scan is
    // O(admitted_cells · n/nCells): a pinned constant stops the pruning
    // paying as n grows, so only the ORACLE-GATED entry pins 16 (the e4
    // convention — exactness holds at ANY cell count, so the pin is
    // purely for a stable gated plan); the unconfigured default derives
    // from the corpus. Centroids are the vec_id % 31 == 0 stride, so
    // tiny corpora (n < 31·K) simply get fewer, still-exact cells.
    val nCells =
      if (nCells0 > 0) nCells0
      else s.conf.getOption("spark.graft.range.cells") match {
        case Some(v) => v.toInt
        case None => cellsFor(embeddings(s, d).count())
      }
    val emb = withVec(embeddings(s, d), "embedding")
      .select(col("vec_id"), col("v"))
    val centroids = emb
      .filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))
    val assignScore = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cell_id"))
    val assigned = emb.join(broadcast(centroids))
      .withColumn("cscore", cosine("v", "cv"))
      .withColumn("crk", row_number().over(assignScore))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("cell_id"), col("cscore"))
    // every join below is a SELF-join on lineage shared through
    // `centroids`/`assigned` — the key columns are explicitly re-aliased
    // (fresh exprIds) on one side, because the analyzer's automatic
    // self-join deduplication resolved them inconsistently across
    // sessions here (one boot paired radii with the WRONG centroids —
    // under-admission that silently dropped true hits, caught by the
    // brute-force oracle)
    val cells = assigned.groupBy(col("cell_id"))
      .agg(min(col("cscore")).as("cmin"))
      .select(col("cell_id").as("rad_cell_id"), col("cmin"))
    val cellMeta = centroids
      .join(cells, col("cell_id") === col("rad_cell_id"))
      .select(col("cell_id"), col("cv"), col("cmin"))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    // the 2−2·cos arguments are CLAMPED at zero: a vector's cosine with
    // itself computes to 1+ulp in doubles (centroids are corpus members,
    // so self-pairs occur), and an unclamped sqrt(negative) is NaN in
    // Spark — the comparison silently fails and the singleton cell is
    // never admitted, dropping its true hits (caught by the brute oracle
    // at sf0.01: 30 vs 33)
    def d2(c: Column): Column =
      sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) * c))
    val admissible = probes
      .join(broadcast(cellMeta))
      .withColumn("pc", cosine("pv", "cv"))
      .filter(d2(col("pc")) <=
        sqrt(lit(2.0) - lit(2.0) * lit(tau)) + d2(col("cmin")) + lit(1e-9))
      .select(col("probe_id").as("a_probe_id"), col("pv"),
        col("cell_id").as("a_cell_id"))
    val hits = broadcast(admissible)
      .join(assigned, col("a_cell_id") === col("cell_id"))
      .filter(col("vec_id") =!= col("a_probe_id"))
      .filter(cosine("pv", "v") >= tau)
      .select(col("a_probe_id"), col("vec_id").as("nid"))
    val sums = hits.groupBy(col("a_probe_id")).agg(
      count(lit(1)).as("n_in_range"), sum(col("nid")).as("sum_ids"),
      expr("bit_xor(nid)").as("xor_ids"), min(col("nid")).as("min_id"),
      max(col("nid")).as("max_id"))
    probes.select(col("probe_id"))
      .join(sums, col("probe_id") === col("a_probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_in_range"), lit(0L)).as("n_in_range"),
        coalesce(col("sum_ids"), lit(0L)).as("sum_ids"),
        coalesce(col("xor_ids"), lit(0L)).as("xor_ids"),
        coalesce(col("min_id"), lit(-1L)).as("min_id"),
        coalesce(col("max_id"), lit(-1L)).as("max_id"))
      .orderBy(col("probe_id"))
  }

  /** e22 oracle — the NAIVE brute-force range scan (no cells, no
    * pruning): the independent derivation the pruned plan must equal. */
  val rangeSearchOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) vnorm FROM e),
      |p AS (SELECT vec_id, v, vnorm FROM n WHERE vec_id < 8),
      |hit AS (SELECT p.vec_id AS probe_id, b.vec_id AS nid
      |  FROM p JOIN n b ON b.vec_id != p.vec_id
      |  WHERE list_sum(list_transform(generate_series(1, 64), i -> p.v[i] * b.v[i]))
      |        / (p.vnorm * b.vnorm) >= 0.3)
      |SELECT pp.vec_id AS probe_id,
      |  CAST(count(h.nid) AS BIGINT) AS n_in_range,
      |  CAST(coalesce(sum(h.nid), 0) AS BIGINT) AS sum_ids,
      |  CAST(coalesce(bit_xor(h.nid), 0) AS BIGINT) AS xor_ids,
      |  CAST(coalesce(min(h.nid), -1) AS BIGINT) AS min_id,
      |  CAST(coalesce(max(h.nid), -1) AS BIGINT) AS max_id
      |FROM p pp LEFT JOIN hit h ON h.probe_id = pp.vec_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e22_range_search" -> ((s: SparkSession, d: String) => rangeSearch(s, d, nCells0 = 16)),
    "d8_semantic_decontaminate" -> ((s: SparkSession, d: String) => semanticDecontaminate(s, d)),
    "e6_pq_adc" -> ((s: SparkSession, d: String) => pqAdcTopK(s, d)),
    "c1_kmeans" -> ((s: SparkSession, d: String) => kmeansClusters(s, d)),
    // oracle-gated entries pin their cell/band parameters EXPLICITLY so a
    // session conf or the self-scaling count can never diverge the gated
    // path from its oracle (ADVICE r7); the self-scaling defaults are the
    // production entry points and are spec-gated in SimilaritySpec.
    "c2_semantic_dedup" -> ((s: SparkSession, d: String) => semanticDedup(s, d, nCells0 = 16)),
    "e1_ann_brute_topk" -> ((s: SparkSession, d: String) => bruteCosineTopK(s, d)),
    "e2_ann_lsh_topk" -> ((s: SparkSession, d: String) => lshCosineTopK(s, d)),
    "e3_embedding_neardup" -> ((s: SparkSession, d: String) => embeddingNearDup(s, d, bits0 = 16)),
    "e4_ann_ivf_topk" -> ((s: SparkSession, d: String) => ivfCosineTopK(s, d)),
    "e20_incremental_ann" ->
      ((s: SparkSession, d: String) => incrementalIvfTopK(s, d)),
    "e21_codebook_drift" ->
      ((s: SparkSession, d: String) => codebookDriftRecall(s, d)),
    "e5_ann_recall" -> (annRecall _),
    // e9 is gated SELF-SCALING: side derives from count(*) via an exact
    // integer rule the oracle replays, so the gate covers the production
    // curve at every SF (r8 — the r7 pinned-constant entries measured
    // 790/885 s at sf10 while the self-scaled paths run ~1 min).
    // e7 (single-level contrast) was DEMOTED from the registered surface in
    // r10 (VERDICT r9 #3a): its n^1.5 compute terms are the documented
    // algorithmic contrast to e9, not a shape to ship — it stays
    // correctness-gated by KnnGraphContrastSpec (in-JVM brute-force
    // re-derivation) + PlanSpec, with the isolated protocol in SCALE.md.
    "e8_mmr_rerank" -> ((s: SparkSession, d: String) => mmrRerank(s, d)),
    "e9_knn_graph_2level" -> ((s: SparkSession, d: String) => stagedTwoLevelGraph(s, d)),
    "e17_graph_ann" -> ((s: SparkSession, d: String) => graphAnnTopK(s, d)),
    "e10_sq8_ann" -> ((s: SparkSession, d: String) => sq8TopK(s, d)),
    "e11_two_stage_rerank" -> ((s: SparkSession, d: String) => twoStageRerank(s, d)),
    "e12_refine_recall" -> (refineRecall _),
    "e13_filtered_ann" -> ((s: SparkSession, d: String) => filteredAnn(s, d)),
    "e14_hybrid_rrf" -> ((s: SparkSession, d: String) => hybridRrf(s, d)),
    "e15_ivfpq_topk" -> ((s: SparkSession, d: String) => ivfPqTopK(s, d)),
    "e16_ivfpq_recall" -> (ivfPqRecall _),
    "e18_binary_ann" -> ((s: SparkSession, d: String) => binaryQuantTopK(s, d)),
    "e19_bq_recall" -> (bqRecall _)
  )

  val oracles: Map[String, String] = Map(
    "e22_range_search" -> rangeSearchOracle,
    "d8_semantic_decontaminate" -> semanticDecontaminateOracle,
    "e6_pq_adc" -> pqAdcOracle,
    "c1_kmeans" -> kmeansOracle,
    "c2_semantic_dedup" -> semanticDedupOracle,
    "e1_ann_brute_topk" -> bruteCosineOracle,
    "e2_ann_lsh_topk" -> lshCosineOracle,
    "e3_embedding_neardup" -> embeddingNearDupOracle,
    "e4_ann_ivf_topk" -> ivfCosineOracle,
    "e20_incremental_ann" -> incrementalIvfOracle,
    "e21_codebook_drift" -> codebookDriftRecallOracle,
    "e5_ann_recall" -> annRecallOracle,
    "e8_mmr_rerank" -> mmrRerankOracle,
    "e9_knn_graph_2level" -> knnGraphTwoLevelOracle,
    "e17_graph_ann" -> graphAnnOracle,
    "e10_sq8_ann" -> sq8Oracle,
    "e11_two_stage_rerank" -> twoStageRerankOracle,
    "e12_refine_recall" -> refineRecallOracle,
    "e13_filtered_ann" -> filteredAnnOracle,
    "e14_hybrid_rrf" -> hybridRrfOracle,
    "e15_ivfpq_topk" -> ivfPqOracle,
    "e16_ivfpq_recall" -> ivfPqRecallOracle,
    "e18_binary_ann" -> binaryQuantOracle,
    "e19_bq_recall" -> bqRecallOracle
  )
}
