package graft.ops

import graft.{Op, OpGroup, Tables}
import graft.functions.FloatVecDot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import parity._

/** §2.I vectors — similarity search over `embeddings.embedding`
  * (Array[Float], 64-dim; deliberately NOT VectorUDT — plain arrays keep
  * parquet parity and HOF access). No reference analog (cobradb matrices
  * are unpivoted rows); this is the north-star ANN surface.
  *
  * The pair loop uses the codegen'd [[graft.functions.FloatVecDot]]
  * expression: sequential double accumulation (bit-identical to the
  * DuckDB list_reduce oracle) in a primitive loop inside
  * WholeStageCodegen — the interpreted HOF equivalent is ~an order of
  * magnitude slower over millions of pairs.
  *
  * 100 TB design: `vec_cosine_topk` is the exact O(n²) baseline — at
  * real scale you never run it on the full corpus; `vec_ann_ivf` is the
  * scale path (coarse-quantizer bucketing → per-bucket exact search →
  * shuffle keyed on bucket id, each bucket a partition-local top-k).
  */
object Vectors extends OpGroup {

  /** vec_id, embedding, precomputed L2 norm — one linear pass. Spread
    * across cores first: the O(n²) pair loops below are NARROW stages
    * over this relation (the comparison side broadcasts), so their
    * parallelism is exactly this scan's — which is 1 for the single-file
    * fixture. On a real corpus the scan splits naturally and the
    * repartition is a cheap no-op safeguard before extreme
    * compute-per-byte.
    */
  private def normed(s: SparkSession, sf: String): DataFrame = {
    FloatVecDot.register(s)
    graft.functions.VecTopK.register(s)
    Tables.spread(s, Tables.embeddings(s, sf)).select(
      col("vec_id"), col("label"), col("embedding"),
      sqrt(expr("vec_dot(embedding, embedding)")).as("nrm"))
  }

  /** Top-k per query via the native bounded-heap
    * [[graft.functions.VecTopK]] aggregate: the shuffle after partial
    * aggregation carries ≤k entries per (group × partition) instead of
    * every pair row that a window row_number plan would shuffle and sort
    * — the difference between moving O(pairs) and O(groups·k) at 100 TB.
    *
    * Ranking is on the RAW sim double (the hot path never rounds):
    * [[FloatVecDot]] is a sequential left-fold, bit-identical to the
    * oracle's list_reduce, so both engines rank the exact same doubles —
    * and exact ties (duplicate vectors) break on b_vec_id identically.
    * Rounding to 6 digits happens once per SURVIVOR (k per query);
    * per-pair round() was ~40% of the whole query (BigDecimal path,
    * BENCH r2).
    */
  private def topkSelect(pairs: DataFrame, k: Int): DataFrame =
    pairs.select(col("a_vec_id"), col("b_vec_id"), col("sim"))
      .groupBy(col("a_vec_id"))
      .agg(expr(s"vec_topk(b_vec_id, sim, $k)").as("top"))
      .select(col("a_vec_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("a_vec_id"), (col("pos") + 1).cast("int").as("rk"),
        col("entry.id").as("b_vec_id"), r6(col("entry.sim")).as("cos_sim"))
      .orderBy("a_vec_id", "rk")

  /** Exact top-5 cosine neighbors per vector, brute force, fully
    * declarative: the comparison set is a broadcast DataFrame (ships
    * once per executor, like any dimension), the pair loop is a
    * codegen'd BroadcastNestedLoopJoin evaluating [[FloatVecDot]], and
    * the bounded-heap [[graft.functions.VecTopK]] partial-aggregates so
    * the shuffle carries ≤k entries per (query × partition) — never the
    * O(n²) pair rows. No driver collect, no mapPartitions: the executors
    * stream queries against the broadcast side inside WholeStageCodegen.
    *
    * TIER NOTE (r10): this key is the engine's deliberate EXACT tier —
    * the ground-truth generator the approximate family is measured
    * against (VectorSpec recall bounds all reference it). It is
    * all-pairs BY CONTRACT and priced accordingly: run it on a query
    * set × an IVF/LSH bucket, never corpus × corpus. The corpus-scale
    * members of the family are `vec_ann_ivf` / `vec_pq_adc_probe`
    * (index + probe) and the SRP-blocked `vec_knn_graph` (which r10
    * moved off this all-pairs shape onto the candidate graph).
    */
  private val cosineTopk = Op(
    "vec_cosine_topk",
    (s, sf) => {
      val v = normed(s, sf)
      val a = v.select(col("vec_id").as("a_vec_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      val b = v.select(col("vec_id").as("b_vec_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
      val pairs = a.join(broadcast(b), col("a_vec_id") =!= col("b_vec_id"))
        .withColumn("sim", expr("vec_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")))
      topkSelect(pairs, 5)
    },
    // Oracle ranks on the RAW sim too (list_reduce fold is bit-identical
    // to FloatVecDot's sequential loop, so both engines order the same
    // doubles; exact ties break on b_vec_id) and rounds only survivors.
    Some("""WITH v AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm FROM embeddings), p AS (SELECT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id, list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) AS sim FROM v a JOIN v b ON a.vec_id <> b.vec_id) SELECT a_vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY a_vec_id ORDER BY sim DESC, b_vec_id) AS INT) AS rk, b_vec_id, ROUND(1e-9 + sim, 6) AS cos_sim FROM p QUALIFY rk <= 5 ORDER BY a_vec_id, rk"""),
  )

  /** Per-label element-wise mean vector, long form (label, pos,
    * centroid_val) — ≈ one k-means maximization step. Exact decimal sums
    * so the per-dimension mean is engine-identical.
    */
  private val centroidPerLabel = Op(
    "vec_centroid_per_label",
    (s, sf) =>
      Tables.embeddings(s, sf)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(
          // float → DOUBLE → decimal on BOTH engines: DuckDB would cast
          // FLOAT → DECIMAL via the float's 7-digit shortest repr while
          // Spark widens through double — real 6th-decimal divergence.
          r6(sum(dec(col("v").cast("double"))).cast("double") / count(lit(1))).as("centroid_val"),
          count(lit(1)).as("n_vecs"),
        )
        .orderBy("label", "pos"),
    Some("""SELECT label, CAST(pos AS INT) AS pos, ROUND(1e-9 + CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS centroid_val, COUNT(*) AS n_vecs FROM (SELECT label, unnest(generate_series(1, len(embedding))) - 1 AS pos, unnest(embedding) AS v FROM embeddings) t GROUP BY label, pos ORDER BY label, pos"""),
  )

  /** Nearest-`nprobe` centroids per vector: K-way broadcast crossJoin
    * (K centroid rows — the correct plan for a coarse quantizer) +
    * per-vector rank. Ties break on cid ascending, deterministically.
    */
  private[graft] def nearestCells(v: DataFrame, cent: DataFrame, nprobe: Int): DataFrame =
    v.crossJoin(broadcast(cent))
      .withColumn("csim", expr("vec_dot(embedding, cvec)") / (col("nrm") * col("cnrm")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid").asc)))
      .filter(col("crk") <= nprobe)

  /** Lloyd maximization step: element-wise mean of each cell's members,
    * re-assembled into a float centroid vector (posexplode → mean →
    * regroup — the `vec_centroid_per_label` machinery generalized to
    * arbitrary cell assignments). Means accumulate as exact
    * DECIMAL(38,12) sums / count (r7, the PQ-training discipline):
    * partial-aggregation merge order cannot perturb a ulp, so quantizer
    * training across the whole vector family is order-free by
    * construction.
    */
  private[graft] def meanCentroids(assigned: DataFrame): DataFrame =
    decimalMean(assigned, Seq("cid"), "embedding", "cvec", "cnrm2")
      .withColumn("cnrm", sqrt(col("cnrm2")))
      .drop("cnrm2")

  /** IVF approximate nearest neighbors with a TRAINED coarse quantizer
    * (r3 verdict next-round #6 — previously the label column stood in
    * for the cells): centroids seed from the per-label means
    * (deterministic, K = #labels) and 2 Lloyd iterations — assign to
    * nearest centroid, re-average — expressed entirely as DataFrame ops
    * refine them into geometry-correlated Voronoi cells. Each query
    * probes its nprobe=2 closest centroids and exact top-5 search runs
    * only within the probed cells — ~nprobe/K of the pair work,
    * shuffled on the bucket key so each cell's search is
    * partition-local. Centroids localCheckpoint between iterations: K
    * tiny rows, keeps the training lineage out of the search plan. No
    * oracle (approximation is engine-specific); scalatest checks the
    * recall band and subset-of-exact property.
    */
  /** The IVF pipeline with the probe width exposed — the op runs
    * nprobe=2; VectorSpec sweeps {1,2,4} for the monotone-recall
    * property (candidate sets are supersets in nprobe, so recall vs the
    * exact top-k can only grow).
    */
  /** Train (or fetch the memoized) IVF coarse quantizer: label-mean
    * seeding + 2 Lloyd iterations, decimal means throughout (order-free
    * — see [[meanCentroids]]). The training loop's three jobs execute
    * EAGERLY (localCheckpoint) and their shuffles carry K≈10 centroid
    * rows — run at few partitions (the CC-loop / streaming
    * state-volume rationale: per-partition task overhead dominates tiny
    * shuffles at core-count fan-out), restored before the
    * lazily-executed search plan. Memoized per (session, sfDir) like
    * the PQ model: one index build serves every probe of the session.
    */
  private[graft] def ivfCentroids(s: SparkSession, sf: String): DataFrame =
    memoized(s, sf, "ivf") {
      val v = normed(s, sf)
      graft.Tables.withConfs(s,
        Seq("spark.sql.shuffle.partitions" -> "8")) {
        var c = meanCentroids(Tables.embeddings(s, sf)
            .select(col("label").as("cid"), col("embedding")))
          .localCheckpoint()
        for (_ <- 1 to 2) {
          val prev = c
          c = meanCentroids(
            nearestCells(v, c, 1).select(col("cid"), col("embedding")))
            .localCheckpoint()
          releaseCheckpoint(prev) // the superseded iterate's blocks, eagerly
        }
        c
      }
    }

  private[graft] def annIvfSearch(s: SparkSession, sf: String, nprobe: Int): DataFrame = {
      val v = normed(s, sf)
      val cent = ivfCentroids(s, sf)
      val probes = nearestCells(v, cent, nprobe)
        .select(col("vec_id").as("a_vec_id"), col("embedding").as("a_emb"),
          col("nrm").as("a_nrm"), col("cid").as("bucket"))
      // Cell membership under the SAME trained quantizer (top-1 cell).
      val bucketed = nearestCells(v, cent, 1)
        .select(col("cid").as("bucket"), col("vec_id").as("b_vec_id"),
          col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
      val pairs = probes.join(bucketed, "bucket")
        .filter(col("a_vec_id") =!= col("b_vec_id"))
        .withColumn("sim", expr("vec_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")))
      topkSelect(pairs, 5)
  }

  private val annIvf = Op(
    "vec_ann_ivf",
    (s, sf) => annIvfSearch(s, sf, 2),
    None,
  )

  /** Embedding-cosine near-duplicate pairs (threshold 0.4 — calibrated
    * non-vacuous on this corpus: random 64-d gaussians cluster near 0,
    * p99.9 ≈ 0.38). Declarative lower-triangle broadcast join: the
    * comparison side broadcasts as a DataFrame, `a_vec_id < b_vec_id`
    * halves the pair space, [[FloatVecDot]] evaluates inside codegen and
    * the threshold filter drops non-pairs before anything shuffles (only
    * the surviving ~dozens of rows reach the final sort). No driver
    * collect — at 100 TB the comparison set is an LSH/IVF bucket
    * (vec_ann_ivf shape) and this same plan runs per bucket. The
    * threshold compares the RAW quotient on both engines (bit-identical
    * doubles — same discipline as jaccardVerify) and rounds only the
    * surviving rows: a per-pair round() was half the query's runtime
    * (BigDecimal path) in BENCH r2.
    */
  private val embeddingNearDup = Op(
    "dedup_embedding_cosine",
    (s, sf) => {
      val v = normed(s, sf)
      val a = v.select(col("vec_id").as("a_vec_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      val b = v.select(col("vec_id").as("b_vec_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
      a.join(broadcast(b), col("a_vec_id") < col("b_vec_id"))
        .withColumn("sim", expr("vec_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")))
        .filter(col("sim") >= 0.4)
        .select(col("a_vec_id"), col("b_vec_id"), r6(col("sim")).as("cos_sim"))
        .orderBy("a_vec_id", "b_vec_id")
    },
    Some("""WITH v AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm FROM embeddings), p AS (SELECT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id, list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) AS sim FROM v a JOIN v b ON a.vec_id < b.vec_id) SELECT a_vec_id, b_vec_id, ROUND(1e-9 + sim, 6) AS cos_sim FROM p WHERE sim >= 0.4 ORDER BY a_vec_id, b_vec_id"""),
  )

  /** Per-dimension symmetric int8 quantization (r5) — the embedding
    * compression stage before ANN index build / training export (4×
    * smaller than float32, SIMD-dot-friendly). scale_d = 127 / max|x_d|
    * is a corpus-global per-dimension aggregate (64 groups, map-side
    * combined), broadcast back onto the exploded values; q = round(x ·
    * scale) never exceeds ±127 by construction. Emitted in long form
    * (vec_id, dim, q) — exact INTs, no float-array hashing. The r6-style
    * +1e-9 tie shift keeps the integer rounding engine-portable
    * (parity.r6's argument at integer granularity).
    */
  private val quantizeInt8 = Op(
    "vec_quantize_int8",
    (s, sf) => {
      val e = Tables.embeddings(s, sf)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
      val scales = e.groupBy("dim").agg(max(abs(col("x"))).as("mx"))
      e.join(broadcast(scales), "dim")
        .select(col("vec_id"), col("dim"),
          when(col("mx") > 0,
            round(col("x") * lit(127.0) / col("mx") + lit(1e-9), 0))
            .otherwise(lit(0.0)).cast("int").as("q"))
        .orderBy("vec_id", "dim")
    },
    Some("""WITH e AS (SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)), sc AS (SELECT dim, MAX(ABS(x)) AS mx FROM e GROUP BY dim) SELECT e.vec_id, e.dim AS dim, CAST(ROUND(CASE WHEN sc.mx > 0 THEN e.x * 127.0 / sc.mx + 1e-9 ELSE 0 END) AS INT) AS q FROM e JOIN sc ON e.dim = sc.dim ORDER BY e.vec_id, e.dim"""),
  )

  /** Matryoshka-style TRUNCATION (r6): keep the first 16 of 64 dims and
    * renormalize — the MRL/dimension-reduction export step that trades
    * recall for 4× index size (Kusupati et al. 2022's deployment
    * pattern; here the arithmetic + plumbing, training-agnostic). Emits
    * the truncated norm and its share of the full norm (how much energy
    * the prefix holds) — per-vector HOF arithmetic, no shuffle before
    * the output sort; the renormalized prefix itself is what an index
    * build would consume downstream.
    */
  private val truncateRenorm = Op(
    "vec_truncate_renorm",
    (s, sf) => {
      graft.functions.FloatVecDot.register(s)
      Tables.embeddings(s, sf)
        .withColumn("t", expr("slice(embedding, 1, 16)"))
        .withColumn("tnorm", sqrt(expr("vec_dot(t, t)")))
        .withColumn("fnorm", sqrt(expr("vec_dot(embedding, embedding)")))
        .select(col("vec_id"), r6(col("tnorm")).as("trunc_norm"),
          r6(col("tnorm") / when(col("fnorm") =!= 0, col("fnorm"))).as("energy_share"))
        .orderBy("vec_id")
    },
    Some("""WITH v AS (SELECT vec_id, sqrt(list_reduce(list_transform(embedding[1:16], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS tnorm, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS fnorm FROM embeddings) SELECT vec_id, ROUND(1e-9 + tnorm, 6) AS trunc_norm, ROUND(1e-9 + tnorm / NULLIF(fnorm, 0), 6) AS energy_share FROM v ORDER BY vec_id"""),
  )

  /** PRODUCT QUANTIZATION over IVF RESIDUALS (r6, residual-encoded r7)
    * — the IVFADC index of Jégou et al. 2011 §III (public): a coarse
    * quantizer (Kc = 16 full-dimension centroids, 2 Lloyd iterations)
    * absorbs the vector's position, and PQ encodes only the RESIDUAL
    * x − c(x) — M = 8 subspaces of 8 dims, K = 256 entries each (the
    * paper's one-byte-per-subspace default), 2 Lloyd iterations. Every
    * vector compresses to a 4-bit cell id + 8 bytes of codes.
    * Residual encoding + the byte-wide codebook lifted recall@5 vs
    * exact L2 on the spec's gaussian fixture from 0.20 (r6's direct
    * 8×16 PQ) to ≈0.5. Distributed shape: subvectors for ALL subspaces
    * explode into ONE relation keyed (vec_id, m), so every training
    * step — deterministic modulo seeding, nearest-centroid assignment
    * (L2² = |x|²−2x·c+|c|², the codegen vec_dot kernel, min-struct
    * aggregation rather than a rank window), per-(m, cid) re-averaging
    * — runs for all 8 codebooks in the SAME jobs; no per-subspace
    * loop. Codebook means accumulate as exact DECIMAL(38,12) sums
    * divided by count (never avg(double)): partial-aggregation merge
    * order cannot perturb a ulp, so training is order-free BY
    * CONSTRUCTION (the r6 parity discipline applied to training). The
    * ≤2048-row codebook localCheckpoints between iterations (tiny
    * shuffles at few partitions, lineage truncated, training eager /
    * search lazy). No oracle (trained quantizer is engine-specific);
    * VectorSpec asserts code range, per-vector completeness,
    * determinism, recall@5 ≥ 0.4, and that the trained codebook
    * reconstructs strictly better than the 1-centroid baseline.
    */
  private[graft] val PqM = 8
  private[graft] val PqK = 256
  private[graft] val PqCoarseK = 16

  /** Order-free Lloyd maximization step over any (…keys, vec) relation:
    * per-component mean as an exact decimal sum / count. `vecCol` is
    * re-assembled float, with its squared norm alongside.
    */
  private def decimalMean(assigned: DataFrame, keys: Seq[String], vecCol: String,
      outVec: String, outNrm2: String): DataFrame = assigned
    .select(keys.map(col) :+ posexplode(col(vecCol)).as(Seq("pos", "x")): _*)
    .groupBy(keys.map(col) :+ col("pos"): _*)
    .agg((sum(col("x").cast("decimal(38,12)")) / count(lit(1))).cast("double").as("cv"))
    .groupBy(keys.map(col): _*)
    .agg(expr("transform(sort_array(collect_list(struct(pos, cv))), s -> cast(s.cv as float))").as(outVec))
    .withColumn(outNrm2, expr(s"vec_dot($outVec, $outVec)"))

  /** Nearest coarse cell per vector (broadcast Kc rows, min-struct with
    * ccid tie break), carrying the full embedding through.
    */
  private def pqNearestCoarse(emb: DataFrame, coarse: DataFrame): DataFrame = emb
    .withColumn("enrm2", expr("vec_dot(embedding, embedding)"))
    .crossJoin(broadcast(coarse))
    .withColumn("d2", col("enrm2") - lit(2.0) * expr("vec_dot(embedding, ccvec)") + col("ccnrm2"))
    .groupBy(col("vec_id"))
    .agg(min(struct(col("d2"), col("ccid"), col("embedding"))).as("b"))
    .select(col("vec_id"), col("b.ccid").as("ccid"), col("b.embedding").as("embedding"))

  /** Train the Kc-cell coarse quantizer on the raw vectors
    * (deterministic modulo seeding, 2 Lloyd iterations, decimal means);
    * Kc rows (ccid, ccvec, ccnrm2), localCheckpointed per iteration.
    */
  private[graft] def pqCoarse(s: SparkSession, sf: String): DataFrame = {
    val emb = Tables.embeddings(s, sf).select(col("vec_id"), col("embedding"))
    def cmean(assigned: DataFrame): DataFrame =
      decimalMean(assigned, Seq("ccid"), "embedding", "ccvec", "ccnrm2")
    graft.Tables.withConfs(s, Seq("spark.sql.shuffle.partitions" -> "8")) {
      var c = cmean(emb.withColumn("ccid", pmod(col("vec_id"), lit(PqCoarseK)).cast("int")))
        .localCheckpoint()
      for (_ <- 1 to 2) {
        val prev = c
        c = cmean(pqNearestCoarse(emb, c)).localCheckpoint()
        releaseCheckpoint(prev)
      }
      c
    }
  }

  /** Residual-subvector relation under a given coarse quantizer: one
    * row per (vec_id, subspace m) with the cell id, the 8-dim residual
    * slice and its squared norm — the shared input of PQ training,
    * assignment and ADC search.
    */
  private[graft] def pqSubvectors(s: SparkSession, sf: String, coarse: DataFrame): DataFrame = {
    val sd = 64 / PqM
    pqNearestCoarse(Tables.embeddings(s, sf).select(col("vec_id"), col("embedding")), coarse)
      .join(broadcast(coarse.select(col("ccid"), col("ccvec"))), "ccid")
      .withColumn("rv", expr("zip_with(embedding, ccvec, (x, c) -> cast(x - c AS FLOAT))"))
      .select(col("vec_id"), col("ccid"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> struct(m AS m, slice(rv, m * $sd + 1, $sd) AS sv))")).as("e"))
      .select(col("vec_id"), col("ccid"), col("e.m").as("m"), col("e.sv").as("sv"))
      .withColumn("snrm2", expr("vec_dot(sv, sv)"))
  }

  /** Nearest-codebook-entry assignment per (vec_id, m): L2² via the
    * codegen vec_dot kernel; min-struct aggregation (cid-ascending tie
    * break) instead of a rank window — partial-aggregable, no sort.
    */
  private[graft] def pqNearest(sub: DataFrame, cb: DataFrame): DataFrame = sub
    .join(broadcast(cb), "m")
    .withColumn("d2", col("snrm2") - lit(2.0) * expr("vec_dot(sv, cvec)") + col("cnrm2"))
    .groupBy(col("vec_id"), col("m"))
    .agg(min(struct(col("d2"), col("cid"), col("ccid"), col("sv"))).as("b"))
    .select(col("vec_id"), col("m"), col("b.cid").as("cid"), col("b.ccid").as("ccid"),
      col("b.sv").as("sv"), col("b.d2").as("d2"))

  /** Train the M × K residual codebook (2 Lloyd iterations,
    * deterministic modulo seeding, decimal means); ≤ M·K rows
    * (m, cid, cvec, cnrm2), localCheckpointed per iteration.
    */
  private[graft] def pqTrain(s: SparkSession, sub: DataFrame): DataFrame = {
    def mean(assigned: DataFrame): DataFrame =
      decimalMean(assigned, Seq("m", "cid"), "sv", "cvec", "cnrm2")
    graft.Tables.withConfs(s, Seq("spark.sql.shuffle.partitions" -> "8")) {
      var c = mean(sub.withColumn("cid", pmod(col("vec_id"), lit(PqK)).cast("int"))
        .select(col("m"), col("cid"), col("sv"))).localCheckpoint()
      for (_ <- 1 to 2) {
        val prev = c
        c = mean(pqNearest(sub, c).select(col("m"), col("cid"), col("sv"))).localCheckpoint()
        releaseCheckpoint(prev)
      }
      c
    }
  }

  /** One training pass: coarse quantizer + residual codebook + the
    * subvector relation they both index — so ops never train twice.
    * The subvector relation materializes ONCE (localCheckpoint) at full
    * fan-out: every Lloyd iteration joins it against K = 256 codebook
    * rows (n·M·K candidate rows — the heavy stage now that codebooks
    * are byte-wide), so it must neither recompute per eager step nor
    * sit at the training shuffles' deliberately small partition count.
    *
    * The trained model MEMOIZES per (session, sfDir): an index is built
    * once and queried many times — vec_pq_codes and vec_pq_adc_topk in
    * one session share one training pass, exactly as a production index
    * build would. Training is order-free-deterministic (decimal means),
    * so memoization is semantically invisible; `pqModelReset()` drops
    * the cache for specs that deliberately retrain.
    */
  /** Memo store for trained models (PQ, IVF), keyed
    * (session, sfDir, kind). Training is order-free-deterministic, so
    * memoization is semantically invisible; [[pqModelReset]] drops it
    * for specs that deliberately retrain.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), AnyRef]()

  /** Free the block-manager storage behind a localCheckpointed DataFrame
    * NOW rather than when the ContextCleaner gets to the orphaned RDD:
    * walk the plan for the checkpoint's LogicalRDD and unpersist it.
    * No-op on plans that were never checkpointed.
    */
  private[ops] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  private def releaseModel(v: AnyRef): Unit = {
    def rel(x: Any): Unit = x match {
      case d: org.apache.spark.sql.Dataset[_] => releaseCheckpoint(d.toDF())
      case _                                  => ()
    }
    v match {
      case p: Product => p.productIterator.foreach(rel)
      case other      => rel(other)
    }
  }

  /** get / putIfAbsent rather than computeIfAbsent: training runs
    * multi-job Spark work, which must not execute inside the map's bin
    * lock (it would block every concurrent cache access). A duplicate
    * build that loses the race releases its storage and adopts the
    * winner — training is order-free-deterministic, so the two are
    * identical anyway.
    */
  private def memoized[T <: AnyRef](s: SparkSession, sf: String, kind: String)(build: => T): T = {
    val k = (s, sf, kind)
    val hit = modelCache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val built = build
      val raced = modelCache.putIfAbsent(k, built)
      if (raced == null) built
      else { releaseModel(built); raced.asInstanceOf[T] }
    }
  }

  /** Drop every memoized model AND release its checkpointed storage —
    * retrain specs and long-lived sessions scoring many sfDirs both
    * need the executor storage back, not just the map entries gone.
    */
  private[graft] def pqModelReset(): Unit = {
    import scala.jdk.CollectionConverters._
    val vs = modelCache.values().asScala.toList
    modelCache.clear()
    vs.foreach(releaseModel)
  }

  /** Training-pass counter — spec instrumentation for the persistence
    * contract: serving a probe from a parquet-reloaded index must not
    * re-enter the Lloyd loops (PqIndexSpec asserts the count is flat
    * across a cold reload).
    */
  private[graft] val pqTrainCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private[graft] def pqModel(s: SparkSession, sf: String): (DataFrame, DataFrame, DataFrame) =
    memoized(s, sf, "pq") {
      // Self-contained registration: in a fresh session whose FIRST op
      // is a PQ one, nothing else has registered the codegen kernel yet
      // (surfaced by PqIndexSpec's cold-session path).
      FloatVecDot.register(s)
      pqTrainCounter.incrementAndGet()
      val coarse = pqCoarse(s, sf)
      val sub = pqSubvectors(s, sf, coarse).repartition(32).localCheckpoint()
      (coarse, sub, pqTrain(s, sub))
    }

  private[graft] def pqAssign(s: SparkSession, sf: String): DataFrame = {
    val (_, sub, cb) = pqModel(s, sf)
    pqNearest(sub, cb)
  }

  private val pqCodes = Op(
    "vec_pq_codes",
    (s, sf) =>
      pqAssign(s, sf)
        .select(col("vec_id"), col("ccid"), col("m"), col("cid").as("code"))
        .orderBy("vec_id", "m"),
    None,
  )

  /** IVFADC ASYMMETRIC-DISTANCE top-k search (r6, residual-decomposed
    * r7) — the compressed-domain query path that makes vec_pq_codes an
    * index, not just compression (Jégou et al. 2011 §III): the
    * approximate distance ‖q − c − p‖² expands into three TABLE
    * LOOKUPS summed over the M stored codes,
    *   A(q, cell, m)   = ‖q_m − c_m‖²          (queries × Kc × M rows)
    *   B(q, m, cid)    = −2 q_m · p_{m,cid}     (queries × M·K — the
    *                                             classic ADC table)
    *   C(cell, m, cid) = 2 c_m · p + ‖p‖²       (query-INDEPENDENT,
    *                                             Kc × M·K, built once)
    * so the per-query work is three tiny broadcast builds and the
    * database side never touches a float vector again: the codes
    * relation (n × M byte-codes — the only thing scanned at 100 TB)
    * broadcast-joins the three tables and aggregates per
    * (query, vector); no full M·K·Kc per-query cross table is ever
    * materialized. The top-k rank runs over the aggregated candidate
    * rows. No oracle (trained quantizer); VectorSpec bounds recall@5
    * ≥ 0.4 against the exact L2 top-5.
    */
  /** The three ADC lookup tables plus the codes relation, shared by the
    * full ranking (vec_pq_adc_topk) and the nprobe-pruned production
    * search (vec_pq_adc_probe). Shapes: codes n×M bytes (the only
    * 100 TB-scale relation), A queries × Kc × M, B queries × M·K,
    * C (query-independent) Kc × M·K.
    */
  private def adcTables(s: SparkSession, sf: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (coarse, sub, cb) = pqModel(s, sf)
    val codes = pqNearest(sub, cb).select(col("vec_id"), col("ccid"), col("m"), col("cid"))
    adcTablesFrom(s, sf, coarse, cb, codes)
  }

  /** The three ADC lookup tables for a GIVEN model (coarse quantizer,
    * residual codebook, codes relation) — the seam that lets the same
    * query path serve the in-session trained model ([[adcTables]]) or a
    * parquet-RELOADED index ([[pqPersistedModel]]): a production vector
    * index is built once and served many times, so the search arithmetic
    * must not care where the model came from.
    */
  private def adcTablesFrom(s: SparkSession, sf: String, coarse: DataFrame,
      cb: DataFrame, codes: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    FloatVecDot.register(s)
    val sd = 64 / PqM
    val qsub = Tables.embeddings(s, sf).filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_vec_id"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> struct(m AS m, slice(embedding, m * $sd + 1, $sd) AS qv))")).as("e"))
      .select(col("q_vec_id"), col("e.m").as("m"), col("e.qv").as("qv"))
    val csub = coarse.select(col("ccid"), explode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> struct(m AS m, slice(ccvec, m * $sd + 1, $sd) AS cv))")).as("e"))
      .select(col("ccid"), col("e.m").as("m"), col("e.cv").as("cv"))
    val tabA = qsub.join(broadcast(csub), "m")
      .select(col("q_vec_id"), col("ccid"), col("m"),
        expr("vec_dot(qv, qv) - 2 * vec_dot(qv, cv) + vec_dot(cv, cv)").as("a"))
    val tabB = qsub.join(broadcast(cb), "m")
      .select(col("q_vec_id"), col("m"), col("cid"),
        (lit(-2.0) * expr("vec_dot(qv, cvec)")).as("b"))
    val tabC = csub.join(broadcast(cb), "m")
      .select(col("ccid"), col("m"), col("cid"),
        (lit(2.0) * expr("vec_dot(cv, cvec)") + col("cnrm2")).as("c"))
    (codes, tabA, tabB, tabC)
  }

  /** Top-k rank + 6-decimal rounding over aggregated (q, vec, adc) rows. */
  private def adcRank(cand: DataFrame): DataFrame = cand
    .filter(col("q_vec_id") =!= col("vec_id"))
    .withColumn("rk", row_number().over(
      Window.partitionBy(col("q_vec_id"))
        .orderBy(col("adc_d2").asc, col("vec_id").asc)).cast("int"))
    .filter(col("rk") <= 5)
    .select(col("q_vec_id"), col("rk"), col("vec_id"),
      graft.ops.parity.r6(col("adc_d2")).as("adc_d2"))
    .orderBy("q_vec_id", "rk")

  /** The full compressed-domain ranking dataflow, pre-scope — the seam
    * the same-session scoped-vs-plain A/B measurement drives (r16).
    */
  private[graft] def pqAdcTopkPlain(s: SparkSession, sf: String): DataFrame = {
    val (codes, tabA, tabB, tabC) = adcTables(s, sf)
    adcRank(codes
      .join(broadcast(tabC), Seq("ccid", "m", "cid"))
      .join(broadcast(tabB), Seq("m", "cid"))
      .join(broadcast(tabA), Seq("q_vec_id", "ccid", "m"))
      .groupBy(col("q_vec_id"), col("vec_id"))
      .agg(sum(col("a") + col("b") + col("c")).as("adc_d2")))
  }

  private val pqAdcTopk = Op(
    "vec_pq_adc_topk",
    // Query-side residual tables vs EVERY cell (the spec's full
    // compressed-domain ranking; vec_pq_adc_probe is the nprobe-pruned
    // production variant of the same tables).
    // Probe conf scope REVERTED (r16, the r15 verdict's item 4): the
    // r15 keep rested on isolated one-window evidence that sweeps did
    // not reproduce. Same-session INTERLEAVED A/B (graft.tools.AdcAb,
    // 5 reps each): scoped min 1.450 / med 1.755 vs plain min 1.477 /
    // med 1.764 — flat, far under the 10% keep bar; the plan-dump
    // exchange-count drop is not a win by itself.
    (s, sf) => pqAdcTopkPlain(s, sf).orderBy("q_vec_id", "rk"),
    None,
  )

  /** PRODUCTION IVFADC probe (r7): the same three-table ADC arithmetic
    * as vec_pq_adc_topk, but each query ranks only the vectors stored in
    * its `nprobe` nearest coarse cells (Jégou et al. 2011 §III-C) —
    * Σ_m A(q, cell, m) = ‖q − c‖² is exactly the coarse distance, so the
    * probe set falls out of table A with no extra vector arithmetic.
    * The candidate build joins the probe list against the codes relation
    * FIRST: at 100 TB, with codes partitioned by cell id, this is the
    * partition-pruned scan — ~nprobe/Kc of the index is read per query,
    * which is the entire point of IVF. nprobe = Kc degenerates to the
    * full ranking (spec-asserted); the op runs nprobe = 4 (Kc/4 of the
    * work at ≈0.7× the full-ADC recall on the spec fixture — the
    * recall/cost dial every IVF deployment tunes).
    */
  private[graft] def pqAdcProbe(s: SparkSession, sf: String, nprobe: Int): DataFrame =
    pqAdcProbeFrom(adcTables(s, sf), nprobe)

  /** The probe path, optionally METADATA-FILTERED (r13, the r12
    * verdict's item 7 — "top-k among vectors matching a predicate", the
    * production retrieval shape): `keep`, when given, is the vec_id set
    * matching the metadata predicate and gates the candidate rows
    * AFTER the cell-pruned codes read but BEFORE any ADC table join —
    * non-matching vectors never cost a lookup, and the top-k ranks
    * only eligible candidates (post-filtering the unfiltered top-k
    * would under-fill it; this is the pre-filter IVF everyone ships).
    * The keep join is deliberately HINT-FREE (the sim_containment r12
    * lesson): at fixture size the optimizer elects broadcast from
    * measured size; at 100 TB a selective predicate's id set is
    * corpus-scale and must stay a shuffle join on vec_id — or move the
    * metadata column into the cell-partitioned codes relation so the
    * predicate becomes a parquet scan filter.
    */
  private def pqAdcProbeFrom(t: (DataFrame, DataFrame, DataFrame, DataFrame),
      nprobe: Int, keep: Option[DataFrame] = None): DataFrame = {
    val (codes, tabA, tabB, tabC) = t
    val probes = tabA.groupBy(col("q_vec_id"), col("ccid"))
      .agg(sum(col("a")).as("cd2"))
      .withColumn("prk", row_number().over(
        Window.partitionBy(col("q_vec_id")).orderBy(col("cd2").asc, col("ccid").asc)))
      .filter(col("prk") <= nprobe)
      .select(col("q_vec_id"), col("ccid"))
    val pruned = codes.join(broadcast(probes), "ccid")
    val cand = keep.fold(pruned)(k => pruned.join(k, Seq("vec_id"), "left_semi"))
    adcRank(cand
      .join(broadcast(tabC), Seq("ccid", "m", "cid"))
      .join(broadcast(tabB), Seq("q_vec_id", "m", "cid"))
      .join(broadcast(tabA), Seq("q_vec_id", "ccid", "m"))
      .groupBy(col("q_vec_id"), col("vec_id"))
      .agg(sum(col("a") + col("b") + col("c")).as("adc_d2")))
  }

  private val pqAdcProbeOp = Op(
    "vec_pq_adc_probe",
    // Probe conf scope REVERTED (r16, the r15 verdict's item 4) — same
    // interleaved A/B as vec_pq_adc_topk: scoped min 1.966 / med 2.054
    // vs plain min 1.806 / med 2.037. Flat-to-negative; reverted.
    (s, sf) => pqAdcProbe(s, sf, 4).orderBy("q_vec_id", "rk"),
    None,
  )

  /** Fingerprint-keyed on-disk home of the trained IVFADC index: a
    * regenerated embeddings table invalidates the artifacts (the
    * [[Tables.cachedDir]] contract — superseded generations vacuumed),
    * so a stale index can never serve a new corpus.
    */
  private[graft] def pqIndexDir(s: SparkSession, sf: String): String =
    Tables.cachedDir(
      s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_pq_index",
      sf.replaceAll("[^a-zA-Z0-9.]", "_"),
      Tables.fingerprint(sf, "embeddings"))

  /** PERSIST-or-RELOAD the trained IVFADC index (r10, the r9 verdict's
    * missing lifecycle half): a real 100 TB vector index is built ONCE
    * and SERVED — the in-session model memo dies with the session, so
    * the trained coarse quantizer (Kc rows), residual codebook (M·K
    * rows) and the codes relation (n×M — the only corpus-scale
    * artifact, the thing a cluster would write cell-partitioned) are
    * written as parquet under the fingerprint-keyed dir on first
    * demand, and every subsequent call — including a COLD session that
    * never trained — answers from the files alone. Floats and doubles
    * round-trip parquet bit-exactly and training is order-free
    * deterministic (decimal means), so reload ≡ retrain to the last
    * bit; PqIndexSpec asserts probe-result equality against the
    * in-memory model AND that a cold reload performs zero training
    * passes ([[pqTrainCounter]]).
    */
  private[graft] def pqPersistedModel(s: SparkSession, sf: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dir = pqIndexDir(s, sf)
    val parts = Seq("coarse", "codebook", "codes")
    if (!parts.forall(p => new java.io.File(s"$dir/$p", "_SUCCESS").exists())) {
      val (coarse, sub, cb) = pqModel(s, sf)
      val codes = pqNearest(sub, cb)
        .select(col("vec_id"), col("ccid"), col("m"), col("cid"))
      coarse.write.mode("overwrite").parquet(s"$dir/coarse")
      cb.write.mode("overwrite").parquet(s"$dir/codebook")
      // SERVE LAYOUT (r12, the r11 verdict's item 3): the codes
      // relation — the only corpus-scale artifact — is partitioned by
      // coarse cell, so the nprobe-pruned search reads ~nprobe/Kc of
      // the index as DIRECTORY pruning (PqIndexSpec asserts
      // PartitionFilters on the reload-probe plan), which is the
      // entire point of IVF at 100 TB.
      codes.write.mode("overwrite").partitionBy("ccid").parquet(s"$dir/codes")
    }
    (s.read.parquet(s"$dir/coarse"),
      s.read.parquet(s"$dir/codebook"),
      s.read.parquet(s"$dir/codes"))
  }

  /** Reload-and-search: serve `vec_pq_adc_probe`'s exact query path
    * (nprobe = 4) from the PERSISTED index — the op a fresh session
    * runs against an index built by an earlier one. No oracle (trained
    * quantizer), spec-gated: PqIndexSpec pins reload ≡ in-memory
    * retrain row-for-row plus the zero-training cold path.
    */
  private val pqIndexReload = Op(
    "vec_pq_index_reload",
    (s, sf) => {
      val (coarse, cb, codes) = pqPersistedModel(s, sf) // index write (first demand) outside the scope
      // orderBy outside the pin: explicit output order (see vec_pq_adc_topk).
      Tables.scopedPin(s, s"vec_pq_index_reload@$sf") {
        pqAdcProbeFrom(adcTablesFrom(s, sf, coarse, cb, codes), 4)
      }.orderBy("q_vec_id", "rk")
    },
    None,
  )

  /** FILTERED ANN over the persisted index (r13, r12 verdict #7): the
    * nprobe=4 IVFADC probe restricted to vectors whose metadata matches
    * a predicate (label = 3 here) — "nearest matching my filter", the
    * shape retrieval actually runs in production. Serves from the
    * PERSISTED cell-partitioned index, so the plan stacks all three
    * prunings: directory pruning on the probed cells, a pushed parquet
    * filter on the metadata scan, and the pre-ADC semi-join gate
    * ([[pqAdcProbeFrom]]'s `keep`). No oracle (trained quantizer);
    * PqIndexSpec pins (a) every hit satisfies the predicate, (b)
    * recall@5 vs the EXACT filtered L2 ranking at the nprobe
    * statistical floor, (c) the pruned plan (PartitionFilters +
    * PushedFilters).
    */
  private[graft] def pqProbeFiltered(s: SparkSession, sf: String, lbl: Int,
      nprobe: Int): DataFrame = {
    val (coarse, cb, codes) = pqPersistedModel(s, sf)
    val keep = Tables.embeddings(s, sf)
      .filter(col("label") === lbl).select(col("vec_id"))
    pqAdcProbeFrom(adcTablesFrom(s, sf, coarse, cb, codes), nprobe, Some(keep))
  }

  private val pqProbeFilteredOp = Op(
    "vec_pq_probe_filtered",
    // Deliberately NOT under the probe conf scope (r15): the metadata
    // keep-gate semi-join benefits from AQE's runtime broadcast
    // election (measured 1.10 s unscoped vs 1.50-1.55 s scoped — the
    // static planner picks a sort path for the hint-free keep join).
    (s, sf) => pqProbeFiltered(s, sf, lbl = 3, nprobe = 4),
    None,
  )

  /** Fingerprint-keyed home of the APPEND-maintained IVFADC index (r13)
    * — the vector dual of the text index's `dedup_minhash_index_append`
    * lineage, separate from [[pqIndexDir]] so the reload key's
    * artifacts stay pristine.
    */
  private[graft] def pqAppendDir(s: SparkSession, sf: String): String =
    Tables.cachedDir(
      // _v2: the prefix carries the LAYOUT version (multi-generation
      // dirs since r14) — a layout change must bump it so stale
      // artifacts from an older build can never half-serve the new
      // read path (the fingerprint in the dir NAME only invalidates on
      // data changes, not code-layout changes).
      s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_pq_index_app_v2",
      sf.replaceAll("[^a-zA-Z0-9.]", "_"),
      Tables.fingerprint(sf, "embeddings"))

  /** FROZEN-MODEL INDEX GROWTH (r13): production vector indexes retrain
    * the quantizer rarely and ENCODE daily — the model (coarse cells +
    * residual codebooks) is a fixed artifact, the codes relation is the
    * thing that grows. Generation 0 persists the trained model plus the
    * EVEN-parity vectors' codes (cell-partitioned, the serve layout);
    * the append encodes the ODD-parity batch with the RELOADED model —
    * never a training pass — and commits its codes as a new ccid-
    * partitioned GENERATION directory (one atomic rename, r14 crash-safe
    * protocol). Growth cost is O(batch) encode +
    * commit; the model files and every base code file survive untouched
    * (PqIndexSpec asserts the file set). Because the model is the same
    * deterministic artifact the reload key persists, the appended
    * index's membership converges to ALL vectors and the probe must
    * equal `vec_pq_index_reload`'s answer ROW-FOR-ROW — the spec's
    * append ≡ rebuild contract, for free from determinism.
    */
  /** Generation 0: the frozen model + even-parity codes (the seam
    * PqIndexSpec snapshots before asserting the append leaves it
    * untouched).
    */
  private[graft] def pqAppendBase(s: SparkSession, sf: String): String = {
    val dir = pqAppendDir(s, sf)
    val parts = Seq("coarse", "codebook", "codes")
    if (!parts.forall(p => new java.io.File(s"$dir/$p", "_SUCCESS").exists())) {
      val (coarse, sub, cb) = pqModel(s, sf)
      coarse.write.mode("overwrite").parquet(s"$dir/coarse")
      cb.write.mode("overwrite").parquet(s"$dir/codebook")
      pqNearest(sub, cb)
        .filter(pmod(col("vec_id"), lit(2)) === 0)
        .select(col("vec_id"), col("ccid"), col("m"), col("cid"))
        .write.mode("overwrite").partitionBy("ccid").parquet(s"$dir/codes")
    }
    dir
  }

  private[graft] def pqAppendedIndex(s: SparkSession, sf: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dir = pqAppendBase(s, sf)
    // CRASH-SAFE COMMIT (r14, the r13 verdict's item 1 + r13 ADVICE):
    // the r13 formulation mode("append")ed codes into the live ccid=…
    // dirs and then dropped an _APPENDED marker — a crash between the
    // two let a retry re-append, and duplicated (vec_id,ccid,m,cid)
    // rows double adc_d2 in the probe's sum aggregate, corrupting the
    // ranking. Now the ingest generation stages whole and commits via
    // ONE atomic rename ([[Tables.commitStaged]]); the base codes are
    // never written after generation 0 (PqIndexSpec's crash-retry
    // negative test pins exactly-once membership).
    // MULTI-GENERATION ingest (r14, the LSH twin's shape): the odd half
    // arrives as two daily batches (gen g encodes doc vec_id % 4 ==
    // 2g − 1), each encode-only against the frozen persisted model and
    // each committed by its own atomic rename. Membership converges to
    // all vectors, so probe ≡ reload holds per generation count.
    for (g <- 1 to PqIngestGens)
      Tables.commitStaged(dir, s"gen$g") { tmp =>
        // Encode the ingest batch with the PERSISTED model — the frozen
        // artifact, not the in-session memo (a cold session appends from
        // files alone; no training counter movement, spec-pinned).
        val coarseR = s.read.parquet(s"$dir/coarse")
        val cbR = s.read.parquet(s"$dir/codebook")
        pqNearest(pqSubvectors(s, sf, coarseR), cbR)
          .filter(pmod(col("vec_id"), lit(4)) === (2 * g - 1))
          .select(col("vec_id"), col("ccid"), col("m"), col("cid"))
          .write.mode("overwrite").partitionBy("ccid").parquet(s"$tmp/codes")
      }
    (s.read.parquet(s"$dir/coarse"),
      s.read.parquet(s"$dir/codebook"),
      pqAppendedCodes(s, dir))
  }

  /** Number of daily ingest generations the append lineage commits. */
  private[graft] val PqIngestGens = 2

  /** The append-grown codes relation: generation 0 ∪ every committed
    * ingest generation, each read from its own root so ccid partition
    * discovery applies per branch.
    */
  private[graft] def pqAppendedCodes(s: SparkSession, dir: String): DataFrame =
    (0 to PqIngestGens).map {
      case 0 => s.read.parquet(s"$dir/codes")
      case g => s.read.parquet(s"$dir/gen$g/codes")
    }.reduce(_.unionByName(_))

  /** The keyed op: serve `vec_pq_adc_probe`'s nprobe=4 query path from
    * the append-grown index. No oracle (trained quantizer); PqIndexSpec
    * pins probe ≡ the reload key's full-index answer row-for-row, the
    * untouched base file set, and the zero-training cold append.
    */
  private val pqIndexAppend = Op(
    "vec_pq_index_append",
    (s, sf) => {
      val (coarse, cb, codes) = pqAppendedIndex(s, sf) // ingest commits outside the scope
      // orderBy outside the pin: explicit output order (see vec_pq_adc_topk).
      Tables.scopedPin(s, s"vec_pq_index_append@$sf") {
        pqAdcProbeFrom(adcTablesFrom(s, sf, coarse, cb, codes), 4)
      }.orderBy("q_vec_id", "rk")
    },
    None,
  )

  /** TOMBSTONE DELETES (r14) — the vector twin of
    * `dedup_minhash_index_delete`, closing the lifecycle at six acts on
    * both index families: retired vectors commit as a crash-safe
    * tombstone generation, the probe anti-joins them out of the codes
    * relation BEFORE the ADC table joins (a retired member costs no
    * lookup work — the same placement as the filtered probe's keep
    * gate), retired queries drop from the result, and the top-5 REFILLS
    * from the exact ADC ranking (rank-6 promotion — PqDeleteSpec pins
    * the promote semantics: common hits keep their relative order and
    * every query still gets 5 live hits). No oracle (trained
    * quantizer).
    */
  private[graft] def pqTombstoneSet(s: SparkSession, sf: String): DataFrame = {
    val dir = pqAppendBase(s, sf)
    Tables.commitStaged(dir, "tombstones") { tmp =>
      Tables.embeddings(s, sf).filter(pmod(col("vec_id"), lit(7)) === 0)
        .select("vec_id").write.mode("overwrite").parquet(s"$tmp/ids")
    }
    s.read.parquet(s"$dir/tombstones/ids")
  }

  private val pqIndexDelete = Op(
    "vec_pq_index_delete",
    (s, sf) => {
      val (coarse, cb, codes) = pqAppendedIndex(s, sf) // ingest+tombstone commits outside the scope
      val ts = pqTombstoneSet(s, sf)
      val live = codes.join(ts, Seq("vec_id"), "left_anti")
      Tables.scopedPin(s, s"vec_pq_index_delete@$sf") {
        pqAdcProbeFrom(adcTablesFrom(s, sf, coarse, cb, live), 4)
          .join(ts.select(col("vec_id").as("q_vec_id")), Seq("q_vec_id"), "left_anti")
      }.orderBy("q_vec_id", "rk")
    },
    None,
  )

  /** INDEX COMPACTION (r14, the r13 verdict's item 2) — the vector dual
    * of `dedup_minhash_index_compact`, closing the build → serve →
    * append → compact lifecycle: the append-grown codes relation
    * (generation roots, each contributing files per ccid directory) is
    * rewritten into ONE right-sized file per coarse cell (repartition on
    * ccid routes each cell wholly to one writer; the production knob is
    * bytes-per-file). Content-neutral — the probe over the compacted
    * index must equal `vec_pq_index_reload` row-for-row, like the append
    * key — and it RESTORES the single-root layout, so the nprobe search
    * regains plain dynamic directory pruning instead of per-generation
    * scans (PqCompactSpec asserts PartitionFilters on the compacted
    * scan, the per-cell file count, and crash-safe staging).
    */
  private[graft] def pqCompactedIndex(s: SparkSession, sf: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dir = pqAppendDir(s, sf)
    // A committed compaction serves on its own (see the LSH twin): the
    // generation code dirs stay untouched so the vacuum act can retire
    // them. The model relations (coarse/codebook) are NOT generations —
    // they are the serve artifacts themselves and survive vacuum.
    if (!new java.io.File(dir, "compact").exists()) {
      pqAppendedIndex(s, sf) // ensure gen1 is committed first
      Tables.commitStaged(dir, "compact") { tmp =>
        pqAppendedCodes(s, dir).repartition(col("ccid"))
          .write.mode("overwrite").partitionBy("ccid").parquet(s"$tmp/codes")
      }
    }
    (s.read.parquet(s"$dir/coarse"),
      s.read.parquet(s"$dir/codebook"),
      s.read.parquet(s"$dir/compact/codes"))
  }

  /** VACUUM (r14) — retire the generation CODE dirs once compaction is
    * committed (the LSH twin's fifth act; model artifacts stay).
    */
  private[graft] def pqVacuumGenerations(dir: String): Unit = {
    require(new java.io.File(dir, "compact").exists(),
      s"refusing to vacuum $dir: no committed compaction — generations are still the only copy")
    (Seq("codes") ++ (1 to PqIngestGens).map(g => s"gen$g"))
      .foreach(p => Tables.rmTree(new java.io.File(dir, p)))
  }

  /** The keyed op: compact the append-grown index, then serve the
    * nprobe=4 probe from the compacted codes. No oracle (trained
    * quantizer); PqCompactSpec pins probe ≡ reload, one file per ccid
    * dir, restored directory pruning, and content-neutrality.
    */
  private val pqIndexCompact = Op(
    "vec_pq_index_compact",
    (s, sf) => {
      val (coarse, cb, codes) = pqCompactedIndex(s, sf) // compaction commit outside the scope
      // orderBy outside the pin: explicit output order (see vec_pq_adc_topk).
      Tables.scopedPin(s, s"vec_pq_index_compact@$sf") {
        pqAdcProbeFrom(adcTablesFrom(s, sf, coarse, cb, codes), 4)
      }.orderBy("q_vec_id", "rk")
    },
    None,
  )

  /** PQ ADC with a FIXED codebook (r7) — the same encode → code →
    * table-lookup → top-k arithmetic as vec_pq_adc_topk, but over a
    * deterministic integer-arithmetic codebook (cv(m, cid, pos) =
    * ((m·2654435761 + cid·40503 + pos·2246822519) mod 2000)/1000 − 1 —
    * exact 3-decimal rationals, identical in any engine), which puts
    * the WHOLE compressed-domain pipeline under the DuckDB hash gate:
    * trained-quantizer ops stay no-oracle by nature, this op proves the
    * lookup-sum machinery itself. Parity discipline: each squared
    * per-component term rounds to 12 decimals and sums as exact
    * DECIMAL — subspace distances are bit-identical decimals in both
    * engines, so argmin codes, ADC sums and the final ranking agree
    * exactly (ties break cid- / vec_id-ascending).
    */
  private val pqAdcFixed = Op(
    "vec_pq_adc_fixed",
    (s, sf) => {
      val cb = s.range(1).select(explode(expr(
          """flatten(transform(sequence(0, 7), m ->
             flatten(transform(sequence(0, 15), cid ->
               transform(sequence(0, 7), pos -> struct(m AS m, cid AS cid, pos AS pos,
                 (CAST((m * 2654435761L + cid * 40503L + pos * 2246822519L) % 2000 AS DOUBLE) / 1000.0 - 1.0) AS cv))))))""")).as("c"))
        .select(col("c.m").as("m"), col("c.cid").as("cid"), col("c.pos").as("pos"), col("c.cv").as("cv"))
      // Subspace distances from any (filtered) slice of the corpus. The
      // codes side needs all vectors, the query tables only vec_id < 20:
      // building each from its OWN pipeline pushes the query filter into
      // the scan (~4% extra work) instead of caching/pinning the shared
      // 512k-row relation for two differently-pruned consumers.
      // spread: the single-file scan is ONE partition, and everything up
      // to the first exchange (the 16-way join fan-out + partial agg)
      // inherits it — the docs/scale.md narrow-stage lesson.
      def d2Of(filter: Column): DataFrame = Tables.spread(s, Tables.embeddings(s, sf)
        .filter(filter))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
        .select(col("vec_id"), (col("p") / 8).cast("int").as("m"),
          pmod(col("p"), lit(8)).as("pos"), col("v").cast("double").as("x"))
        .join(broadcast(cb), Seq("m", "pos"))
        .withColumn("term", expr("cast(round((x - cv) * (x - cv), 12) as decimal(18,12))"))
        .groupBy(col("vec_id"), col("m"), col("cid"))
        .agg(sum(col("term")).as("d2"))
      val codes = d2Of(lit(true)).groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("d2"), col("cid"))).as("b"))
        .select(col("vec_id"), col("m"), col("b.cid").as("cid"))
      val qtab = d2Of(col("vec_id") < 20)
        .select(col("vec_id").as("q_vec_id"), col("m"), col("cid"), col("d2").as("d2q"))
      codes.join(broadcast(qtab), Seq("m", "cid"))
        .groupBy(col("q_vec_id"), col("vec_id"))
        .agg(sum(col("d2q")).as("adc"))
        .filter(col("q_vec_id") =!= col("vec_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_vec_id"))
            .orderBy(col("adc").asc, col("vec_id").asc)).cast("int"))
        .filter(col("rk") <= 5)
        .select(col("q_vec_id"), col("rk"), col("vec_id"),
          r6(col("adc").cast("double")).as("adc_d2"))
        .orderBy("q_vec_id", "rk")
    },
    Some("""WITH cb AS (SELECT m, cid, pos, CAST((m * 2654435761 + cid * 40503 + pos * 2246822519) % 2000 AS DOUBLE) / 1000.0 - 1.0 AS cv FROM generate_series(0, 7) g1(m), generate_series(0, 15) g2(cid), generate_series(0, 7) g3(pos)), sub AS (SELECT vec_id, CAST((pos - 1) // 8 AS INT) AS m, CAST((pos - 1) % 8 AS INT) AS pos, CAST(v AS DOUBLE) AS x FROM (SELECT vec_id, unnest(embedding) AS v, unnest(generate_series(1, len(embedding))) AS pos FROM embeddings) t), d2 AS (SELECT s.vec_id, s.m, c.cid, SUM(CAST(ROUND((s.x - c.cv) * (s.x - c.cv), 12) AS DECIMAL(18,12))) AS d2 FROM sub s JOIN cb c ON c.m = s.m AND c.pos = s.pos GROUP BY s.vec_id, s.m, c.cid), codes AS (SELECT vec_id, m, cid FROM (SELECT vec_id, m, cid, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn FROM d2) r WHERE rn = 1), adc AS (SELECT q.vec_id AS q_vec_id, k.vec_id, SUM(q.d2) AS adc FROM codes k JOIN d2 q ON q.m = k.m AND q.cid = k.cid AND q.vec_id < 20 AND q.vec_id <> k.vec_id GROUP BY 1, 2) SELECT q_vec_id, CAST(rk AS INT) AS rk, vec_id, ROUND(1e-9 + CAST(adc AS DOUBLE), 6) AS adc_d2 FROM (SELECT q_vec_id, vec_id, adc, ROW_NUMBER() OVER (PARTITION BY q_vec_id ORDER BY adc, vec_id) AS rk FROM adc) r WHERE rk <= 5 ORDER BY q_vec_id, rk"""),
  )

  /** Signed-random-projection (hyperplane) LSH candidate pairs (r9,
    * Charikar 2002) — the 100 TB SCALE PATH for embedding near-dup that
    * `dedup_embedding_cosine`'s broadcast verify loop runs per-bucket
    * within: P[sign agrees] = 1 − θ/π, so vectors at high cosine
    * collide on whole 8-bit band keys with high probability while the
    * corpus partitions into ~2^8 buckets per band. Everything is
    * deterministic and engine-portable: the 16 hyperplanes are LCG
    * rationals (a_{j,d} = (1103515245·(64j+d) + 12345) mod 2^31 mapped
    * onto [−1,1) — exact dyadic doubles both engines), each projection
    * is a decimal sum of 6-rounded products (order-free, exact sign),
    * and band keys are integer bit-packs — so the candidate PAIR SET
    * (not just the sims) is oracle-exact. Bands: 2 × 8 bits (tune
    * bands/bits to corpus size in production — more bits per band cuts
    * bucket occupancy geometrically). The verify join evaluates
    * codegen'd vec_dot on candidates only (~2% of the pair space at
    * sf0.1) — the same plan per bucket at any scale, never all-pairs.
    */
  /** The SRP-LSH candidate pair set (a_vec_id < b_vec_id): vectors
    * colliding on at least one of the two 8-bit hyperplane-sign band
    * keys. Deterministic and engine-portable end to end (LCG-rational
    * planes, decimal-summed projections, integer bit-packs), so the set
    * is ORACLE-EXACT — which is what lets every consumer (the pair op,
    * the blocked mutual-kNN graph, the semantic-dedup decision table)
    * stay under the DuckDB hash gate. First-collision emission (the
    * minhashLshPairs discipline): each row carries BOTH band keys flat,
    * the self-join runs on the exploded (band_idx, bkey), and a pair
    * colliding in both bands is emitted only from band 0 — candidates
    * unique BY CONSTRUCTION, no post-join distinct shuffle, and the
    * signature subtree is referenced twice (join sides) instead of four
    * times.
    */
  private[graft] def srpCandidates(s: SparkSession, sf: String): DataFrame =
    srpCandidatesOf(s, normed(s, sf))

  /** [[srpCandidates]] over any (vec_id, embedding, nrm) relation —
    * the corpus-agnostic seam VectorSpec drives with planted near-dup
    * clusters to witness the recall side of the blocking trade.
    */
  private[graft] def srpCandidatesOf(s: SparkSession, v: DataFrame): DataFrame =
    srpCandidatesFromKeys(srpKeysOf(s, v))

  /** The SRP key relation (vec_id, k0, k1) — the expensive half of the
    * candidate build (16 decimal-summed 64-dim projections per vector),
    * split out (r14) so the incremental cluster-maintenance lineage can
    * PERSIST the base corpus's keys and compute only the batch's at
    * append time.
    */
  private[graft] def srpKeysOf(s: SparkSession, v: DataFrame): DataFrame = {
    val e = v.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xf")))
      .select(col("vec_id"), col("d"), col("xf").cast("double").as("x"))
    // Constant relation seeded from range(1) (the pqAdcFixed pattern)
    // — deriving it from an aggregate of the corpus would cost a full
    // discarded scan just to obtain one row.
    val planes = s.range(1)
      .select(explode(sequence(lit(0), lit(15))).as("j"))
      .select(col("j"), explode(sequence(lit(0), lit(63))).as("d"))
      .withColumn("h",
        ((lit(1103515245L) * (col("j") * 64 + col("d")) + lit(12345L)) % lit(2147483648L))
          .cast("double") / lit(1073741824.0) - lit(1.0))
    val dots = e.join(broadcast(planes), "d")
      .groupBy("vec_id", "j")
      .agg(sum(dec(r6(col("h") * col("x")))).as("dot"))
    dots.groupBy("vec_id").agg(
      sum(when(col("j") < 8 && col("dot") >= 0,
        expr("shiftleft(1, cast(j as int))")).otherwise(0)).cast("int").as("k0"),
      sum(when(col("j") >= 8 && col("dot") >= 0,
        expr("shiftleft(1, cast(j - 8 as int))")).otherwise(0)).cast("int").as("k1"))
  }

  /** Band-collision candidates from a key relation (first-collision
    * emission — see [[srpCandidatesOf]]'s doc above).
    */
  private[graft] def srpCandidatesFromKeys(keys: DataFrame): DataFrame = {
    val bands = keys.select(col("vec_id"), col("k0"),
      posexplode(array(col("k0"), col("k1"))).as(Seq("band_idx", "bkey")))
    def side(p: String) = bands.select(col("vec_id").as(s"${p}_vec_id"),
      col("k0").as(s"${p}_k0"), col("band_idx"), col("bkey"))
    side("a").join(side("b"), Seq("band_idx", "bkey"))
      .filter(col("a_vec_id") < col("b_vec_id"))
      .filter(col("band_idx") === 0 || col("a_k0") =!= col("b_k0"))
      .select("a_vec_id", "b_vec_id")
  }

  /** Exact-cosine verification of a (a_vec_id, b_vec_id) candidate
    * relation: join both embedding sides, evaluate the codegen'd dot.
    * Emits the RAW sim (callers round survivors — the r2 lesson).
    */
  private[graft] def cosineOfPairs(s: SparkSession, sf: String, cand: DataFrame): DataFrame =
    cosineOfPairsOf(normed(s, sf), cand)

  private[graft] def cosineOfPairsOf(v: DataFrame, cand: DataFrame): DataFrame = {
    val va = v.select(col("vec_id").as("a_vec_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val vb = v.select(col("vec_id").as("b_vec_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    cand.join(va, "a_vec_id").join(vb, "b_vec_id")
      .withColumn("sim", expr("vec_dot(a_emb, b_emb)") / (col("a_nrm") * col("b_nrm")))
      .drop("a_emb", "a_nrm", "b_emb", "b_nrm")
  }

  private val srpLshPairs = Op(
    "vec_srp_lsh_pairs",
    (s, sf) => Tables.scopedPin(s, s"vec_srp_lsh_pairs@$sf") {
      // Candidate pairs are ~2% of the pair space (blocked) and the
      // verify touches candidates only — batch-bounded shuffles.
      cosineOfPairs(s, sf, srpCandidates(s, sf))
        .select(col("a_vec_id"), col("b_vec_id"), r6(col("sim")).as("cos_sim"))
    }.orderBy("a_vec_id", "b_vec_id"),
    Some("""WITH pl AS (SELECT j, d, ((1103515245 * (j * 64 + d) + 12345) % 2147483648) / 1073741824.0 - 1.0 AS h FROM generate_series(0, 15) t1(j), generate_series(0, 63) t2(d)), e AS (SELECT vec_id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)), dots AS (SELECT e.vec_id, pl.j, SUM(CAST(ROUND(1e-9 + pl.h * e.x, 6) AS DECIMAL(18, 6))) AS dot FROM e JOIN pl ON pl.d = e.d GROUP BY 1, 2), k AS (SELECT vec_id, CAST(SUM(CASE WHEN j < 8 AND dot >= 0 THEN (1 << j) ELSE 0 END) AS INT) AS k0, CAST(SUM(CASE WHEN j >= 8 AND dot >= 0 THEN (1 << (j - 8)) ELSE 0 END) AS INT) AS k1 FROM dots GROUP BY 1), cand AS (SELECT DISTINCT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id FROM k a JOIN k b ON a.vec_id < b.vec_id AND (a.k0 = b.k0 OR a.k1 = b.k1)), v AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm FROM embeddings) SELECT c.a_vec_id, c.b_vec_id, ROUND(1e-9 + list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cos_sim FROM cand c JOIN v a ON a.vec_id = c.a_vec_id JOIN v b ON b.vec_id = c.b_vec_id ORDER BY c.a_vec_id, c.b_vec_id"""),
  )

  /** COMPOSED SEMANTIC-DEDUP DECISION TABLE (r10, SemDeDup-shaped —
    * Abbas et al. 2023's pipeline skeleton) — the one keyed op that runs
    * embedding-space near-dup end to end the way `etl_curation_pipeline`
    * composes the text-side gates: SRP-LSH candidates
    * ([[srpCandidates]], ~2% of the pair space) → exact-cosine verify at
    * the calibrated 0.4 threshold (the `dedup_embedding_cosine`
    * threshold, RAW-sim compare) → connected components over the
    * verified pair graph ([[Clusters.connectedComponents]] — the same
    * min-contraction engine the text-side keep-one table uses) → a
    * keep/drop row per VECTOR with the canonical representative
    * (component min id), cluster size, and the drop reason. At 100 TB
    * every stage is already blocked: candidates are Σ bucket², the
    * verify touches candidates only, CC is the geometric-contraction
    * loop. The candidate set and sims are deterministic
    * integer/decimal arithmetic, so the WHOLE composition — including
    * the cluster assignment — is oracled (recursive-CTE closure over
    * the identically-derived pair graph in DuckDB).
    */
  /** The full-recompute SRP+cosine+closure oracle, shared verbatim by
    * the append key (merged == recompute) and — live-filtered — by the
    * delete key (r15).
    */
  private[graft] val semCcOracleSql: String =
    """WITH RECURSIVE pl AS (SELECT j, d, ((1103515245 * (j * 64 + d) + 12345) % 2147483648) / 1073741824.0 - 1.0 AS h FROM generate_series(0, 15) t1(j), generate_series(0, 63) t2(d)), e AS (SELECT vec_id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)), dots AS (SELECT e.vec_id, pl.j, SUM(CAST(ROUND(1e-9 + pl.h * e.x, 6) AS DECIMAL(18, 6))) AS dot FROM e JOIN pl ON pl.d = e.d GROUP BY 1, 2), k AS (SELECT vec_id, CAST(SUM(CASE WHEN j < 8 AND dot >= 0 THEN (1 << j) ELSE 0 END) AS INT) AS k0, CAST(SUM(CASE WHEN j >= 8 AND dot >= 0 THEN (1 << (j - 8)) ELSE 0 END) AS INT) AS k1 FROM dots GROUP BY 1), cand AS (SELECT DISTINCT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id FROM k a JOIN k b ON a.vec_id < b.vec_id AND (a.k0 = b.k0 OR a.k1 = b.k1)), nv AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm FROM embeddings), vp AS (SELECT c.a_vec_id AS pu, c.b_vec_id AS pv FROM cand c JOIN nv a ON a.vec_id = c.a_vec_id JOIN nv b ON b.vec_id = c.b_vec_id WHERE list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.4), s0 AS (SELECT pu, pv FROM vp UNION ALL SELECT pv, pu FROM vp), reach(n, r) AS (SELECT pu, pu FROM s0 UNION SELECT reach.n, s0.pv FROM reach JOIN s0 ON reach.r = s0.pu), canon AS (SELECT n, MIN(r) AS c FROM reach GROUP BY n), asg AS (SELECT emb.vec_id, COALESCE(canon.c, emb.vec_id) AS canonical_vec_id FROM embeddings emb LEFT JOIN canon ON canon.n = emb.vec_id) SELECT vec_id, canonical_vec_id, COUNT(*) OVER (PARTITION BY canonical_vec_id) AS cluster_size, vec_id = canonical_vec_id AS keep, CASE WHEN vec_id <> canonical_vec_id THEN 'semantic_near_dup' WHEN COUNT(*) OVER (PARTITION BY canonical_vec_id) = 1 THEN 'unique' ELSE 'cluster_canonical' END AS reason FROM asg ORDER BY vec_id"""

  private val semanticClusters = Op(
    "dedup_semantic_clusters",
    (s, sf) => {
      val verified = cosineOfPairs(s, sf, srpCandidates(s, sf))
        .filter(col("sim") >= 0.4)
        .select(col("a_vec_id").as("u"), col("b_vec_id").as("v"))
      val nodes = Tables.embeddings(s, sf).select(col("vec_id").as("node"))
      val cc = Clusters.connectedComponents(nodes, verified, "dedup_semantic_clusters@" + sf)
      cc.select(col("node").as("vec_id"), col("label").as("canonical_vec_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("canonical_vec_id"))))
        .withColumn("keep", col("vec_id") === col("canonical_vec_id"))
        .withColumn("reason",
          when(col("vec_id") =!= col("canonical_vec_id"), "semantic_near_dup")
            .when(col("cluster_size") === 1, "unique")
            .otherwise("cluster_canonical"))
        .orderBy("vec_id")
    },
    Some(semCcOracleSql),
  )

  /** Fingerprint-keyed home of the persisted semantic-cluster
    * assignment (r14) — the component-maintenance dual of the r13
    * index-append lineages.
    */
  private[graft] def semCcDir(s: SparkSession, sf: String): String =
    Tables.cachedDir(
      s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_semcc_app",
      sf.replaceAll("[^a-zA-Z0-9.]", "_"),
      Tables.fingerprint(sf, "embeddings"))

  /** Generation 0: the semantic-cluster assignment over the even-parity
    * base corpus — SRP candidates restricted to the base (band keys
    * depend only on each vector, so base-subset candidates = all-corpus
    * candidates with both sides even), exact-cosine verify at 0.4, CC,
    * persisted once ( _SUCCESS-gated like the index bases).
    */
  private[graft] def semClustersBase(s: SparkSession, sf: String): String = {
    val dir = semCcDir(s, sf)
    if (!(new java.io.File(s"$dir/assign", "_SUCCESS").exists() &&
        new java.io.File(s"$dir/keys", "_SUCCESS").exists())) {
      val even = normed(s, sf).filter(pmod(col("vec_id"), lit(2)) === 0)
      // Persist the base SRP keys alongside the assignment (r14 bench
      // finding): the append must compute projections for the BATCH
      // only — recomputing the base side's 16×64-dim decimal dots each
      // ingest made the "incremental" op cost more than the full
      // recompute at fixture scale.
      srpKeysOf(s, even).write.mode("overwrite").parquet(s"$dir/keys")
      val edges = cosineOfPairsOf(even,
          srpCandidatesFromKeys(s.read.parquet(s"$dir/keys")))
        .filter(col("sim") >= 0.4)
        .select(col("a_vec_id").as("u"), col("b_vec_id").as("v"))
      Clusters.connectedComponents(even.select(col("vec_id").as("node")), edges,
        "semcc_base@" + sf)
        .write.mode("overwrite").parquet(s"$dir/assign")
    }
    dir
  }

  /** INCREMENTAL CLUSTER MAINTENANCE (r14, the r13 verdict's item 3) —
    * the missing incremental dual of the index appends: instead of
    * recomputing components over the full pair graph, the ingest
    * batch's verified edges MERGE into the persisted assignment
    * touching only affected components. Work is O(batch-adjacent):
    *  - new edges = verified pairs with ≥1 odd endpoint (the batch's
    *    own SRP keys; the base side's keys are per-vector hashes — in
    *    production they are served from the persisted vector index
    *    rather than recomputed);
    *  - affected components = base labels incident to a new edge; ONLY
    *    their members re-enter CC, carried as star edges
    *    (member → label), which span exactly the same connectivity the
    *    full even-even edge set did;
    *  - every untouched component's rows pass through VERBATIM from the
    *    persisted assignment — they never see a shuffle, join, or CC
    *    round (SemCcAppendSpec witnesses the row counts).
    * Because labels are component minima and the star edges preserve
    * base connectivity, the merged assignment is IDENTICAL to the full
    * recompute — so the keyed op carries `dedup_semantic_clusters`' own
    * DuckDB oracle, end to end.
    * Returns (untouched, subNodes, mergeEdges, merged) — the spec's
    * bounded-work witness seams.
    */
  private[graft] def semClustersAppendParts(s: SparkSession, sf: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val dir = semClustersBase(s, sf)
    val base = s.read.parquet(s"$dir/assign") // (node, label), even-parity corpus
    val all = normed(s, sf)
    // Batch-only projections: the base keys come from the persisted
    // generation-0 relation; only the odd half pays the 16-projection
    // pass at append time (per-vector hashes, so persisted ∪ fresh =
    // the full-corpus key relation exactly).
    val allKeys = s.read.parquet(s"$dir/keys").unionByName(
      srpKeysOf(s, all.filter(pmod(col("vec_id"), lit(2)) === 1)))
    // NOT pre-pinned (r15): incrementalMerge's label contraction is the
    // single consumer of the verified edges and pins the (far smaller)
    // contracted relation itself, so the SRP + cosine-verify pipeline
    // runs exactly once with no extra full-width materialization.
    val newEdges =
      cosineOfPairsOf(all, srpCandidatesFromKeys(allKeys)
          .filter(pmod(col("a_vec_id"), lit(2)) === 1 ||
            pmod(col("b_vec_id"), lit(2)) === 1))
        .filter(col("sim") >= 0.4)
        .select(col("a_vec_id").as("u"), col("b_vec_id").as("v"))
    val oddNodes = all.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("node"))
    Clusters.incrementalMerge(s, base, newEdges, oddNodes,
      "dedup_semantic_clusters_append@" + sf)
  }

  /** The keyed op: merge the ingest batch into the persisted cluster
    * assignment and emit the same keep/drop decision table as
    * `dedup_semantic_clusters` — which the merged result must equal
    * row-for-row (same oracle; the incremental path is an optimization,
    * not a new semantic).
    */
  private val semanticClustersAppend = Op(
    "dedup_semantic_clusters_append",
    (s, sf) => {
      val (_, _, _, merged) = semClustersAppendParts(s, sf)
      merged.select(col("node").as("vec_id"), col("label").as("canonical_vec_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("canonical_vec_id"))))
        .withColumn("keep", col("vec_id") === col("canonical_vec_id"))
        .withColumn("reason",
          when(col("vec_id") =!= col("canonical_vec_id"), "semantic_near_dup")
            .when(col("cluster_size") === 1, "unique")
            .otherwise("cluster_canonical"))
        .orderBy("vec_id")
    },
    Some(semCcOracleSql),
  )

  /** Generation 0 of the embedding-side DELETE lineage: the FULL-corpus
    * semantic-cluster assignment plus its verified edge relation, one
    * crash-safe staged commit. SRP candidacy and the cosine verify are
    * strictly pairwise, so the live corpus's edges are exactly the
    * persisted set with both endpoints live — the delete never
    * recomputes a projection or a cosine (the text-side rationale at
    * [[Clusters.ccFullBase]]).
    */
  private[graft] def semFullBase(s: SparkSession, sf: String): String = {
    val dir = semCcDir(s, sf)
    Tables.commitStaged(dir, "full") { tmp =>
      cosineOfPairs(s, sf, srpCandidates(s, sf))
        .filter(col("sim") >= 0.4)
        .select(col("a_vec_id").as("u"), col("b_vec_id").as("v"))
        .write.parquet(s"$tmp/edges")
      Clusters.connectedComponents(
          Tables.embeddings(s, sf).select(col("vec_id").as("node")),
          s.read.parquet(s"$tmp/edges"), "semcc_full@" + sf)
        .write.parquet(s"$tmp/assign")
    }
    dir
  }

  /** TOMBSTONE DELETE on the persisted semantic-cluster assignment
    * (r15, the r14 verdict's item 3) — the embedding-side twin of
    * [[Clusters.ccDeleteParts]]: retire a committed vec_id set,
    * re-label only components containing a retired member (CC over the
    * persisted edges restricted to their live members — deletions can
    * split), pass every untouched component through verbatim. Identical
    * to a full recompute over the live corpus, so the key carries the
    * full key's oracle live-filtered.
    */
  private[graft] def semDeleteParts(s: SparkSession, sf: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dir = semFullBase(s, sf)
    Tables.commitStaged(dir, "sem_tombstones") { tmp =>
      Tables.embeddings(s, sf).filter(pmod(col("vec_id"), lit(10)) === 7)
        .select("vec_id").write.parquet(s"$tmp/ids")
    }
    val retired = s.read.parquet(s"$dir/sem_tombstones/ids")
    val assign = s.read.parquet(s"$dir/full/assign")
    val edges = s.read.parquet(s"$dir/full/edges")
    val touchedLabels = graft.ResultPins.swapCheckpoint(
      s"dedup_semantic_clusters_delete:touched@$sf",
      assign.join(retired.select(col("vec_id").as("node")), "node")
        .select("label").distinct())
    val untouched = assign.join(touchedLabels, Seq("label"), "left_anti")
    val liveMembers = assign.join(touchedLabels, Seq("label"))
      .join(retired.select(col("vec_id").as("node")), Seq("node"), "left_anti")
      .select("node")
    val liveEdges = edges
      .join(liveMembers.select(col("node").as("u")), Seq("u"), "left_semi")
      .join(retired.select(col("vec_id").as("v")), Seq("v"), "left_anti")
      .select("u", "v")
    val relabeled = Clusters.connectedComponents(liveMembers, liveEdges,
      "dedup_semantic_clusters_delete@" + sf)
    val merged = relabeled.select("node", "label")
      .union(untouched.select("node", "label"))
    (untouched, liveMembers, merged)
  }

  private val semanticClustersDelete = Op(
    "dedup_semantic_clusters_delete",
    (s, sf) => {
      val (_, _, merged) = semDeleteParts(s, sf)
      merged.select(col("node").as("vec_id"), col("label").as("canonical_vec_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("canonical_vec_id"))))
        .withColumn("keep", col("vec_id") === col("canonical_vec_id"))
        .withColumn("reason",
          when(col("vec_id") =!= col("canonical_vec_id"), "semantic_near_dup")
            .when(col("cluster_size") === 1, "unique")
            .otherwise("cluster_canonical"))
        .orderBy("vec_id")
    },
    Some(Clusters.liveFilteredOracle(semCcOracleSql, "embeddings", "vec_id")),
  )

  /** Top principal component of the embedding corpus (r9) — the
    * whitening / dominant-direction-removal primitive (Mu & Viswanath
    * 2018's all-but-the-top post-processing starts exactly here). The
    * textbook two-level distributed PCA: the corpus-scale pass is ONE
    * mapPartitions accumulating per-partition moments — count, sum
    * vector, and the d(d+1)/2 upper-triangular Gram — so the shuffle
    * carries P × O(d²) doubles, never the vectors; the driver combines
    * the partials (dimension-bounded, the legitimate-collect class:
    * O(partitions · d²) regardless of corpus size), forms the
    * covariance C = E[xxᵀ] − μμᵀ, and runs 100 deterministic power
    * iterations from the fixed 1/√d start. Sign is canonicalized (the
    * largest-|loading| coordinate is made positive) so the component is
    * unique. No oracle — an iterative eigensolver isn't one portable
    * SQL statement; PcaSpec asserts the eigenpair residual
    * ‖Cv − λv‖ ≤ 1e-9·λ, unit norm, the Rayleigh-dominance property
    * against random probes, and determinism.
    */
  private val pcaTopComponent = Op(
    "vec_pca_top_component",
    (s, sf) => {
      import s.implicits._
      val d = 64
      val vecs = Tables.spread(s, Tables.embeddings(s, sf))
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val partials = vecs.mapPartitions { it =>
        val sumv = new Array[Double](d)
        val gram = new Array[Double](d * (d + 1) / 2)
        var n = 0L
        it.foreach { case (_, e) =>
          n += 1
          var i = 0
          while (i < d) {
            val xi = e(i).toDouble
            sumv(i) += xi
            val base = i * (i + 1) / 2
            var j = 0
            while (j <= i) { gram(base + j) += xi * e(j); j += 1 }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty else Iterator((n, sumv, gram))
      }.collect() // P rows × O(d²) — partition-count bounded, not corpus
      val n = partials.map(_._1).sum.toDouble
      val mu = new Array[Double](d)
      val cov = Array.ofDim[Double](d, d)
      partials.foreach { case (_, sv, _) => (0 until d).foreach(i => mu(i) += sv(i)) }
      (0 until d).foreach(i => mu(i) /= n)
      partials.foreach { case (_, _, g) =>
        var i = 0
        while (i < d) {
          var j = 0
          while (j <= i) { cov(i)(j) += g(i * (i + 1) / 2 + j); j += 1 }
          i += 1
        }
      }
      var i = 0
      while (i < d) {
        var j = 0
        while (j <= i) {
          val c = cov(i)(j) / n - mu(i) * mu(j)
          cov(i)(j) = c; cov(j)(i) = c
          j += 1
        }
        i += 1
      }
      var v = Array.fill(d)(1.0 / math.sqrt(d))
      var lambda = 0.0
      (1 to 100).foreach { _ =>
        val av = Array.tabulate(d)(r => (0 until d).map(c => cov(r)(c) * v(c)).sum)
        val nrm = math.sqrt(av.map(x => x * x).sum)
        v = av.map(_ / nrm)
        lambda = nrm
      }
      val flip = if (v.maxBy(math.abs) < 0) -1.0 else 1.0
      val trace = (0 until d).map(k => cov(k)(k)).sum
      val rows = (0 until d).map { k =>
        (k, math.rint((flip * v(k)) * 1e6) / 1e6,
          math.rint(lambda * 1e6) / 1e6, math.rint(lambda / trace * 1e6) / 1e6)
      }
      rows.toDF("dim", "loading", "eigenvalue", "var_share").orderBy("dim")
    },
    None,
  )

  /** Driver-side covariance/eigenpair replica for PcaSpec (same moments,
    * brute force over a collected corpus — spec-only scale).
    */
  private[graft] def covarianceOf(vectors: Seq[Array[Float]]): Array[Array[Double]] = {
    val d = vectors.head.length
    val n = vectors.size.toDouble
    val mu = new Array[Double](d)
    vectors.foreach(e => (0 until d).foreach(i => mu(i) += e(i)))
    (0 until d).foreach(i => mu(i) /= n)
    Array.tabulate(d, d) { (i, j) =>
      vectors.map(e => e(i).toDouble * e(j)).sum / n - mu(i) * mu(j)
    }
  }

  /** MUTUAL k-NN GRAPH construction (r9c; LSH-BLOCKED r10 — the r9
    * verdict #5 scale fix) — the edge list semantic-dedup clustering and
    * manifold methods (UMAP-style) start from: an edge (u, v) exists iff
    * v is in u's top-5 cosine neighbors AND u is in v's. Mutuality is
    * the standard noise filter — a hub vector appears in thousands of
    * top-k lists, but keeps only the neighbors it reciprocates, so the
    * graph's degree is ≤ k everywhere and CC over it yields tight
    * semantic clusters rather than hub-collapsed blobs.
    *
    * r9 ranked every vector against a broadcast of the ENTIRE corpus —
    * the canonical all-pairs scale-killer. Now the neighbor pool per
    * vector is its [[srpCandidates]] SRP-LSH collision set (~2% of the
    * pair space at sf0.1): candidates symmetrize (u's pool must see v
    * whenever v's sees u), the codegen'd dot evaluates on candidates
    * only, the bounded-heap [[graft.functions.VecTopK]] partial-
    * aggregates top-5 per vector, and one self-equi-join on the
    * reversed pair applies mutuality — work is Σ bucket², never n².
    * The candidate set is oracle-exact (deterministic LCG hyperplanes +
    * decimal sign arithmetic), so the WHOLE blocked graph stays under
    * the DuckDB hash gate — the approximation vs the exact graph is
    * therefore engine-identical and measured, not vibes: VectorSpec
    * pins recall of the blocked edges against the brute-force mutual
    * graph. [[cosineTopk]] remains the deliberate exact-tier dual
    * (query-set-sized, never corpus×corpus at scale).
    */
  /** The blocked mutual-kNN pipeline over any (vec_id, embedding, nrm)
    * relation: SRP candidates → symmetrize → exact cosine on candidates
    * only → bounded-heap top-k per vector → mutuality self-join.
    */
  private[graft] def blockedMutualKnn(s: SparkSession, v: DataFrame, k: Int = 5): DataFrame = {
    FloatVecDot.register(s)
    graft.functions.VecTopK.register(s)
    val cand = srpCandidatesOf(s, v)
    // Symmetrize: each undirected candidate pair feeds BOTH endpoint
    // pools. cos(u,v) ≡ cos(v,u) exactly (identical fold order), so
    // computing the dot once per direction costs one extra codegen
    // pass but no parity risk; the relation stays O(candidates).
    val directed = cand.union(cand.select(
      col("b_vec_id").as("a_vec_id"), col("a_vec_id").as("b_vec_id")))
    val top = topkSelect(cosineOfPairsOf(v, directed), k)
    top.as("x").join(top.as("y"),
        col("y.a_vec_id") === col("x.b_vec_id") &&
          col("y.b_vec_id") === col("x.a_vec_id"))
      .filter(col("x.a_vec_id") < col("x.b_vec_id"))
      .select(col("x.a_vec_id").as("u"), col("x.b_vec_id").as("v"),
        col("x.cos_sim").as("cos_sim"),
        col("x.rk").as("rk_uv"), col("y.rk").as("rk_vu"))
      .orderBy("u", "v")
  }

  private val knnGraph = Op(
    "vec_knn_graph",
    (s, sf) => blockedMutualKnn(s, normed(s, sf)),
    Some("""WITH pl AS (SELECT j, d, ((1103515245 * (j * 64 + d) + 12345) % 2147483648) / 1073741824.0 - 1.0 AS h FROM generate_series(0, 15) t1(j), generate_series(0, 63) t2(d)), e AS (SELECT vec_id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)), dots AS (SELECT e.vec_id, pl.j, SUM(CAST(ROUND(1e-9 + pl.h * e.x, 6) AS DECIMAL(18, 6))) AS dot FROM e JOIN pl ON pl.d = e.d GROUP BY 1, 2), k AS (SELECT vec_id, CAST(SUM(CASE WHEN j < 8 AND dot >= 0 THEN (1 << j) ELSE 0 END) AS INT) AS k0, CAST(SUM(CASE WHEN j >= 8 AND dot >= 0 THEN (1 << (j - 8)) ELSE 0 END) AS INT) AS k1 FROM dots GROUP BY 1), cand AS (SELECT DISTINCT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id FROM k a JOIN k b ON a.vec_id <> b.vec_id AND (a.k0 = b.k0 OR a.k1 = b.k1)), v AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm FROM embeddings), p AS (SELECT c.a_vec_id, c.b_vec_id, list_reduce(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (a.nrm * b.nrm) AS sim FROM cand c JOIN v a ON a.vec_id = c.a_vec_id JOIN v b ON b.vec_id = c.b_vec_id), t AS (SELECT a_vec_id, b_vec_id, sim, CAST(ROW_NUMBER() OVER (PARTITION BY a_vec_id ORDER BY sim DESC, b_vec_id) AS INT) AS rk FROM p QUALIFY rk <= 5) SELECT x.a_vec_id AS u, x.b_vec_id AS v, ROUND(1e-9 + x.sim, 6) AS cos_sim, x.rk AS rk_uv, y.rk AS rk_vu FROM t x JOIN t y ON y.a_vec_id = x.b_vec_id AND y.b_vec_id = x.a_vec_id WHERE x.a_vec_id < x.b_vec_id ORDER BY u, v"""),
  )

  /** Inter-label centroid distance matrix (r9d) — pairwise cosine and
    * Euclidean distance between the per-label mean vectors: the
    * class-separability report read before trusting labels for
    * stratification or a centroid-seeded quantizer (two labels at
    * cosine ≈ 1 should merge; a label far from all others is a
    * candidate outlier class). Everything runs in the EXPLODED
    * (label, pos, value) domain — the same shape
    * [[centroidPerLabel]] emits — so the shuffle carries labels·d
    * rows, never vectors, and the pairwise stage is an equi-join on
    * pos over the labels·d relation (output labels²/2 — dimension-
    * bounded at any corpus scale; the corpus-sized pass is the one
    * centroid agg). Parity: pairwise math consumes the ROUNDED
    * centroid values (both engines see identical doubles), products
    * and squares rounded then decimal-summed (rulebook §7.3).
    */
  private val centroidDistances = Op(
    "vec_centroid_distances",
    (s, sf) => {
      val cent = Tables.embeddings(s, sf)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(r6(sum(dec(col("v").cast("double"))).cast("double") / count(lit(1))).as("c"))
      val nrm2 = cent.groupBy("label")
        .agg(sum(dec(r6(col("c") * col("c")))).as("n2"))
      val dot = cent.as("a")
        .join(cent.as("b"), col("a.pos") === col("b.pos") &&
          col("a.label") < col("b.label"))
        .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
          r6(col("a.c") * col("b.c")).as("p"))
        .groupBy("label_a", "label_b")
        .agg(sum(dec(col("p"))).as("dot"))
      dot
        .join(nrm2.select(col("label").as("label_a"), col("n2").as("na")), "label_a")
        .join(nrm2.select(col("label").as("label_b"), col("n2").as("nb")), "label_b")
        .select(col("label_a"), col("label_b"),
          r6(col("dot").cast("double") /
            sqrt(col("na").cast("double") * col("nb").cast("double"))).as("cos_sim"),
          r6(sqrt(greatest(lit(0.0), col("na").cast("double") + col("nb").cast("double")
            - lit(2.0) * col("dot").cast("double")))).as("euclid_dist"))
        .orderBy("label_a", "label_b")
    },
    Some("""WITH cent AS (SELECT label, pos, ROUND(1e-9 + CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS c FROM (SELECT label, unnest(generate_series(1, len(embedding))) - 1 AS pos, unnest(embedding) AS v FROM embeddings) t GROUP BY label, pos), n2 AS (SELECT label, SUM(CAST(ROUND(1e-9 + c * c, 6) AS DECIMAL(18,6))) AS n2 FROM cent GROUP BY label), d AS (SELECT a.label AS label_a, b.label AS label_b, SUM(CAST(ROUND(1e-9 + a.c * b.c, 6) AS DECIMAL(18,6))) AS dot FROM cent a JOIN cent b ON b.pos = a.pos AND a.label < b.label GROUP BY 1, 2) SELECT d.label_a, d.label_b, ROUND(1e-9 + CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cos_sim, ROUND(1e-9 + sqrt(GREATEST(0.0, CAST(na.n2 AS DOUBLE) + CAST(nb.n2 AS DOUBLE) - 2.0 * CAST(dot AS DOUBLE))), 6) AS euclid_dist FROM d JOIN n2 na ON na.label = d.label_a JOIN n2 nb ON nb.label = d.label_b ORDER BY label_a, label_b"""),
  )

  /** Maximum-inner-product top-k (r10): the retrieval primitive for
    * UN-normalized scores (recommendation / reward-model logits —
    * cosine's norm division deliberately absent), 20 query vectors
    * against the corpus. THE linear 100 TB retrieval shape — the
    * transpose of vec_cosine_topk's all-pairs contract: the SMALL side
    * (queries) broadcasts, the corpus streams once through codegen'd
    * [[FloatVecDot]], and the bounded-heap vec_topk partial-aggregate
    * means the shuffle carries ≤ k entries per (query × partition),
    * never the q·n score rows. Ties break id-ascending (the heap's
    * discipline), matching the oracle's ROW_NUMBER order.
    */
  private val mipsTopk = Op(
    "vec_mips_topk",
    (s, sf) => {
      val v = normed(s, sf)
      val q = v.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
      v.join(broadcast(q), col("vec_id") =!= col("q_vec_id"))
        .withColumn("ip", expr("vec_dot(q_emb, embedding)"))
        .groupBy(col("q_vec_id"))
        .agg(expr("vec_topk(vec_id, ip, 5)").as("top"))
        .select(col("q_vec_id"), posexplode(col("top")).as(Seq("pos", "entry")))
        .select(col("q_vec_id"), (col("pos") + 1).cast("int").as("rk"),
          col("entry.id").as("vec_id"), r6(col("entry.sim")).as("ip"))
        .orderBy("q_vec_id", "rk")
    },
    Some("""WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20), p AS (SELECT q.q_vec_id, v.vec_id, list_reduce(list_transform(generate_series(1, len(q.q_emb)), i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS ip FROM q JOIN embeddings v ON v.vec_id <> q.q_vec_id) SELECT q_vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY q_vec_id ORDER BY ip DESC, vec_id) AS INT) AS rk, vec_id, ROUND(1e-9 + ip, 6) AS ip FROM p QUALIFY rk <= 5 ORDER BY q_vec_id, rk"""),
  )

  /** Sign-bit (1-bit) quantized Hamming retrieval (r10): the most
    * aggressive member of the quantization ladder (float32 →
    * [[quantizeInt8]] int8 → PQ codes → THIS, 1 bit/dim): each vector
    * binarizes to its 64 coordinate signs packed into two 32-bit
    * words, and retrieval is bit_count(a XOR b) — 8 bytes per vector, popcount
    * per comparison, the cheapest possible rerank prefilter at 100 TB
    * (and the asymmetric-free cousin of the SRP band keys, which are
    * signs of PROJECTIONS; these are signs of coordinates, zero
    * arithmetic, so the whole pipeline is integer-exact and fully
    * oracled). Top-5 per query via the bounded-heap vec_topk on the
    * negated distance — shuffle ≤ k per (query × partition).
    */
  private val signHammingTopk = Op(
    "vec_sign_hamming_topk",
    (s, sf) => {
      graft.functions.VecTopK.register(s)
      // Two 32-bit halves, not one 64-bit word: bit 63 of a signed long
      // is unrepresentable as a left-shift in engines that check
      // overflow (DuckDB errors on 1 << 63) - the simhash op's
      // stay-inside-the-sign-bit lesson, solved here by splitting.
      val sig = Tables.spread(s, Tables.embeddings(s, sf))
        .withColumn("sig0", expr(
          """aggregate(sequence(0, 31), 0L,
               (acc, i) -> acc | CASE WHEN element_at(embedding, cast(i + 1 as int)) >= 0
                                 THEN shiftleft(1L, cast(i as int)) ELSE 0L END)"""))
        .withColumn("sig1", expr(
          """aggregate(sequence(32, 63), 0L,
               (acc, i) -> acc | CASE WHEN element_at(embedding, cast(i + 1 as int)) >= 0
                                 THEN shiftleft(1L, cast(i - 32 as int)) ELSE 0L END)"""))
        .select(col("vec_id"), col("sig0"), col("sig1"))
      val q = sig.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_vec_id"),
          col("sig0").as("q_sig0"), col("sig1").as("q_sig1"))
      sig.join(broadcast(q), col("vec_id") =!= col("q_vec_id"))
        .withColumn("nham",
          -(expr("bit_count(sig0 ^ q_sig0)") + expr("bit_count(sig1 ^ q_sig1)")).cast("double"))
        .groupBy(col("q_vec_id"))
        .agg(expr("vec_topk(vec_id, nham, 5)").as("top"))
        .select(col("q_vec_id"), posexplode(col("top")).as(Seq("pos", "entry")))
        .select(col("q_vec_id"), (col("pos") + 1).cast("int").as("rk"),
          col("entry.id").as("vec_id"), (-col("entry.sim")).cast("int").as("hamming"))
        .orderBy("q_vec_id", "rk")
    },
    Some("""WITH sig AS (SELECT vec_id, list_reduce(list_transform(generate_series(0, 31), i -> CASE WHEN embedding[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END), (a, b) -> a | b) AS sig0, list_reduce(list_transform(generate_series(32, 63), i -> CASE WHEN embedding[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE CAST(0 AS BIGINT) END), (a, b) -> a | b) AS sig1 FROM embeddings), q AS (SELECT vec_id AS q_vec_id, sig0 AS q_sig0, sig1 AS q_sig1 FROM sig WHERE vec_id < 20), p AS (SELECT q.q_vec_id, s.vec_id, CAST(bit_count(xor(s.sig0, q.q_sig0)) + bit_count(xor(s.sig1, q.q_sig1)) AS INT) AS hamming FROM q JOIN sig s ON s.vec_id <> q.q_vec_id) SELECT q_vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY q_vec_id ORDER BY hamming ASC, vec_id) AS INT) AS rk, vec_id, hamming FROM p QUALIFY rk <= 5 ORDER BY q_vec_id, rk"""),
  )

  /** Johnson-Lindenstrauss sign projection (r10b, Achlioptas 2003's
    * ±1 database-friendly variant): 64 → 16 dims through a DETERMINISTIC
    * ±1 matrix keyed off md5(dim, j) — no stored projection artifact,
    * any executor regenerates any matrix entry locally, which is exactly
    * why the sign construction (not Gaussian) is the one you run at
    * 100 TB. y_j = Σ_i s_ij·x_i / √16 with r6'd per-term doubles
    * decimal-summed (order-free). Plan shape: the 1024-row sign matrix
    * broadcasts; the exploded (vec_id, dim, x) relation joins it and
    * map-side combines into (vec_id, j) partials — shuffle carries
    * 16 rows per vector, never the 16× intermediate.
    */
  private val jlProjection = Op(
    "vec_jl_projection",
    (s, sf) => {
      val sgn = s.range(64).select(col("id").cast("int").as("dim"))
        .crossJoin(s.range(16).select(col("id").cast("int").as("j")))
        .withColumn("sgn",
          when(conv(substring(md5(concat_ws("_", col("dim"), col("j"))), 1, 7),
            16, 10).cast("long") % 2 === 0, 1).otherwise(-1))
      val e = Tables.embeddings(s, sf)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
      e.join(broadcast(sgn), "dim")
        .groupBy("vec_id", "j")
        .agg(sum(dec(r6(col("sgn") * col("x")))).as("acc"))
        .select(col("vec_id"), col("j"),
          r6(col("acc").cast("double") / lit(4.0)).as("y"))
        .orderBy("vec_id", "j")
    },
    Some("""WITH sgn AS (SELECT dim, j, CASE WHEN CAST(concat('0x', substr(md5(CAST(dim AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 7)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM (SELECT unnest(generate_series(0, 63)) AS dim) a, (SELECT unnest(generate_series(0, 15)) AS j) b), e AS (SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)) SELECT vec_id, j, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + sgn * x, 6) AS DECIMAL(18,6))) AS DOUBLE) / 4.0, 6) AS y FROM e JOIN sgn ON sgn.dim = e.dim GROUP BY vec_id, j ORDER BY vec_id, j"""),
  )

  /** Deterministic fixed-iteration Lloyd k-means (r10b): K = 4 clusters,
    * init = the 4 lowest vec_ids, exactly TWO update rounds then a final
    * assignment — the training-loop shape of the IVF coarse quantizer
    * ([[annIvf]] consumes a trained model; this key IS two steps of that
    * training as an oracled dataflow). Every distance is a decimal sum
    * of r6'd per-dim squared gaps (order-free, so the argmin with cid
    * tiebreak is exact on both engines) and every centroid coordinate is
    * an r6'd decimal-mean — the whole loop stays under the hash gate
    * with no float-accumulation drift. Plan shape per round: centroids
    * (≤ 256 rows) BROADCAST onto the exploded vectors, distances
    * map-side combine into (vec, cid) partials, assignment is one
    * bounded 4-row-per-vector window — a genuine Lloyd round is two
    * broadcast joins + two hash-aggs, no collect. An emptied cluster
    * simply drops out of the centroid relation (standard Lloyd decay),
    * identically on both engines.
    */
  private val kmeansFixed = Op(
    "vec_kmeans_fixed",
    // NOT conf-scoped (r15): an 8-partition/AQE-off scope was tried and
    // measured SLOWER (2.94 vs 2.68 s) — the cost here is the genuine
    // 512k-row distance aggregations each Lloyd round, which want the
    // session's full fan-out; the job floor is already amortized by the
    // pinned exploded relation.
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      // The exploded (vec_id, dim, x) relation feeds SEVEN downstream
      // passes (3 assignment joins, 2 centroid updates, sizes, init);
      // pin it once for the op's lifetime and release after the 4-row
      // result is materialized (the clusterCc hygiene) — recomputing
      // the scan+explode per pass was the whole-op bottleneck (5.9 s →
      // the dominant term drops to the genuine per-round agg work).
      val eRaw = Tables.spread(s, Tables.embeddings(s, sf))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
      val eRdd = eRaw.rdd
      eRdd.persist(); eRdd.count(): Unit
      val e = s.createDataFrame(eRdd, eRaw.schema)
      def distances(cent: DataFrame): DataFrame =
        e.join(broadcast(cent), "dim")
          .groupBy(col("vec_id"), col("cid"))
          .agg(sum(dec(r6((col("x") - col("c")) * (col("x") - col("c"))))).as("dist"))
      def assign(cent: DataFrame): DataFrame =
        distances(cent).withColumn("rk", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
          .filter(col("rk") === 1)
      var cent = e.filter(col("vec_id") < 4)
        .select(col("vec_id").cast("int").as("cid"), col("dim"), col("x").as("c"))
      for (_ <- 1 to 2) {
        cent = e.join(assign(cent).select("vec_id", "cid"), "vec_id")
          .groupBy("cid", "dim")
          .agg(r6(sum(dec(r6(col("x")))).cast("double") / count(lit(1))).as("c"))
      }
      val fin = assign(cent)
      val sizes = fin.groupBy("cid")
        .agg(count(lit(1)).as("n_assigned"),
          sum(dec(col("dist"))).cast("double").as("inertia_raw"))
      val checks = cent.groupBy("cid")
        .agg(sum(dec(col("c"))).cast("double").as("ck"))
      val out = sizes.join(checks, "cid")
        .select(col("cid"), col("n_assigned"), r6(col("inertia_raw")).as("inertia"),
          r6(col("ck")).as("centroid_checksum"))
      // Materialize the 4-row result off the pinned lineage, then free it.
      val outRdd = out.rdd
      outRdd.persist(); outRdd.count(): Unit
      eRdd.unpersist(false)
      s.createDataFrame(outRdd, out.schema).orderBy("cid")
    },
    Some("""WITH e AS (SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)), c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, x AS c FROM e WHERE vec_id < 4), d1 AS (SELECT e.vec_id, c0.cid, SUM(CAST(ROUND(1e-9 + (e.x - c0.c) * (e.x - c0.c), 6) AS DECIMAL(18,6))) AS dist FROM e JOIN c0 ON c0.dim = e.dim GROUP BY 1, 2), a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d1) z WHERE rk = 1), c1 AS (SELECT a1.cid, e.dim, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + e.x, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS c FROM e JOIN a1 ON a1.vec_id = e.vec_id GROUP BY 1, 2), d2 AS (SELECT e.vec_id, c1.cid, SUM(CAST(ROUND(1e-9 + (e.x - c1.c) * (e.x - c1.c), 6) AS DECIMAL(18,6))) AS dist FROM e JOIN c1 ON c1.dim = e.dim GROUP BY 1, 2), a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d2) z WHERE rk = 1), c2 AS (SELECT a2.cid, e.dim, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + e.x, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS c FROM e JOIN a2 ON a2.vec_id = e.vec_id GROUP BY 1, 2), df AS (SELECT e.vec_id, c2.cid, SUM(CAST(ROUND(1e-9 + (e.x - c2.c) * (e.x - c2.c), 6) AS DECIMAL(18,6))) AS dist FROM e JOIN c2 ON c2.dim = e.dim GROUP BY 1, 2), af AS (SELECT vec_id, cid, dist FROM (SELECT vec_id, cid, dist, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM df) z WHERE rk = 1), sizes AS (SELECT cid, COUNT(*) AS n_assigned, CAST(SUM(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS inertia_raw FROM af GROUP BY 1), checks AS (SELECT cid, CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS ck FROM c2 GROUP BY 1) SELECT sizes.cid AS cid, n_assigned, ROUND(1e-9 + inertia_raw, 6) AS inertia, ROUND(1e-9 + ck, 6) AS centroid_checksum FROM sizes JOIN checks ON checks.cid = sizes.cid ORDER BY cid"""),
  )

  /** RECALL@10 of 1-bit sign-Hamming retrieval vs exact cosine (r11) —
    * the EVALUATION op the quantization ladder was missing: every ANN
    * deployment reports recall against the exact tier before shipping,
    * and this runs that measurement as one query (per-query overlap of
    * the two top-10 sets + the corpus mean). Both retrieval arms are
    * integer-or-rounded-exact and already individually oracled
    * (vec_cosine_topk / vec_sign_hamming_topk semantics), so the recall
    * itself hashes cross-engine — a rare fully-ORACLED ANN quality
    * metric (trained-index recall stays spec-gated in VectorSpec; this
    * key pins the training-free arm). Scale shape: queries are a
    * bounded set (broadcast), each arm is the corpus×queries retrieval
    * with bounded-heap partial top-k, and the overlap join is
    * query-key-partitioned — nothing quadratic in the corpus.
    */
  private val recallSignVsExact = Op(
    "vec_recall_sign_vs_exact",
    (s, sf) => {
      val k = 10
      val v = normed(s, sf)
      val q = v.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      // Exact arm: cosine top-10 (raw-sim ranking, vec_id tiebreak).
      val exact = v.join(broadcast(q), col("vec_id") =!= col("q_vec_id"))
        .withColumn("sim", expr("vec_dot(q_emb, embedding)") / (col("q_nrm") * col("nrm")))
        .groupBy(col("q_vec_id"))
        .agg(expr(s"vec_topk(vec_id, sim, $k)").as("top"))
        .select(col("q_vec_id"), explode(col("top.id")).as("vec_id"))
      // Approximate arm: coordinate-sign Hamming top-10 (the
      // vec_sign_hamming_topk signature, negated distance in the heap,
      // vec_id tiebreak — identical to its oracled convention).
      val sig = Tables.spread(s, Tables.embeddings(s, sf))
        .withColumn("sig0", expr(
          """aggregate(sequence(0, 31), 0L,
               (acc, i) -> acc | CASE WHEN element_at(embedding, cast(i + 1 as int)) >= 0
                                 THEN shiftleft(1L, cast(i as int)) ELSE 0L END)"""))
        .withColumn("sig1", expr(
          """aggregate(sequence(32, 63), 0L,
               (acc, i) -> acc | CASE WHEN element_at(embedding, cast(i + 1 as int)) >= 0
                                 THEN shiftleft(1L, cast(i - 32 as int)) ELSE 0L END)"""))
        .select(col("vec_id"), col("sig0"), col("sig1"))
      val qs = sig.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_vec_id"),
          col("sig0").as("q_sig0"), col("sig1").as("q_sig1"))
      val approx = sig.join(broadcast(qs), col("vec_id") =!= col("q_vec_id"))
        .withColumn("nham",
          -(expr("bit_count(sig0 ^ q_sig0)") + expr("bit_count(sig1 ^ q_sig1)")).cast("double"))
        .groupBy(col("q_vec_id"))
        .agg(expr(s"vec_topk(vec_id, nham, $k)").as("top"))
        .select(col("q_vec_id"), explode(col("top.id")).as("vec_id"))
      exact.join(approx, Seq("q_vec_id", "vec_id"), "left_semi")
        .groupBy("q_vec_id").agg(count(lit(1)).as("n_overlap"))
        // Queries whose sets are disjoint still report (recall 0).
        .join(q.select("q_vec_id"), Seq("q_vec_id"), "right")
        .select(col("q_vec_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          r6(coalesce(col("n_overlap"), lit(0L)).cast("double") / k).as("recall_at_10"))
        .orderBy("q_vec_id")
    },
    Some("""WITH v AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)) AS nrm FROM embeddings), q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb, nrm AS q_nrm FROM v WHERE vec_id < 20), ex AS (SELECT q_vec_id, vec_id FROM (SELECT q.q_vec_id, v.vec_id, ROW_NUMBER() OVER (PARTITION BY q.q_vec_id ORDER BY list_reduce(list_transform(generate_series(1, len(q.q_emb)), i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)), (x, y) -> x + y) / (q.q_nrm * v.nrm) DESC, v.vec_id) AS rk FROM q JOIN v ON v.vec_id <> q.q_vec_id) z WHERE rk <= 10), sig AS (SELECT vec_id, list_reduce(list_transform(generate_series(0, 31), i -> CASE WHEN embedding[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END), (a, b) -> a | b) AS sig0, list_reduce(list_transform(generate_series(32, 63), i -> CASE WHEN embedding[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE CAST(0 AS BIGINT) END), (a, b) -> a | b) AS sig1 FROM embeddings), qs AS (SELECT vec_id AS q_vec_id, sig0 AS q_sig0, sig1 AS q_sig1 FROM sig WHERE vec_id < 20), ap AS (SELECT q_vec_id, vec_id FROM (SELECT qs.q_vec_id, s.vec_id, ROW_NUMBER() OVER (PARTITION BY qs.q_vec_id ORDER BY bit_count(xor(s.sig0, qs.q_sig0)) + bit_count(xor(s.sig1, qs.q_sig1)) ASC, s.vec_id) AS rk FROM qs JOIN sig s ON s.vec_id <> qs.q_vec_id) z WHERE rk <= 10), ov AS (SELECT ex.q_vec_id, COUNT(*) AS n_overlap FROM ex JOIN ap ON ap.q_vec_id = ex.q_vec_id AND ap.vec_id = ex.vec_id GROUP BY 1) SELECT q.q_vec_id AS q_vec_id, COALESCE(ov.n_overlap, 0) AS n_overlap, ROUND(1e-9 + COALESCE(ov.n_overlap, 0) / 10.0, 6) AS recall_at_10 FROM q LEFT JOIN ov ON ov.q_vec_id = q.q_vec_id ORDER BY q.q_vec_id"""),
  )

  /** EMBEDDING HEALTH AUDIT (r11) — the data-quality gate an embedding
    * pipeline runs before indexing: NaN/overflow elements (a broken
    * encoder emits them in bursts), zero-norm vectors (dead inputs —
    * they NaN every cosine downstream), and the norm distribution
    * (collapsed norms = encoder regression; un-normalized mix = two
    * model versions in one corpus). Norms round to 3 decimals for the
    * quartile pick so the rank window runs over a DOMAIN-bounded value
    * relation (norms live in a few units' range), never n rows — the
    * daily-percentile-bands discipline. Nonfinite = isnan OR |x| > 1e38
    * (the float-overflow proxy both engines evaluate identically).
    */
  private val normAudit = Op(
    "vec_norm_audit",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      FloatVecDot.register(s)
      val v = Tables.spread(s, Tables.embeddings(s, sf))
        .withColumn("bad", expr(
          "exists(embedding, x -> isnan(x) OR abs(x) > cast(1e38 as float))"))
        .withColumn("nrm", when(col("bad"), lit(null))
          .otherwise(sqrt(expr("vec_dot(embedding, embedding)"))))
        .withColumn("nrm3", round(col("nrm") + lit(1e-9), 3))
      val cells = v.filter(!col("bad")).groupBy("nrm3").agg(count(lit(1)).as("cnt"))
      val wc = Window.orderBy("nrm3")
      val ranked = cells
        .withColumn("cum", sum("cnt").over(wc))
        .withColumn("tot", sum("cnt").over(Window.partitionBy()))
      def q(num: Int, den: Int) = ranked.filter(col("cum") * den >= col("tot") * num)
        .agg(min("nrm3").as(s"p$num$den"))
      val quart = q(1, 4).crossJoin(q(1, 2)).crossJoin(q(3, 4))
        .select(col("p14").as("p25"), col("p12").as("p50"), col("p34").as("p75"))
      v.agg(
          count(lit(1)).as("n_vectors"),
          sum(col("bad").cast("long")).as("n_nonfinite"),
          sum((!col("bad") && col("nrm") < 1e-12).cast("long")).as("n_zero_norm"),
          r6(min(col("nrm"))).as("min_norm"),
          r6(max(col("nrm"))).as("max_norm"),
          r6(sum(dec(r6(col("nrm")))).cast("double") /
            sum((!col("bad")).cast("long"))).as("mean_norm"))
        .crossJoin(broadcast(quart))
    },
    Some("""WITH v AS (SELECT list_bool_or(list_transform(embedding, x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) > 1e38)) AS bad, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm0 FROM embeddings), w AS (SELECT bad, CASE WHEN bad THEN NULL ELSE nrm0 END AS nrm, CASE WHEN bad THEN NULL ELSE ROUND(1e-9 + nrm0, 3) END AS nrm3 FROM v), cells AS (SELECT nrm3, COUNT(*) AS cnt FROM w WHERE NOT bad GROUP BY 1), rk AS (SELECT nrm3, SUM(cnt) OVER (ORDER BY nrm3 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, SUM(cnt) OVER () AS tot FROM cells), quart AS (SELECT (SELECT MIN(nrm3) FROM rk WHERE cum * 4 >= tot) AS p25, (SELECT MIN(nrm3) FROM rk WHERE cum * 2 >= tot) AS p50, (SELECT MIN(nrm3) FROM rk WHERE cum * 4 >= tot * 3) AS p75), agg AS (SELECT COUNT(*) AS n_vectors, CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite, CAST(SUM(CASE WHEN NOT bad AND nrm < 1e-12 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm, ROUND(1e-9 + MIN(nrm), 6) AS min_norm, ROUND(1e-9 + MAX(nrm), 6) AS max_norm, ROUND(1e-9 + CAST(SUM(CAST(ROUND(1e-9 + nrm, 6) AS DECIMAL(18,6))) AS DOUBLE) / SUM(CASE WHEN NOT bad THEN 1 ELSE 0 END), 6) AS mean_norm FROM w) SELECT agg.*, quart.* FROM agg, quart"""),
  )

  /** EXACT-duplicate embeddings (r11) — the exact tier of the vector
    * dedup ladder (cosine near-dup and SemDeDup are the approximate
    * members; this one catches byte-identical re-encodings of repeated
    * inputs, the most common corpus pathology). Each vector collapses
    * to md5 over its 6-decimal canonical rendering (the
    * etl_table_fingerprint discipline — fixed decimal strings dodge
    * engine float-formatting skew), one hash-agg groups, min vec_id is
    * canonical — the dedup_exact_hash semantics on the embeddings
    * table, linear at any scale.
    */
  private val dupExact = Op(
    "vec_dup_exact",
    (s, sf) => {
      val hashed = Tables.embeddings(s, sf)
        .withColumn("vhash", md5(concat_ws(",", expr(
          "transform(embedding, x -> cast(cast(round(x + 1e-9, 6) as decimal(18,6)) as string))"))))
      val groups = hashed.groupBy("vhash")
        .agg(count(lit(1)).as("n_members"), min("vec_id").as("canonical_vec_id"))
      hashed.join(groups, "vhash")
        .select(col("vec_id"), col("vhash"), col("n_members"),
          col("canonical_vec_id"),
          (col("n_members") > 1 && col("vec_id") =!= col("canonical_vec_id")).as("is_dup"))
        .orderBy("vec_id")
    },
    Some("""WITH h AS (SELECT vec_id, md5(array_to_string(list_transform(embedding, x -> CAST(CAST(ROUND(1e-9 + x, 6) AS DECIMAL(18,6)) AS VARCHAR)), ',')) AS vhash FROM embeddings), g AS (SELECT vhash, COUNT(*) AS n_members, MIN(vec_id) AS canonical_vec_id FROM h GROUP BY 1) SELECT h.vec_id, h.vhash, g.n_members, g.canonical_vec_id, g.n_members > 1 AND h.vec_id <> g.canonical_vec_id AS is_dup FROM h JOIN g ON g.vhash = h.vhash ORDER BY h.vec_id"""),
  )

  val ops: Seq[Op] = Seq(cosineTopk, centroidPerLabel, annIvf, embeddingNearDup,
    quantizeInt8, truncateRenorm, pqCodes, pqAdcTopk, pqAdcProbeOp, pqAdcFixed,
    srpLshPairs, pcaTopComponent, knnGraph, centroidDistances, semanticClusters,
    semanticClustersAppend, semanticClustersDelete,
    pqIndexReload, pqProbeFilteredOp, pqIndexAppend, pqIndexCompact, pqIndexDelete,
    mipsTopk, signHammingTopk, jlProjection, kmeansFixed,
    recallSignVsExact, normAudit, dupExact)
}
