package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._

/** §2.N (round 5) — sketch-prefiltered exact aggregation: the
  * approximate-candidates → exact-verify dataflow that keeps heavy-key
  * discovery bounded-memory at 100 TB. The suite's other approximate ops
  * (HLL, quantile) emit approximate VALUES; this family uses the sketch
  * only to bound state, so the final output is exact and fully oracled.
  */
object Sketches extends OpGroup {

  /** Misra-Gries (1982) frequent-items summary of one partition's
    * stream: at most `k` counters; when full, an unseen item debits
    * every counter (zeros evicted). Any item with partition frequency
    * > n_p/(k+1) is guaranteed to survive — so with k ≥ n/T and
    * balanced partitions, every item with GLOBAL count ≥ T survives in
    * at least one partition summary (pigeonhole: its best partition
    * holds ≥ T/P ≥ n_p/(k+1) occurrences). Amortized O(1) per item:
    * each full decrement pass destroys k count-units that k increments
    * paid for. Exposed for the scalacheck superset-guarantee property.
    */
  private[graft] def misraGries(k: Int)(it: Iterator[String]): Iterator[String] = {
    val counts = new java.util.HashMap[String, Long](k * 2)
    it.foreach { w =>
      // getOrDefault, not get: absent keys must read as 0 explicitly
      // (unboxing get()'s null to 0L happens to work but is a refactor
      // trap — any pattern match on the boxed result NPEs).
      val c = counts.getOrDefault(w, 0L)
      if (c != 0L) counts.put(w, c + 1)
      else if (counts.size < k) counts.put(w, 1L)
      else {
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val en = e.next()
          if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala
  }

  /** Corpus-global heavy bigrams (boilerplate/template detection, the
    * corpus-wide sibling of `text_ngram_topk`): word bigrams with exact
    * count ≥ 30. Phase 1 runs Misra-Gries per partition (k sized from a
    * one-aggregate character-length UPPER BOUND on the stream, with a
    * runtime assert of the partition-balance assumption, so the
    * summaries are a guaranteed SUPERSET of the true heavy hitters at
    * any corpus size — SketchSpec proves the bound on adversarial
    * streams); phase 2 exact-counts ONLY the candidate bigrams. At
    * fixture NDV the sketch map never fills, but at 100 TB this is the
    * load-bearing difference: phase 2's per-partition hash state is
    * bounded by the (tiny) candidate set instead of the corpus NDV, so
    * the group-by cannot spill no matter how wide the key space gets —
    * the exact plan's failure mode that makes one-pass heavy-hitters a
    * sketch problem in the first place. mapPartitions is deliberate
    * (genuine per-partition imperative state, SURVEY §2.K's criterion).
    */
  private val heavyHitters = Op(
    "agg_heavy_hitters",
    (s, sf) => {
      import s.implicits._
      val T = 30L
      val bigrams = Tables.spread(s, Tables.documents(s, sf))
        .select(split(lower(col("text")), " ").as("ws"))
        .select(expr(
          "explode(transform(slice(ws, 1, size(ws) - 1), (w, i) -> concat(w, ' ', ws[i + 1])))").as("bigram"))
      // k is DERIVED from an UPPER BOUND on the stream size, not from a
      // second tokenize+explode pass (the r5 bigrams.count() pre-pass):
      // every bigram consumes ≥2 chars of text (word char + separator),
      // so Σ⌊(len(text)−1)/2⌋ ≥ bigram count — one columnar length
      // aggregate, the material a production deployment reads straight
      // from table statistics. Oversizing k is free (map capacity is
      // demand-grown, bounded by partition NDV), undersizing silently
      // drops heavy hitters — so a bound, never an estimate.
      val charSum = Tables.documents(s, sf)
        .agg(sum(greatest(length(col("text")).cast("long") - 1, lit(0L))))
        .first().getLong(0)
      val k = math.max(4096L, charSum / T + 1).toInt // 2·(charSum/2)/T
      val parts = bigrams.rdd.getNumPartitions.toLong
      val cands = bigrams.select("bigram").as[String]
        .mapPartitions { it =>
          // Runtime witness of the balance assumption the superset
          // guarantee rests on (ADVICE r5): an item with global count
          // ≥ T survives its best partition iff T/P > n_p/(k+1). A
          // skewed partitioning would otherwise DROP true heavy
          // hitters with no error — fail loudly instead.
          var m = 0L
          val out = misraGries(k)(it.map { w => m += 1; w })
          require(m * parts < T * (k + 1L),
            s"partition stream of $m bigrams breaks the Misra-Gries superset bound (P=$parts, k=$k, T=$T)")
          out
        }.toDF("bigram").distinct()
      bigrams.join(broadcast(cands), "bigram")
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= T)
        .orderBy("bigram")
    },
    Some("""WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents), b AS (SELECT ws[i] || ' ' || ws[i + 1] AS bigram FROM w, unnest(generate_series(1, len(ws) - 1)) t(i)) SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram HAVING COUNT(*) >= 30 ORDER BY bigram"""),
  )

  /** MERGEABLE sketch rollup (r5): per-day HLL sketches of distinct
    * users union-merged up to (month, event_type) — the two-level
    * pre-aggregation infrastructure pattern: at 100 TB the daily
    * sketches are materialized once and every coarser rollup (weekly,
    * monthly, all-time) is a cheap fixed-size union over them, never a
    * re-scan of raw events. Uses Spark's DataSketches HLL exprs
    * (hll_sketch_agg / hll_union_agg / hll_sketch_estimate). No oracle
    * (sketch bytes are engine-specific); SketchSpec asserts the merged
    * estimate equals the directly-sketched estimate and bounds the
    * error vs exact distinct.
    */
  private val hllMergeRollup = Op(
    "agg_hll_merge_rollup",
    (s, sf) => {
      val daily = Tables.events(s, sf)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
      daily
        .groupBy(date_trunc("month", col("day")).cast("date").as("month"), col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
          count(lit(1)).as("n_days"))
        .orderBy("month", "event_type")
    },
    None,
  )

  /** Count-min-sketch frequency estimation (r9, Cormode & Muthukrishnan
    * 2005) — the third mergeable summary next to HLL (distinct) and
    * Misra-Gries (candidates): per-user event counts estimated from ONE
    * corpus pass through the builtin codegen'd `count_min_sketch`
    * aggregate (eps 0.001, conf 0.99, pinned seed), then audited
    * against the exact counts. The single `head()` collects the SKETCH,
    * not data — its size is the eps/confidence-determined constant
    * (d×w counters, corpus-independent; that bounded mergeability is
    * the entire point of the structure: at 100 TB the per-partition
    * sketches merge in the agg, and the summary ships anywhere). The
    * estimate pass deserializes the broadcast sketch once per partition
    * and maps over the aggregated per-key relation. The CMS one-sided
    * guarantee — estimate ≥ exact always, ≤ exact + eps·N w.h.p. — is
    * emitted as audit columns and asserted in SketchSpec. No oracle:
    * estimates are hash-construction-specific by design.
    */
  private val cmsHeavy = Op(
    "agg_cms_heavy",
    (s, sf) => {
      import org.apache.spark.util.sketch.CountMinSketch
      import s.implicits._
      val ev = Tables.events(s, sf)
      val skBytes = ev
        .agg(count_min_sketch(col("user_id"), lit(0.001d), lit(0.99d), lit(42)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val bc = s.sparkContext.broadcast(skBytes)
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      exact.as[(Long, Long)].mapPartitions { it =>
        val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bc.value))
        it.map { case (uid, n) =>
          (uid, n, sk.estimateCount(java.lang.Long.valueOf(uid)))
        }
      }.toDF("user_id", "exact_n", "cms_estimate")
        .withColumn("overestimate_ok", col("cms_estimate") >= col("exact_n"))
        .orderBy("user_id")
    },
    None,
  )

  /** Approximate AUDIENCE-OVERLAP via HLL inclusion-exclusion (r9):
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), per week, A = viewers and
    * B = purchasers. HLL sketches cannot intersect directly, but the
    * union IS a sketch merge, so the overlap falls out of three
    * estimates computed in ONE pass over the filtered fact table (the
    * A/B sketches via conditional inputs, the union over all) —
    * where the exact plan (`agg_user_overlap_weeks`' shape) carries a
    * per-user distinct shuffle, this carries three constant-size
    * sketches per group, the mergeable-rollup property the HLL family
    * exists for. Exact intersection rides along as an audit column
    * (one extra distinct agg, fixture-affordable). Estimates are
    * engine-specific by construction → no oracle; SketchSpec bounds
    * the inclusion-exclusion error against the exact counts.
    */
  private val hllIntersection = Op(
    "agg_hll_intersection",
    (s, sf) => {
      val ev = Tables.events(s, sf)
        .filter(col("event_type").isin("view", "purchase"))
        .select(date_trunc("week", col("ts")).cast("date").as("week"),
          col("event_type"), col("user_id"))
      val isA = col("event_type") === "view"
      val isB = col("event_type") === "purchase"
      val sk = ev.groupBy("week").agg(
        hll_sketch_estimate(hll_sketch_agg(when(isA, col("user_id")), lit(12))).as("est_view"),
        hll_sketch_estimate(hll_sketch_agg(when(isB, col("user_id")), lit(12))).as("est_purchase"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est_union"))
      val exact = ev.groupBy("week", "user_id")
        .agg(max(when(isA, 1).otherwise(0)).as("a"), max(when(isB, 1).otherwise(0)).as("b"))
        .groupBy("week")
        .agg(sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)).as("exact_both"))
      sk.join(exact, "week")
        .select(col("week"), col("est_view"), col("est_purchase"), col("est_union"),
          greatest(lit(0L), col("est_view") + col("est_purchase") - col("est_union"))
            .as("est_both"),
          col("exact_both"))
        .orderBy("week")
    },
    None,
  )

  val ops: Seq[Op] = Seq(heavyHitters, hllMergeRollup, cmsHeavy, hllIntersection)
}
