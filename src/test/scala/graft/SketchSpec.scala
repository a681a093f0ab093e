package graft

import org.scalacheck.Gen

/** Misra-Gries guarantee + heavy-hitters op checks (SURVEY §5.2.2). */
class SketchSpec extends SparkSpec {

  test("misra-gries summary is a superset of items above n/(k+1), even adversarially skewed") {
    // Zipf-ish streams with NDV far above k, so the summary actually
    // fills and the decrement path runs — the regime the fixture corpus
    // (NDV 31) never reaches.
    val gen = for {
      n <- Gen.choose(500, 4000)
      zipf <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.choose(0, 4).map(i => s"hot$i")),
        (4, Gen.choose(0, 5000).map(i => s"cold$i")),
      ))
    } yield zipf
    (0 until 50).foreach { i =>
      val stream = gen(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).get
      val k = 16
      val out = graft.ops.Sketches.misraGries(k)(stream.iterator).toSet
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val thr = stream.size.toDouble / (k + 1)
      counts.foreach { case (w, c) =>
        if (c > thr) assert(out.contains(w), s"seed=$i: $w count=$c > $thr missing from summary")
      }
    }
  }

  test("hll merge rollup: merged estimate equals direct sketch and bounds the exact count") {
    import org.apache.spark.sql.functions._
    val merged = SparkEntry.queries("agg_hll_merge_rollup")(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy(date_trunc("month", col("ts")).cast("date").as("month"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("direct_users"),
        countDistinct(col("user_id")).as("exact_users"))
    val joined = merged.join(direct, Seq("month", "event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val m = r.getAs[Long]("approx_users").toDouble
      val d = r.getAs[Long]("direct_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      // Union of daily sketches must agree with the one-shot sketch
      // (mergeability), and both must sit within HLL error of exact.
      assert(m == d, s"${r.get(0)}/${r.get(1)}: merged $m vs direct $d")
      assert(math.abs(m - e) / e <= 0.05, s"${r.get(0)}/${r.get(1)}: approx $m vs exact $e")
    }
  }

  test("agg_heavy_hitters equals the exact plan at smoke scale") {
    val op = SparkEntry.queries("agg_heavy_hitters")(spark, sf)
    import org.apache.spark.sql.functions._
    val exact = Tables.documents(spark, sf)
      .select(split(lower(col("text")), " ").as("ws"))
      .select(expr(
        "explode(transform(slice(ws, 1, size(ws) - 1), (w, i) -> concat(w, ' ', ws[i + 1])))").as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 30)
      .orderBy("bigram")
    assert(op.collect().toSeq == exact.collect().toSeq)
  }

  test("agg_cms_heavy: estimates are one-sided and within the eps*N band") {
    val rows = SparkEntry.queries("agg_cms_heavy")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (exact, est, ok) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      // CMS hard guarantee: never an underestimate.
      assert(est >= exact, s"user ${r.getLong(0)}: estimate $est < exact $exact")
      assert(ok)
      // eps = 0.001 => additive error <= eps * N (w.h.p.; pinned seed
      // makes this a fixed property of the fixture).
      assert(est - exact <= math.max(1L, (0.001 * total).ceil.toLong),
        s"user ${r.getLong(0)}: estimate $est too far above $exact")
    }
  }

  test("agg_cms_heavy is deterministic across runs (pinned seed)") {
    val a = SparkEntry.queries("agg_cms_heavy")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("agg_cms_heavy")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("agg_hll_intersection: inclusion-exclusion estimate tracks the exact overlap") {
    val rows = SparkEntry.queries("agg_hll_intersection")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (eu, est, exact) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // lgK=12 → ~1.6% rse per term; three terms compound. Bound the
      // compounded error against the union magnitude, floored for the
      // tiny-cardinality regime where HLL is exact anyway.
      assert(math.abs(est - exact) <= math.max(3.0, 0.10 * eu),
        s"week ${r.get(0)}: est $est vs exact $exact (union $eu)")
      assert(est >= 0.0)
    }
  }
}
