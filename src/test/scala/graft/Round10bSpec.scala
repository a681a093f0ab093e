package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-10b operator batch — properties the
  * row/schema/hash oracle gate can't see (it proves engine parity, not
  * that the statistic/curve/clustering MEANS what it claims).
  */
class Round10bSpec extends SparkSpec {

  test("stats_gtest tracks the chi-square statistic on the same contingency") {
    val g = SparkEntry.queries("stats_gtest")(spark, sf)
    val chi = SparkEntry.queries("stats_chisq_independence")(spark, sf)
    val gTot = g.select("g_total").head.getDouble(0)
    val chiTot = chi.select("chi2_total").head.getDouble(0)
    // G and Pearson χ² are asymptotically equal; on this contingency the
    // per-cell deviations are small so they agree within a loose band.
    assert(gTot > 0.0)
    assert(math.abs(gTot - chiTot) / math.max(chiTot, 1e-9) < 0.25,
      s"G=$gTot vs chi2=$chiTot diverge")
    val df = g.select("df").head.getLong(0)
    assert(df == (g.select("event_type").distinct.count - 1) *
      (g.select("dow").distinct.count - 1))
  }

  test("stats_bh_fdr: p-values lawful, adjustment monotone and >= raw p") {
    val rows = SparkEntry.queries("stats_bh_fdr")(spark, sf).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value"); val adj = r.getAs[Double]("p_adj")
      assert(p >= 0.0 && p <= 1.0)
      assert(adj >= p - 1e-9 && adj <= 1.0, s"adj $adj vs p $p")
    }
    // BH adjusted values are non-decreasing in raw-p rank order.
    val byRank = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("p_adj"))
    byRank.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-9) }
  }

  test("stats_bh_fdr erfc polynomial matches the normal tail at known points") {
    // Two-sided p at z: 1.96 → 0.05, 2.575829 → 0.01 (A&S error ≤ 1.5e-7,
    // well under the 1e-4 band).
    val df = spark.range(1).selectExpr(
      "1.959964 AS z1", "2.575829 AS z2")
      .selectExpr(
        "abs(z1)/sqrt(2.0) AS x1", "abs(z2)/sqrt(2.0) AS x2")
      .selectExpr(
        "1.0/(1.0+0.3275911*x1) AS t1", "x1",
        "1.0/(1.0+0.3275911*x2) AS t2", "x2")
      .selectExpr(
        "t1*(0.254829592+t1*(-0.284496736+t1*(1.421413741+t1*(-1.453152027+t1*1.061405429))))*exp(-x1*x1) AS p1",
        "t2*(0.254829592+t2*(-0.284496736+t2*(1.421413741+t2*(-1.453152027+t2*1.061405429))))*exp(-x2*x2) AS p2")
      .head
    assert(math.abs(df.getDouble(0) - 0.05) < 1e-4)
    assert(math.abs(df.getDouble(1) - 0.01) < 1e-4)
  }

  test("stats_kendall_tau: |tau| <= 1 and pair accounting is consistent") {
    val rows = SparkEntry.queries("stats_kendall_tau")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val tau = r.getAs[Double]("tau_b")
      val n = r.getAs[Long]("n")
      val c = r.getAs[Long]("concordant"); val d = r.getAs[Long]("discordant")
      assert(math.abs(tau) <= 1.0)
      assert(c + d <= n * (n - 1) / 2, "C+D exceeds total pairs")
    }
  }

  test("stats_kendall_tau agrees with a brute-force O(n^2) tau-b on a sample") {
    val xs = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").limit(200)
      .select(col("l_quantity").cast("double"), col("l_discount").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      val dx = xs(i)._1 - xs(j)._1; val dy = xs(i)._2 - xs(j)._2
      if (dx == 0 && dy == 0) { tx += 1; ty += 1 }
      else if (dx == 0) tx += 1
      else if (dy == 0) ty += 1
      else if (dx * dy > 0) conc += 1
      else disc += 1
    }
    val n0 = xs.length.toLong * (xs.length - 1) / 2
    val brute = (conc - disc).toDouble /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
    // Same formulation through the cell-contingency path on the same rows.
    import spark.implicits._
    val cells = xs.toSeq.toDF("q", "d").groupBy("q", "d").count()
    val b = cells.select(col("q").as("bq"), col("d").as("bd"), col("count").as("bcnt"))
    val cd = cells.join(b, col("q") < col("bq") ||
        (col("q") === col("bq") && col("d") < col("bd")))
      .agg(
        sum(when(col("bq") > col("q") && col("bd") > col("d"),
          col("count") * col("bcnt")).otherwise(0L)).as("c"),
        sum(when(col("bq") > col("q") && col("bd") < col("d"),
          col("count") * col("bcnt")).otherwise(0L)).as("d")).head
    assert(cd.getLong(0) == conc && cd.getLong(1) == disc,
      s"cell path (${cd.getLong(0)},${cd.getLong(1)}) vs brute ($conc,$disc)")
    assert(!brute.isNaN)
  }

  test("analytics_survival_km: survival starts <= 1, is non-increasing, risk set shrinks") {
    val rows = SparkEntry.queries("analytics_survival_km")(spark, sf)
      .orderBy("duration_days").collect()
    assert(rows.nonEmpty)
    var lastS = 1.0 + 1e-9
    var lastRisk = Long.MaxValue
    rows.foreach { r =>
      val s0 = r.getAs[Double]("survival")
      val nr = r.getAs[Long]("n_risk")
      assert(s0 <= lastS + 1e-9, "survival must be non-increasing")
      assert(nr <= lastRisk, "risk set must shrink with duration")
      assert(r.getAs[Long]("n_events") <= nr)
      lastS = s0; lastRisk = nr
    }
  }

  test("win_rsi stays in [0, 100] and only fires after a full 14-day window") {
    val rows = SparkEntry.queries("win_rsi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("rsi_14")
      assert(v >= 0.0 && v <= 100.0)
    }
    // 30-day fixture, diffs start day 2, window full at day 15 → ≤ 16/type.
    val perType = rows.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length)
    perType.foreach { case (_, n) => assert(n <= 16) }
  }

  test("win_rolling_corr is in [-1, 1]; a type correlates with a total it dominates") {
    val rows = SparkEntry.queries("win_rolling_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("corr_7d"))) {
        val c = r.getAs[Double]("corr_7d")
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
  }

  test("dedup_paragraph: fractions lawful and duplicated docs lose paragraphs") {
    val rows = SparkEntry.queries("dedup_paragraph")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val np = r.getAs[Long]("n_par"); val nk = r.getAs[Long]("n_kept")
      assert(np >= 1 && nk >= 0 && nk <= np)
    }
    // Corpus-wide: kept paragraphs = distinct paragraph hashes, and the
    // fixture's repeated 20-word windows mean SOME paragraph is dropped.
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val total = rows.map(_.getAs[Long]("n_par")).sum
    assert(kept < total, "expected at least one cross-corpus duplicate paragraph")
    val distinctHashes = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(sequence(lit(0), ((size(col("w")) - 1) / 20).cast("int"))).as("i"), col("w"))
      .select(md5(array_join(slice(col("w"), col("i") * 20 + 1, lit(20)), " ")).as("h"))
      .distinct().count()
    assert(kept == distinctHashes, s"kept $kept != distinct $distinctHashes")
  }

  test("vec_jl_projection approximately preserves pairwise distances") {
    val y = SparkEntry.queries("vec_jl_projection")(spark, sf)
    // 16 coords per vector, all finite.
    val counts = y.groupBy("vec_id").count().select("count").distinct().collect()
    assert(counts.length == 1 && counts(0).getLong(0) == 16L)
    // The JL property is about PAIRWISE DISTANCES (the fixture embeddings
    // are exactly unit-norm, so norms carry no signal): across a 40-vector
    // sample, projected squared distances must correlate strongly with the
    // originals.
    val orig = Tables.embeddings(spark, sf).filter(col("vec_id") < 40)
      .selectExpr("vec_id", "transform(embedding, x -> double(x)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = y.filter(col("vec_id") < 40).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("j")).map(_.getAs[Double]("y")))
      .toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, z) => (x - z) * (x - z) }.sum
    val ids = orig.keys.toArray.sorted
    val pairs = for (i <- ids.indices; j <- (i + 1) until ids.length) yield
      (d2(orig(ids(i)), orig(ids(j))),
        d2(proj(ids(i)).toArray, proj(ids(j)).toArray))
    // Unit-norm fixture vectors have near-uniform pairwise distances, so at
    // k = 16 the JL noise (ε ~ sqrt(1/k)) swamps the tiny true spread and
    // rank correlation is weak BY THEORY. The testable JL property is
    // UNBIASEDNESS — E[d²_proj] = d²_orig — plus a nonzero ordering signal.
    val ratios = pairs.map(p => p._2 / p._1)
    val meanRatio = ratios.sum / ratios.length
    assert(math.abs(meanRatio - 1.0) < 0.15,
      s"mean projected/original distance^2 ratio $meanRatio is biased")
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val c = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(c > 0.1, s"pairwise distance correlation $c too weak for a JL map")
  }

  test("vec_kmeans_fixed: 4 clusters, sizes sum to n, inertia decreases across rounds") {
    val out = SparkEntry.queries("vec_kmeans_fixed")(spark, sf).collect()
    assert(out.length == 4)
    val n = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_assigned")).sum == n)
    out.foreach(r => assert(r.getAs[Double]("inertia") > 0.0))
  }

  test("sql_groupby_all groups on exactly the non-aggregate select items") {
    val df = SparkEntry.queries("sql_groupby_all")(spark, sf)
    assert(df.columns.toSeq == Seq("c_mktsegment", "o_orderpriority", "is_final",
      "n_orders", "revenue"))
    val dup = df.groupBy("c_mktsegment", "o_orderpriority", "is_final")
      .count().filter(col("count") > 1).count()
    assert(dup == 0, "GROUP BY ALL must yield unique key tuples")
  }

  test("etl_table_fingerprint is invariant to partitioning and row order") {
    val base = SparkEntry.queries("etl_table_fingerprint")(spark, sf).head
    // Same rows, shuffled layout → same fingerprint.
    val shuffled = Tables.lineitem(spark, sf).repartition(7, col("l_suppkey"))
    shuffled.createOrReplaceTempView("lineitem_shuffled")
    val canon = concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      col("l_quantity").cast(ops.parity.Dec).cast("string"),
      col("l_extendedprice").cast(ops.parity.Dec).cast("string"),
      col("l_discount").cast(ops.parity.Dec).cast("string"),
      col("l_tax").cast(ops.parity.Dec).cast("string"),
      col("l_returnflag"), col("l_linestatus"),
      to_date(col("l_shipdate")).cast("string"))
    val re = shuffled
      .select(conv(substring(md5(canon), 1, 7), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum("h").as("hash_sum"),
        min("h").as("hash_min"), max("h").as("hash_max")).head
    assert(base.getAs[Long]("n_rows") == re.getAs[Long]("n_rows"))
    assert(base.getAs[Long]("hash_sum") == re.getAs[Long]("hash_sum"))
    assert(base.getAs[Long]("hash_min") == re.getAs[Long]("hash_min"))
    assert(base.getAs[Long]("hash_max") == re.getAs[Long]("hash_max"))
  }
}
