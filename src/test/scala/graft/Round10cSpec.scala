package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-10c batch (the oracle gate proves
  * engine parity; these prove the statistics and curves mean what the
  * Scaladoc claims).
  */
class Round10cSpec extends SparkSpec {

  test("stats_jarque_bera is consistent with stats_skew_kurtosis moments") {
    val jb = SparkEntry.queries("stats_jarque_bera")(spark, sf).collect()
    val sk = SparkEntry.queries("stats_skew_kurtosis")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("skewness"), r.getAs[Double]("kurtosis_excess"))).toMap
    assert(jb.nonEmpty)
    jb.foreach { r =>
      val t = r.getAs[String]("event_type")
      val stat = r.getAs[Double]("jb_stat")
      assert(stat >= 0.0)
      // Same moment machinery → the r6'd skew/kurt columns must agree.
      assert(math.abs(r.getAs[Double]("skewness") - sk(t)._1) < 1e-9)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") - sk(t)._2) < 1e-9)
      // JB recomputed from the rounded columns lands near the raw-chain stat.
      val n = r.getAs[Long]("n").toDouble
      val re = n * (sk(t)._1 * sk(t)._1 / 6 + sk(t)._2 * sk(t)._2 / 24)
      assert(math.abs(re - stat) / math.max(stat, 1.0) < 1e-3)
    }
  }

  test("stats_poisson_dispersion: chi2 = (n-1) * dispersion within rounding") {
    val rows = SparkEntry.queries("stats_poisson_dispersion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val di = r.getAs[Double]("dispersion_index")
      val chi = r.getAs[Double]("chi2_stat")
      val n = r.getAs[Long]("n_days").toDouble
      assert(di > 0.0)
      assert(math.abs(chi - (n - 1) * di) < 0.01, s"chi2 $chi vs (n-1)*DI ${(n - 1) * di}")
      // mean * n_days == total (exact integer accounting).
      assert(math.abs(r.getAs[Double]("mean_daily") * n - r.getAs[Long]("total")) < 0.01)
    }
  }

  test("graph_adamic_adar pairs match neighbor_jaccard's candidate set and bounds") {
    val aa = SparkEntry.queries("graph_adamic_adar")(spark, sf)
    val jc = SparkEntry.queries("graph_neighbor_jaccard")(spark, sf)
    // Same wedge join, same >= 3 support floor → identical (u, v, shared).
    val a = aa.select("u", "v", "shared")
    val j = jc.select("u", "v", "shared")
    assert(a.exceptAll(j).isEmpty && j.exceptAll(a).isEmpty,
      "AA and Jaccard must emit the same candidate pairs")
    // Per-wedge weight is in (1/ln(maxdeg), 1/ln(2)] → AA bounded by shared
    // multiples of those.
    val rows = aa.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s0 = r.getAs[Long]("shared").toDouble
      val v = r.getAs[Double]("adamic_adar")
      assert(v > 0.0 && v <= s0 / math.log(2.0) + 1e-6)
    }
  }

  test("etl_partition_skew_audit: shares sum to 1, skew ratios average 1") {
    val rows = SparkEntry.queries("etl_partition_skew_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("row_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    val meanRatio = rows.map(_.getAs[Double]("skew_ratio")).sum / rows.length
    assert(math.abs(meanRatio - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("skewed") == (r.getAs[Double]("skew_ratio") > 2.0))
    }
  }

  test("sql_unpivot_clause emits one long row per (flag, measure), values matching the wide agg") {
    val long = SparkEntry.queries("sql_unpivot_clause")(spark, sf).collect()
    val flags = long.map(_.getAs[String]("l_returnflag")).distinct
    assert(long.length == flags.length * 3)
    val wide = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(sum(expr("CAST(l_quantity AS DECIMAL(18,6))")).cast("double").as("sum_qty"),
        count(lit(1)).cast("double").as("n_rows"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("sum_qty"), r.getAs[Double]("n_rows"))).toMap
    long.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      r.getAs[String]("metric") match {
        case "sum_qty" => assert(math.abs(r.getAs[Double]("metric_value") - wide(f)._1) < 1e-6)
        case "n_rows"  => assert(math.abs(r.getAs[Double]("metric_value") - wide(f)._2) < 1e-6)
        case "sum_price" => ()
        case m => fail(s"unexpected metric $m")
      }
    }
  }

  test("stats_ljungbox is consistent with ts_autocorr_lags' ACF values") {
    val lb = SparkEntry.queries("stats_ljungbox")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("q_stat"))).toMap
    val acf = SparkEntry.queries("ts_autocorr_lags")(spark, sf)
      .filter(col("lag") <= 5).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(lb.nonEmpty)
    acf.foreach { case (t, rows) =>
      val n = lb(t)._1.toDouble
      val q = rows.map(r => {
        val rk = r.getAs[Double]("acf"); val k = r.getAs[Int]("lag")
        rk * rk / (n - k)
      }).sum * n * (n + 2)
      assert(math.abs(q - lb(t)._2) / math.max(lb(t)._2, 1.0) < 1e-3,
        s"$t: recomputed Q $q vs ${lb(t)._2}")
      assert(lb(t)._2 >= 0.0)
    }
  }

  test("stats_capture_recapture estimates dominate the observed union") {
    val r = SparkEntry.queries("stats_capture_recapture")(spark, sf).head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val m = r.getAs[Long]("overlap"); val u = r.getAs[Long]("true_union")
    assert(m <= math.min(n1, n2))
    assert(u == n1 + n2 - m, "union identity must hold")
    // (n1-m)(n2-m) >= 0  =>  LP = n1*n2/m >= n1+n2-m = union.
    assert(r.getAs[Double]("lincoln_petersen") >= u - 1e-6)
    assert(r.getAs[Double]("chapman") <= r.getAs[Double]("lincoln_petersen") + 1e-6)
  }

  test("stats_prop_ztest: z sign matches the proportion gap, p lawful") {
    val r = SparkEntry.queries("stats_prop_ztest")(spark, sf).head
    val gap = r.getAs[Double]("p_weekend") - r.getAs[Double]("p_weekday")
    val z = r.getAs[Double]("z_stat")
    assert(math.signum(z) == math.signum(gap) || math.abs(gap) < 1e-6)
    val p = r.getAs[Double]("p_value")
    assert(p >= 0.0 && p <= 1.0)
    assert(r.getAs[Long]("conv_weekend") <= r.getAs[Long]("n_weekend"))
    assert(r.getAs[Long]("conv_weekday") <= r.getAs[Long]("n_weekday"))
  }

  test("ts_sma_crossover directions alternate per type") {
    val rows = SparkEntry.queries("ts_sma_crossover")(spark, sf)
      .orderBy("event_type", "day").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      rs.map(_.getAs[String]("cross")).sliding(2).foreach {
        case Array(a, b) => assert(a != b, "consecutive crosses must alternate")
        case _ => ()
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("sma7") > 0.0 && r.getAs[Double]("sma21") > 0.0)
    }
  }

  test("dedup_bloom_prefilter: bloom is in the plan and transparent to the result") {
    val df = SparkEntry.queries("dedup_bloom_prefilter")(spark, sf)
    // The prefilter must actually plan through the bloom expressions…
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
      "expected the bloom prefilter in the physical plan")
    // …and be invisible in the result: identical to the plain equi-join.
    val pars = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(sequence(lit(0), ((size(col("w")) - 1) / 20).cast("int"))).as("idx"),
        col("w"))
      .select(col("doc_id"), col("idx"),
        md5(array_join(slice(col("w"), col("idx") * 20 + 1, lit(20)), " ")).as("h"))
    val base = pars.filter(pmod(col("doc_id"), lit(2)) === 0)
      .groupBy("h").agg(min("doc_id").as("dup_of"))
    val plain = pars.filter(pmod(col("doc_id"), lit(2)) === 1)
      .join(base, "h").select("doc_id", "idx", "dup_of")
    assert(df.count() > 0, "fixture has cross-parity duplicate paragraphs")
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty,
      "bloom prefilter changed the result")
  }

  test("analytics_power_law_fit: alpha > 1 and tail accounting lawful") {
    val r = SparkEntry.queries("analytics_power_law_fit")(spark, sf).head
    assert(r.getAs[Long]("n_tail") <= r.getAs[Long]("n_users"))
    assert(r.getAs[Long]("x_max") >= 5)
    val a = r.getAs[Double]("alpha_hill")
    assert(a > 1.0 && a < 20.0, s"implausible Hill alpha $a")
  }

  test("ts_pacf_durbin: pacf1 equals the lag-1 ACF, all values in [-1, 1]") {
    val pacf = SparkEntry.queries("ts_pacf_durbin")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val acf1 = SparkEntry.queries("ts_autocorr_lags")(spark, sf)
      .filter(col("lag") === 1).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("acf")).toMap
    assert(pacf.nonEmpty)
    pacf.foreach { case (t, r) =>
      assert(math.abs(r.getAs[Double]("pacf1") - acf1(t)) < 1e-9,
        s"$t: pacf1 must equal lag-1 ACF")
      Seq("pacf1", "pacf2", "pacf3").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6, s"$t.$c = $v out of range")
      }
    }
  }

  test("analytics_interevent_gaps: percentiles ordered, gap accounting exact") {
    val r = SparkEntry.queries("analytics_interevent_gaps")(spark, sf).head
    val (p50, p90, p99) = (r.getAs[Long]("p50_min"), r.getAs[Long]("p90_min"),
      r.getAs[Long]("p99_min"))
    assert(p50 <= p90 && p90 <= p99)
    assert(r.getAs[Double]("mean_gap_min") >= 0.0)
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.getAs[Long]("n_gaps") == nEvents - nUsers,
      "one gap per event beyond each user's first")
  }

  test("stats_hash_uniformity: bucket accounting and chi2 sanity") {
    val r = SparkEntry.queries("stats_hash_uniformity")(spark, sf).head
    assert(r.getAs[Long]("n_buckets") == 100L)
    val n = r.getAs[Long]("n_rows")
    assert(r.getAs[Long]("min_bucket") <= n / 100 && n / 100 <= r.getAs[Long]("max_bucket"))
    val chi2 = r.getAs[Double]("chi2_stat")
    // md5 is a good hash: χ²(99) should sit well inside [40, 180] here —
    // far from both degenerate 0 and a skew blow-up.
    assert(chi2 > 0.0 && chi2 < 250.0, s"chi2 $chi2 implausible for md5 buckets")
    assert(n == Tables.events(spark, sf).count())
  }

  test("stream_transform_with_state equals the batch dual exactly") {
    val stream = SparkEntry.queries("stream_transform_with_state")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        ops.parity.r6(sum(expr("CAST(value AS DECIMAL(18,6))")).cast("double")).as("sum_value"),
        ops.parity.r6(max(expr("CAST(value AS DECIMAL(18,6))")).cast("double")).as("max_value"))
      .orderBy("event_type")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "transformWithState running totals must equal the batch aggregate")
  }

  test("win_kaufman_efficiency stays in [0, 1] by the triangle inequality") {
    val rows = SparkEntry.queries("win_kaufman_efficiency")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("efficiency_ratio"))) {
        val er = r.getAs[Double]("efficiency_ratio")
        assert(er >= 0.0 && er <= 1.0 + 1e-9, s"ER $er outside [0,1]")
      }
    }
  }

  test("win_session_window_native agrees with the manual sessionizer up to boundary semantics") {
    val native = SparkEntry.queries("win_session_window_native")(spark, sf)
    val manual = SparkEntry.queries("win_lag_sessionize")(spark, sf)
    val nN = native.count(); val nM = manual.count()
    // Native splits on gap >= 1800 s, the manual key on > 1800 s — native
    // can only split MORE, and the two counts coincide unless a gap lands
    // exactly on the boundary.
    assert(nN >= nM, s"native $nN sessions vs manual $nM")
    assert(nN - nM <= 5, "boundary-exact gaps should be rare")
    // Every native session spans ≥ 1 event and end = last event + 30 min > start.
    val bad = native.filter(col("session_end") <= col("session_start")).count()
    assert(bad == 0)
    assert(native.agg(sum("n_events")).head.getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("src_jsonl_corrupt_quarantine: quarantine count exact, survivors lossless") {
    val rows = SparkEntry.queries("src_jsonl_corrupt_quarantine")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val expectedBad = docs.filter(pmod(col("doc_id"), lit(17)) === 0).count()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_quarantined") == expectedBad))
    val survivors = rows.map(_.getAs[Long]("n_docs")).sum
    assert(survivors == docs.count() - expectedBad,
      "every non-corrupted line must survive the permissive read")
  }

  test("src_file_metadata exposes the file name and exact row count") {
    val r = SparkEntry.queries("src_file_metadata")(spark, sf).head
    assert(r.getAs[String]("file_name") == "documents.parquet")
    assert(r.getAs[Long]("n_rows") == Tables.documents(spark, sf).count())
  }

  test("join_null_safe_eq conserves every row including the NULL-keyed bucket") {
    val rows = SparkEntry.queries("join_null_safe_eq")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables.orders(spark, sf).count(),
      "null-safe join must not drop NULL-keyed rows")
    val unspec = rows.find(_.getAs[String]("label") == "UNSPECIFIED")
    assert(unspec.isDefined && unspec.get.getAs[Long]("n_orders") > 0,
      "the NULL bucket must match through <=>")
  }

  test("agg_listagg: ordered, distinct, comma-joined priorities per status") {
    val rows = SparkEntry.queries("agg_listagg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[String]("priorities").split(",").toSeq
      assert(parts == parts.sorted, "WITHIN GROUP ordering must hold")
      assert(parts.distinct == parts, "DISTINCT must dedupe")
    }
  }

  test("math_try_safe: try_divide nulls exactly the zero-divisor rows") {
    val rows = SparkEntry.queries("math_try_safe")(spark, sf).collect()
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(when(col("l_quantity") === 25, 1L).otherwise(0L)).as("z"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("z")).toMap
    rows.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("n_div_null") == expected(f))
      assert(r.getAs[Long]("n_cast_null") == r.getAs[Long]("n_rows"),
        "a flag letter can never cast to INT")
    }
  }

  test("str_regex_suite: counts/positions consistent with the extracted run") {
    val rows = SparkEntry.queries("str_regex_suite")(spark, sf).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_digit_runs") >= 1, "customer names carry digits")
      val pos = r.getAs[Int]("first_digit_pos")
      assert(pos >= 1)
      assert(r.getAs[String]("first_run").forall(_.isDigit))
      assert(r.getAs[String]("swapped").nonEmpty)
    }
  }

  test("etl_cdc_net_changes is consistent with the full per-op apply") {
    val net = SparkEntry.queries("etl_cdc_net_changes")(spark, sf).collect()
    assert(net.nonEmpty)
    // The compaction's 'after' side must agree with stream_cdc_apply's
    // final alive snapshot: every 'delete' user absent there, every
    // insert/update user present with the same final value.
    val alive = SparkEntry.queries("stream_cdc_apply")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("last_value")).toMap
    net.foreach { r =>
      val u = r.getAs[Long]("user_id")
      r.getAs[String]("net_op") match {
        case "delete" => assert(!alive.contains(u), s"deleted user $u still alive")
        case op =>
          assert(alive.contains(u), s"$op user $u missing from apply snapshot")
          assert(math.abs(alive(u) - r.getAs[Double]("after_value")) < 1e-9)
      }
      assert(r.getAs[Long]("n_ops_window") >= 1)
    }
  }

  test("ts_holt_linear matches a driver-side re-run of the recurrence") {
    val out = SparkEntry.queries("ts_holt_linear")(spark, sf)
      .filter(col("event_type") === "purchase").orderBy("day").collect()
    assert(out.length >= 3)
    val xs = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(value AS DECIMAL(18,6))")).cast("double").as("x"))
      .orderBy("day").collect().map(_.getAs[Double]("x"))
    var l = xs(0); var b = xs(1) - xs(0)
    def r6(v: Double): Double = math.rint((v + 1e-9) * 1e6) / 1e6
    assert(math.abs(out(0).getAs[Double]("level") - r6(l)) < 1e-9)
    assert(math.abs(out(0).getAs[Double]("trend") - r6(b)) < 1e-9)
    for (t <- 1 until xs.length) {
      val nl = 0.5 * xs(t) + 0.5 * (l + b)
      b = 0.3 * (nl - l) + 0.7 * b
      l = nl
      assert(math.abs(out(t).getAs[Double]("level") - r6(l)) < 2e-6,
        s"level mismatch at t=$t: ${out(t).getAs[Double]("level")} vs ${r6(l)}")
      assert(math.abs(out(t).getAs[Double]("trend") - r6(b)) < 2e-6,
        s"trend mismatch at t=$t")
    }
  }
}
