package graft

/** Mathematical invariants of the late-round-9 statistics family that
  * the row-hash oracle gate can't express: interval containment for the
  * bootstrap, bounds for correlation-shaped statistics, and structural
  * properties of the islands/k-NN relations. All at the sf0.001 smoke
  * tier (the oracle gate covers exact values at sf0.01/sf0.1).
  */
class StatsDepthSpec extends SparkSpec {

  test("bootstrap CI contains the point estimate and is ordered") {
    val rows = SparkEntry.queries("stats_bootstrap_ci")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, mean, lo, hi) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 0)
      assert(lo <= hi, s"${r.getString(0)}: lo $lo > hi $hi")
      // the percentile interval of resample means brackets the sample mean
      assert(lo <= mean && mean <= hi, s"${r.getString(0)}: $mean outside [$lo, $hi]")
      // B=100 Poisson resamples of n>300 rows: the CI is tight around the mean
      assert(hi - lo < mean, s"${r.getString(0)}: degenerate width ${hi - lo}")
    }
  }

  test("Welch t: positive variances, df between min(n)-1 and n1+n2-2") {
    val r = SparkEntry.queries("stats_welch_ttest")(spark, sf).collect().head
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val (sd1, sd2, df) = (r.getDouble(4), r.getDouble(5), r.getDouble(7))
    assert(sd1 > 0 && sd2 > 0)
    assert(df >= math.min(n1, n2) - 1 && df <= n1 + n2 - 2,
      s"Welch df $df outside [${math.min(n1, n2) - 1}, ${n1 + n2 - 2}]")
  }

  test("cross-correlation is bounded by 1 and covers all 15 lags") {
    val rows = SparkEntry.queries("ts_crosscorr_leadlag")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (-7 to 7).toSeq)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-6,
      s"|ccf| > 1 at lag ${r.getInt(0)}"))
  }

  test("assortativity is a correlation in [-1, 1] over a symmetric edge list") {
    val r = SparkEntry.queries("graph_degree_assortativity")(spark, sf).collect().head
    assert(r.getLong(0) % 2 == 0, "directed edge count of a symmetrized list is even")
    assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-6)
  }

  test("islands are disjoint, ordered, and consistent with their day counts") {
    val rows = SparkEntry.queries("win_gaps_islands")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate, r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s0, e0, d) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(s0, e0) + 1 == d,
        s"island [$s0, $e0] claims $d days")
      assert(d >= 3)
    }
    rows.groupBy(_._1).values.foreach { is =>
      is.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // maximality: a 1-day gap would have merged the islands
          assert(java.time.temporal.ChronoUnit.DAYS.between(e1, s2) >= 2,
            s"islands touch: $e1 then $s2")
        case _ =>
      }
    }
  }

  test("Pythagorean mean inequality AM >= GM >= HM holds per group") {
    val rows = SparkEntry.queries("agg_geo_harmonic_means")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (am, gm, hm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(am >= gm - 1e-6 && gm >= hm - 1e-6,
        s"${r.getString(0)}: AM $am, GM $gm, HM $hm violate the mean inequality")
      assert(hm > 0)
    }
  }

  test("skewness/kurtosis: sd matches Welch-family variance shape, kurtosis > -2") {
    val rows = SparkEntry.queries("stats_skew_kurtosis")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0, "positive population sd")
      // excess kurtosis is bounded below by -2 for ANY distribution
      assert(r.getDouble(5) > -2.0, s"${r.getString(0)}: impossible kurtosis ${r.getDouble(5)}")
    }
  }

  test("mutual k-NN edges reciprocate with ranks within k") {
    val rows = SparkEntry.queries("vec_knn_graph")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "edges are emitted u < v")
      assert(r.getInt(3) <= 5 && r.getInt(4) <= 5, "both ranks within k = 5")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-6)
    }
  }
}
