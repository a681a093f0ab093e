package graft

/** vec_pca_top_component: eigenpair invariants the oracle gate can't
  * check (iterative solver) — the returned (v, λ) must actually be the
  * dominant eigenpair of the corpus covariance, unit-norm, sign-
  * canonical, and deterministic.
  */
class PcaSpec extends SparkSpec {

  private def opRows() = SparkEntry.queries("vec_pca_top_component")(spark, sf)
    .collect().sortBy(_.getInt(0))
    .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))

  private def corpus(): Seq[Array[Float]] =
    Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray).toSeq

  test("returned vector is unit-norm and sign-canonical") {
    val rows = opRows()
    assert(rows.length == 64)
    val v = rows.map(_._2)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    // loadings are rounded to 1e-6, so the norm is 1 up to rounding
    assert(math.abs(nrm - 1.0) < 1e-4, s"norm $nrm")
    assert(v.maxBy(math.abs) > 0, "largest-|loading| coordinate must be positive")
  }

  test("(v, lambda) is an eigenpair of the corpus covariance") {
    val rows = opRows()
    val v = rows.map(_._2)
    val lambda = rows.head._3
    val cov = graft.ops.Vectors.covarianceOf(corpus())
    val av = (0 until 64).map(i => (0 until 64).map(j => cov(i)(j) * v(j)).sum)
    val residual = math.sqrt((0 until 64).map(i => math.pow(av(i) - lambda * v(i), 2)).sum)
    // rounding of the published loadings adds ~1e-6-scale noise per
    // coordinate on top of power-iteration convergence
    assert(residual <= 1e-3 * lambda + 1e-6, s"residual $residual vs lambda $lambda")
  }

  test("lambda dominates the Rayleigh quotient of random probes") {
    val rows = opRows()
    val lambda = rows.head._3
    val cov = graft.ops.Vectors.covarianceOf(corpus())
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { _ =>
      val u0 = Array.fill(64)(rnd.nextGaussian())
      val n0 = math.sqrt(u0.map(x => x * x).sum)
      val u = u0.map(_ / n0)
      val ray = (0 until 64).map(i => (0 until 64).map(j => cov(i)(j) * u(j)).sum * u(i)).sum
      assert(ray <= lambda * (1 + 1e-3), s"random Rayleigh $ray beats lambda $lambda")
    }
  }

  test("var_share is consistent with the covariance trace and in (0, 1]") {
    val rows = opRows()
    val (lambda, share) = (rows.head._3, rows.head._4)
    val cov = graft.ops.Vectors.covarianceOf(corpus())
    val trace = (0 until 64).map(i => cov(i)(i)).sum
    assert(share > 0 && share <= 1.0)
    assert(math.abs(share - lambda / trace) < 1e-4, s"share $share vs ${lambda / trace}")
  }

  test("output is deterministic across runs") {
    assert(opRows().toSeq == opRows().toSeq)
  }
}
