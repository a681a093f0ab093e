package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Properties of the connected-components loop behind dedup_cluster_cc,
  * checked against a plain union-find reimplementation on generated
  * graphs (the op's full pipeline is covered by the DuckDB oracle).
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Union-find ground truth: node → min id of its component. */
  private def groundTruth(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private def ccOf(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    ops.Clusters.connectedComponents(
        nodes.toDF("node"), edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents matches union-find on generated graphs") {
    val rnd = new scala.util.Random(7)
    // 12 random graphs across density regimes, incl. chains (worst-case
    // diameter for plain propagation — exercises the pointer doubling).
    (0 until 12).foreach { i =>
      val n = 5 + rnd.nextInt(60)
      val nodes = (0L until n.toLong).toSeq
      val edges =
        if (i % 4 == 3) nodes.dropRight(1).map(k => (k, k + 1)) // pure chain
        else {
          val m = rnd.nextInt(2 * n)
          Seq.fill(m) {
            val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
            (math.min(a, b), math.max(a, b))
          }.filter(e => e._1 != e._2)
        }
      if (edges.nonEmpty)
        assert(ccOf(nodes, edges) == groundTruth(nodes, edges),
          s"graph $i (n=$n, e=${edges.size}) diverged from union-find")
    }
  }

  test("cluster assignment is invariant under pair-order permutation (scalacheck gen)") {
    val edgeGen = for {
      u <- Gen.chooseNum(0L, 39L)
      v <- Gen.chooseNum(0L, 39L) if u != v
    } yield (math.min(u, v), math.max(u, v))
    val edges = (0 until 80).flatMap(i =>
      edgeGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    assert(edges.size >= 60, "generator drought")
    val nodes = (0L until 40L).toSeq
    val base = ccOf(nodes, edges)
    val rnd = new scala.util.Random(13)
    // Shuffle edge order AND flip orientation — the assignment may not
    // depend on either.
    val permuted = rnd.shuffle(edges.map { case (u, v) =>
      if (rnd.nextBoolean()) (v, u) else (u, v)
    })
    assert(ccOf(nodes, permuted) == base,
      "cluster assignment depended on pair order/orientation")
  }

  test("graph_copurchase_triangles: clustering coefficients are bounded and degree-consistent") {
    val out = SparkEntry.queries("graph_copurchase_triangles")(spark, sf).cache()
    assert(out.count() > 0)
    // clustering in [0,1]; NULL exactly for degree-1 nodes
    assert(out.filter(col("clustering") < 0 || col("clustering") > lit(1.0) + 1e-6).count() == 0)
    assert(out.filter(col("clustering").isNull && col("degree") =!= 1).count() == 0)
    // a node's triangle count can't exceed C(degree, 2)
    assert(out.filter(col("n_triangles") >
      col("degree") * (col("degree") - 1) / 2).count() == 0)
  }

  test("graph_copurchase_pagerank: mass conservation and positivity") {
    val out = SparkEntry.queries("graph_copurchase_pagerank")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("pagerank_ppm") <= 0).count() == 0, "non-positive rank")
    // Σ ranks ≈ 1e6 (ppm scale): per-hop rounding perturbs each node by
    // ≤ ~deg·5e-7·0.85 per round; a generous n-scaled band still catches
    // any structural mass leak (lost contributions, dangling nodes).
    val total = out.agg(sum(col("pagerank_ppm"))).first().getDouble(0)
    assert(math.abs(total - 1e6) < math.max(50.0, n * 0.05),
      s"pagerank mass drifted: $total over $n nodes")
  }

  test("dedup_cluster_cc canonical ids are closed and minimal on the fixture") {
    val out = SparkEntry.queries("dedup_cluster_cc")(spark, sf).cache()
    // canonical ids are themselves members mapping to themselves
    val canon = out.select(col("canonical_doc_id").as("member_doc_id")).distinct()
    val open = canon.join(out, Seq("member_doc_id"))
      .filter(col("canonical_doc_id") =!= col("member_doc_id")).count()
    assert(open == 0, "a canonical id maps to a different canonical id")
    // canonical = min of its cluster
    val notMin = out.groupBy("canonical_doc_id")
      .agg(min("member_doc_id").as("mn"))
      .filter(col("mn") =!= col("canonical_doc_id")).count()
    assert(notMin == 0, "canonical id is not the cluster minimum")
  }
}
