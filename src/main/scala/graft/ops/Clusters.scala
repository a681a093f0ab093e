package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.I completion — near-dup CLUSTER FORMATION: every pairing op emits
  * pairs, but a real dedup pipeline must resolve transitive chains
  * (a~b, b~c ⇒ {a,b,c}, keep one) — the generalization of the
  * reference's preference-ordered duplicate resolution
  * (model_loading.py's hash-group → winner) from exact-hash groups to a
  * similarity GRAPH. The dataflow shape is the one the engine didn't
  * witness before round 4: an iterative loop of joins to fixpoint.
  */
object Clusters extends OpGroup {

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each round a node takes the min of its own and
    * its neighbors' labels; at fixpoint label = min(component) — the
    * canonical id. Each round is two equi-shuffles (edge join on v,
    * groupBy on node), fully partition-parallel; rounds = graph diameter,
    * which for near-dup graphs is small (similarity at thr 0.9 is
    * near-transitive, so components are dense). For adversarial diameters
    * at real scale the alternating large-star/small-star contraction
    * (Kiveris et al. 2014) bounds rounds at O(log² n) with the same
    * per-round dataflow — the loop harness here is unchanged.
    *
    * Loop mechanics that matter at scale: `edges` is localCheckpoint'd
    * ONCE so the (possibly expensive) pair pipeline behind it doesn't
    * re-execute every round, and each round's labels are checkpointed to
    * truncate the exponentially-growing lineage. Convergence is detected
    * with one scalar aggregate — labels only ever decrease, so
    * sum(labels) is strictly monotone until fixpoint (no per-round
    * change-count join needed); decimal(38,0) so the sum is exact at any
    * corpus size.
    *
    * @param nodes (node: LONG) — every element to assign (singletons
    *              keep their own label)
    * @param edges (u: LONG, v: LONG) — undirected, u != v
    * @return (node, label) with label = min node id of the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // Symmetric edge list, hash-partitioned on the join key ONCE and
    // pinned via localCheckpoint (LogicalRDD preserves the partitioning):
    // every round's join then shuffles only the O(nodes) label side —
    // the O(edges) relation never moves again. At sf0.1 that is 2M edge
    // rows that would otherwise re-shuffle each round.
    // Materialize the edge list BEFORE symmetrizing: the union's two
    // branches are separate consumers of the (possibly expensive) pair
    // pipeline behind `edges`, and exchange reuse does not always unify
    // them — uncheckpointed, the LSH+simhash build ran twice (~10 s of
    // the 25 s first profile at sf0.1).
    val e0 = edges.select(col("u"), col("v")).localCheckpoint()
    val sym = e0
      .union(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v"))
      .localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("label")).localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prev = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 64) {
      // One hop of min-label: each node takes min(self, neighbors).
      // The groupBy's partial min runs map-side, so the per-round
      // shuffle carries ≤ (distinct nodes × partitions) rows, not the
      // edge-join output.
      val prop = sym
        .join(labels.select(col("node").as("v"), col("label").as("nl")), "v")
        .select(col("u").as("node"), col("nl").as("label"))
        .union(labels)
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint()
      // Pointer doubling (label := label's label): a chain of length d
      // halves each round, so rounds = O(log d) instead of O(d) — the
      // giant near-dup component at sf0.1 has diameter ~10, which plain
      // propagation walks one hop per round. Left join + coalesce: a
      // label is always itself a node, but stay total regardless.
      val next = prop
        .join(prop.select(col("node").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("ll"), col("label")).as("label"))
        .localCheckpoint()
      val cur = labelSum(next)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      rounds += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round=$rounds sum=$cur t=${System.nanoTime() / 1000000}")
    }
    require(converged, s"connectedComponents did not converge in $rounds rounds")
    labels
  }

  /** Canonical-group assignment over the UNION of the two production
    * near-dup pairers (banded MinHash-LSH Jaccard ≥ 0.9 + pigeonhole
    * SimHash Hamming ≤ 8): every document maps to its component's min
    * doc_id (singletons to themselves) with the component size — the
    * keep-one table a training-data pipeline joins against to drop
    * near-duplicates. The DuckDB oracle recomputes both pair sets with
    * the ops' own oracle SQL and closes them transitively with a
    * recursive CTE — so the whole pairs→graph→components path is
    * hash-checked.
    */
  private val clusterCc = Op(
    "dedup_cluster_cc",
    (s, sf) => {
      // No distinct on the union: duplicate edges (a pair surfaced by
      // both pairers) are harmless under the loop's MIN aggregation, and
      // deduping would cost a full shuffle of the ~1M pair rows.
      val edges = Dedup.minhashLshPairs(s, sf).select(
          col("a_doc_id").as("u"), col("b_doc_id").as("v"))
        .union(Dedup.simhashHammingPairs(s, sf).select(
          col("a_doc_id").as("u"), col("b_doc_id").as("v")))
      val nodes = Tables.documents(s, sf).select(col("doc_id").as("node"))
      connectedComponents(nodes, edges)
        .select(col("node").as("member_doc_id"), col("label").as("canonical_doc_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("canonical_doc_id"))))
        .orderBy("member_doc_id")
    },
    // The oracle unions the two pairers' published oracle SQL (CTE names
    // disambiguated), then resolves components SCALABLY: a naive
    // recursive transitive closure is Θ(Σ |component|² · degree) join
    // work — on sf0.1's giant near-dup component (4 289 docs, 1M edges,
    // avg degree ~400) that is ~10¹⁰ rows and ran >35 min before being
    // killed. Instead: two plain-SQL min-contraction rounds (each node →
    // min(self, neighbors), edges relabeled — E-linear, exactly one hop
    // of the Spark loop), which collapse the dense components to a
    // handful of supernodes, THEN the recursive closure on the tiny
    // contracted graph, composed back through the contraction mappings.
    // Component minima survive contraction (the min node maps to
    // itself), so canonical ids are identical. AS MATERIALIZED pins the
    // multiply-referenced CTEs — DuckDB otherwise inlines them and
    // re-executes the LSH pipeline once per reference. Validated
    // cell-exact against a union-find ground truth at sf0.1 (6.9 s).
    Some("""WITH RECURSIVE tok AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents), sig AS (SELECT doc_id, band, min(md5(CAST(band AS VARCHAR) || '|' || word)) AS sig FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS band) bands GROUP BY doc_id, band), bk AS (SELECT doc_id, band // 4 AS band_idx, md5(string_agg(sig, '|' ORDER BY band)) AS bkey FROM sig GROUP BY doc_id, band // 4), lcand AS (SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id FROM bk a JOIN bk b ON a.band_idx = b.band_idx AND a.bkey = b.bkey AND a.doc_id < b.doc_id), sets AS MATERIALIZED (SELECT doc_id, list(word ORDER BY word) AS ws, count(*) AS n FROM tok GROUP BY doc_id), lshp AS (SELECT c.a_doc_id, c.b_doc_id FROM lcand c JOIN sets sa ON sa.doc_id = c.a_doc_id JOIN sets sb ON sb.doc_id = c.b_doc_id WHERE CAST(len(list_intersect(sa.ws, sb.ws)) AS DOUBLE) / (sa.n + sb.n - len(list_intersect(sa.ws, sb.ws))) >= 0.9), sh AS (SELECT doc_id, list_reduce(list_transform(generate_series(0, 59), j -> CASE WHEN list_reduce(list_transform(hs, h -> CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END), (a, b) -> a + b) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), (a, b) -> a | b) AS simhash FROM (SELECT doc_id, list_transform(string_split(lower(text), ' '), w -> CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)) AS hs FROM documents) t), hbands(i, o, l) AS (SELECT * FROM (VALUES (0,0,7),(1,7,7),(2,14,7),(3,21,7),(4,28,7),(5,35,7),(6,42,6),(7,48,6),(8,54,6)) AS v(i,o,l)), bv AS MATERIALIZED (SELECT doc_id, simhash, i, (simhash >> o) & ((CAST(1 AS BIGINT) << l) - 1) AS bval FROM sh CROSS JOIN hbands), hamp AS (SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id FROM bv a JOIN bv b ON a.i = b.i AND a.bval = b.bval AND a.doc_id < b.doc_id WHERE bit_count(xor(a.simhash, b.simhash)) <= 8), e0 AS MATERIALIZED (SELECT a_doc_id AS u, b_doc_id AS v FROM lshp UNION SELECT a_doc_id, b_doc_id FROM hamp), s0 AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), m1 AS MATERIALIZED (SELECT d.doc_id AS node, LEAST(d.doc_id, COALESCE(MIN(s0.v), d.doc_id)) AS l FROM documents d LEFT JOIN s0 ON s0.u = d.doc_id GROUP BY d.doc_id), e1 AS MATERIALIZED (SELECT DISTINCT a.l AS u, b.l AS v FROM e0 JOIN m1 a ON e0.u = a.node JOIN m1 b ON e0.v = b.node WHERE a.l <> b.l), s1 AS MATERIALIZED (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1), m2 AS MATERIALIZED (SELECT n.node, LEAST(n.node, COALESCE(MIN(s1.v), n.node)) AS l FROM (SELECT DISTINCT l AS node FROM m1) n LEFT JOIN s1 ON s1.u = n.node GROUP BY n.node), e2 AS MATERIALIZED (SELECT DISTINCT a.l AS u, b.l AS v FROM e1 JOIN m2 a ON e1.u = a.node JOIN m2 b ON e1.v = b.node WHERE a.l <> b.l), s2 AS MATERIALIZED (SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2), reach(n, r) AS (SELECT u, u FROM s2 UNION SELECT reach.n, s2.v FROM reach JOIN s2 ON reach.r = s2.u), canon2 AS (SELECT n, MIN(r) AS c FROM reach GROUP BY n), assign AS (SELECT d.doc_id AS member_doc_id, COALESCE(c2.c, m2x.l) AS canonical_doc_id FROM documents d JOIN m1 ON m1.node = d.doc_id JOIN m2 m2x ON m2x.node = m1.l LEFT JOIN canon2 c2 ON c2.n = m2x.l) SELECT member_doc_id, canonical_doc_id, COUNT(*) OVER (PARTITION BY canonical_doc_id) AS cluster_size FROM assign ORDER BY member_doc_id"""),
  )

  val ops: Seq[Op] = Seq(clusterCc)
}
