package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Primitive-array kernel for exact cosine top-k against a broadcast
  * vector matrix. Used by vec_cosine_topk where the comparison set fits
  * an executor (it always does per-bucket — see docs/scale.md): a
  * declarative pair join materializes O(n²) joined rows, each copying
  * both embedding arrays; this kernel streams queries against the
  * broadcast matrix with zero pair materialization. mapPartitions is the
  * documented (d)-tier choice here, justified by measurement against the
  * (b)-tier BroadcastNestedLoopJoin + FloatVecDot plan.
  *
  * Parity contract: dot accumulates sequentially in double (identical to
  * FloatVecDot / the DuckDB list_reduce oracle) and rounding replicates
  * Spark's round() exactly (HALF_UP over BigDecimal.valueOf).
  */
object CosineKernel {

  /** graft.ops.parity.r6 semantics: the same +1e-9 tie-avoidance shift,
    * then Spark round() (HALF_UP on the shortest decimal repr).
    */
  def round6(x: Double): Double =
    JBigDecimal.valueOf(x + 1e-9).setScale(6, RoundingMode.HALF_UP).doubleValue()

  def l2(v: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  /** Top-k neighbors of one query against the matrix, ordered by
    * (rounded sim DESC, id ASC). `ids` must be ascending so equal-sim
    * ties keep the smaller id (later equal entries never displace).
    */
  def topK(
      qid: Long, q: Array[Float], qn: Double,
      ids: Array[Long], mat: Array[Array[Float]], nrm: Array[Double],
      k: Int): Array[(Int, Long, Double)] = {
    val topSim = new Array[Double](k)
    val topId = new Array[Long](k)
    var size = 0
    var j = 0
    while (j < ids.length) {
      if (ids(j) != qid) {
        val b = mat(j)
        var acc = 0.0
        var i = 0
        val n = math.min(q.length, b.length)
        while (i < n) { acc += q(i).toDouble * b(i).toDouble; i += 1 }
        val sim = round6(acc / (qn * nrm(j)))
        if (size < k || sim > topSim(size - 1)) {
          // insertion position: strictly-greater sims shift down; equal
          // sims keep scan order (ascending ids) ⇒ smaller id wins.
          var p = if (size < k) size else size - 1
          while (p > 0 && sim > topSim(p - 1)) {
            topSim(p) = topSim(p - 1); topId(p) = topId(p - 1); p -= 1
          }
          topSim(p) = sim
          topId(p) = ids(j)
          if (size < k) size += 1
        }
      }
      j += 1
    }
    Array.tabulate(size)(r => (r + 1, topId(r), topSim(r)))
  }

  /** All neighbors of `q` with id > qid (lower triangle) whose rounded
    * cosine clears `thr` — the near-dup threshold scan. Same sequential
    * double accumulation + round6 as [[topK]], so the emitted sims are
    * bit-identical to the declarative FloatVecDot/r6 plan and the DuckDB
    * list_reduce oracle. `ids` ascending ⇒ output already b-id-ordered.
    */
  def thresholdPairs(
      qid: Long, q: Array[Float], qn: Double,
      ids: Array[Long], mat: Array[Array[Float]], nrm: Array[Double],
      thr: Double): Iterator[(Long, Long, Double)] = {
    val out = Array.newBuilder[(Long, Long, Double)]
    var j = 0
    while (j < ids.length) {
      if (ids(j) > qid) {
        val b = mat(j)
        var acc = 0.0
        var i = 0
        val n = math.min(q.length, b.length)
        while (i < n) { acc += q(i).toDouble * b(i).toDouble; i += 1 }
        val sim = round6(acc / (qn * nrm(j)))
        if (sim >= thr) out += ((qid, ids(j), sim))
      }
      j += 1
    }
    out.result().iterator
  }
}
