package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (id, measure) pairs, ordered by
  * (measure DESC, id ASC): insert and merge keep only k entries, so the
  * partial-aggregation shuffle carries k rows per group per partition —
  * vs. a window row_number formulation that shuffles and sorts every
  * input row. The generalized form of the reference's "preferred row per
  * duplicate group" selection (cobradb EscherMap.priority / dedup
  * preference pick).
  *
  * The output encoder is an ExpressionEncoder so the result is a real
  * array<struct> column — usable from the untyped `functions.udaf` path
  * (posexplode back to rows) as well as the typed groupByKey path.
  */
final class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
  private def insert(buf: List[(Long, Double)], r: (Long, Double)): List[(Long, Double)] = {
    val (before, after) = buf.span(better(_, r))
    (before ::: r :: after).take(k)
  }
  def zero: List[(Long, Double)] = Nil
  def reduce(buf: List[(Long, Double)], r: (Long, Double)): List[(Long, Double)] =
    insert(buf, r)
  def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    b.foldLeft(a)(insert)
  def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] = buf
  // ExpressionEncoder (array<struct<bigint,double>>), NOT Encoders.kryo:
  // the partial-aggregate buffers serialize through this encoder on every
  // shuffle hand-off, and the kryo path (generic object graph + per-call
  // stream setup) measured ~3× slower end-to-end on the 4M-pair
  // vec_cosine_topk loop (BENCH r1 2.2 s → r2 7.0 s regression).
  def bufferEncoder: Encoder[List[(Long, Double)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}
