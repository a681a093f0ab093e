package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: (id, measure) entries kept sorted best-first by
  * (measure DESC, id ASC), capacity k. Primitive arrays — no per-row
  * boxing, no collection churn.
  */
final class TopKBuf(val k: Int) {
  val ids: Array[Long] = new Array[Long](k)
  val sims: Array[Double] = new Array[Double](k)
  var n: Int = 0

  // Total order via Double.compare (NaN greatest, matching the oracle's
  // ORDER BY sim DESC NaN placement): raw >/== would park a NaN at the
  // head unconditionally (NaN==NaN is false skips the id tie-break),
  // making results arrival-order-dependent when a zero-norm vector
  // yields NaN sims.
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(id: Long, sim: Double): Unit = {
    if (n == k && !better(sim, id, sims(n - 1), ids(n - 1))) return
    // Position = count of existing entries better than the newcomer.
    var p = 0
    while (p < n && better(sims(p), ids(p), sim, id)) p += 1
    val last = math.min(n, k - 1)
    var j = last
    while (j > p) { ids(j) = ids(j - 1); sims(j) = sims(j - 1); j -= 1 }
    ids(p) = id; sims(p) = sim
    if (n < k) n += 1
  }
}

/** Native bounded top-k aggregate over (id LONG, measure DOUBLE) pairs —
  * the TypedImperativeAggregate formulation of [[TopKAgg]], used on the
  * O(n²) similarity pair loops where the Aggregator/udaf path's per-row
  * encoder conversion (boxed tuples + immutable-list inserts) measured
  * ~550 ns/row of pure overhead at 4M pairs/query (BENCH r2). Here
  * update() reads the child expressions straight off the InternalRow into
  * primitive arrays; partial buffers ship as ≤(4+16k)-byte blobs, so the
  * shuffle after partial aggregation carries k entries per
  * (group × partition) — never the pair rows themselves. Ordering
  * (measure DESC, id ASC) matches the oracle window's
  * `ORDER BY sim DESC, b_vec_id` exactly, including exact-tie breaks.
  *
  * Usage (k must be a literal): `expr("vec_topk(b_vec_id, sim, 5)")` →
  * `array<struct<id:bigint,sim:double>>`, best first.
  */
case class VecTopK(
    idExpr: Expression,
    simExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => require(i > 0, "vec_topk: k must be positive"); i
    case other => throw new IllegalArgumentException(s"vec_topk: k must be an int literal, got $other")
  }

  override def children: Seq[Expression] = Seq(idExpr, simExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("sim", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (idExpr.dataType == LongType && simExpr.dataType == DoubleType &&
      kExpr.dataType == IntegerType && kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "vec_topk requires (bigint, double, int literal) arguments")

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  // The planner binds children to the input schema, so in the common case
  // both are BoundReferences — read the primitives straight off the row
  // (no Object boxing on the 4M-pair hot path).
  private lazy val idOrd: Int = idExpr match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  private lazy val simOrd: Int = simExpr match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    if (idOrd >= 0 && simOrd >= 0) {
      if (!input.isNullAt(idOrd) && !input.isNullAt(simOrd))
        buf.insert(input.getLong(idOrd), input.getDouble(simOrd))
    } else {
      val id = idExpr.eval(input)
      val sim = simExpr.eval(input)
      if (id != null && sim != null)
        buf.insert(id.asInstanceOf[Long], sim.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) { buf.insert(other.ids(i), other.sims(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.n)(i =>
      InternalRow(buf.ids(i), buf.sims(i))))

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.sims(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong; buf.sims(i) = bb.getDouble; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecTopK =
    copy(idExpr = newChildren(0), simExpr = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "vec_topk"
}

object VecTopK {
  /** Idempotently register `vec_topk` so operators can use it via
    * expr("vec_topk(id, sim, k)"); the analyzer wraps the
    * AggregateFunction in an AggregateExpression at use sites.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_topk", exprs => {
        graft.GraftExtensions.checkArity(
          "vec_topk", "vec_topk(id BIGINT, measure DOUBLE, k INT literal)", 3, exprs)
        VecTopK(exprs(0), exprs(1), exprs(2))
      }, "scala_udf")
}
