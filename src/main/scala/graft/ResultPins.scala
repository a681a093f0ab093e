package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Op-scoped registry of RESULT pins (r14, the r13 verdict's item 5).
  *
  * The graph/phash ops pin their final result RDD (persist + count) to
  * truncate the logical plan before the output sort — deliberate, and
  * the loop INTERMEDIATES were already persist/unpersist-managed — but
  * through r13 each invocation's result pin stayed in the block manager
  * forever, so a long-lived session (a min-of-2 bench sweep, a
  * notebook) accumulated one small pinned RDD per invocation. The same
  * class of leak was fixed for the LSH probe's checkpoint in r12
  * (commit a3d25dd); this finishes the job for the result pins.
  *
  * Registering a pin under its op key SWAPS OUT the previous
  * invocation's pin (non-blocking unpersist), so the block manager
  * holds at most ONE result pin per (op, corpus) at any time — flat,
  * not monotonic. A [[swap]]-pinned DataFrame stays CORRECT if a
  * caller still holds it after being swapped out (the RDD lineage
  * recomputes on demand); only its cached blocks are released. A
  * [[swapCheckpoint]]-pinned DataFrame does NOT — localCheckpoint
  * TRUNCATES lineage, so releasing the superseded checkpoint's blocks
  * leaves the old DataFrame unrecomputable (missing-block errors on
  * next action). Callers must treat a swapCheckpoint result as valid
  * only until the same key is swapped again — i.e. don't consume a
  * prior invocation's pinned relation (or anything derived lazily from
  * it, like the append ops' witness seams) after re-invoking the op.
  * [[releaseAll]] frees everything — spec/bench teardown hygiene,
  * asserted by ResultPinsSpec via `sparkContext.getPersistentRDDs`.
  */
object ResultPins {
  private val pins = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]()

  /** Materialize and pin `df`'s rows, replacing — and freeing — the
    * previous pin registered under `key`. Returns the rewrapped
    * DataFrame (plan truncated at the pinned RDD, the clusterCc
    * discipline).
    */
  def swap(s: SparkSession, key: String, df: DataFrame): DataFrame = {
    capturePlan(key, df)
    val rdd = df.rdd
    rdd.persist(); rdd.count(): Unit
    val old = pins.put(key, rdd)
    if (old != null && old.id != rdd.id) old.unpersist(false)
    s.createDataFrame(rdd, df.schema)
  }

  private val ckPins = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** [[swap]] for LARGE relations: pin via `localCheckpoint` (eager),
    * which caches InternalRow blocks — no per-row Row decode on
    * materialization and no re-serialization when downstream plans scan
    * the pin (the r14 cc-append profile: the same 1M-row pipeline cost
    * 23 s through `df.rdd` + Row conversion vs ~6 s checkpointed).
    * Swap semantics differ from [[swap]] in one load-bearing way (r15
    * advice): the superseded checkpoint's blocks are released AND its
    * lineage is already truncated, so the swapped-out DataFrame is
    * INVALIDATED, not merely evicted — see the class doc.
    */
  def swapCheckpoint(key: String, df: DataFrame): DataFrame = {
    capturePlan(key, df)
    val ck = df.localCheckpoint()
    val old = ckPins.put(key, ck)
    if (old != null) releaseCheckpoint(old)
    ck
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** OPT-IN plan observability (r15): pinning materializes a result and
    * rewraps it over the pinned RDD, which TRUNCATES the visible plan of
    * the returned DataFrame — `explain` on a pinned op shows only the
    * RDD scan + output sort. When the `graft.plan.capture` system
    * property is set (plan-audit tooling only — never the bench; the
    * formatted-explain render costs milliseconds per invocation), the
    * pre-pin physical plan is recorded per pin key so audits can read
    * the dataflow that actually executed inside the scope.
    */
  private val planLog = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def capturePlan(key: String, df: DataFrame): Unit =
    if (sys.props.contains("graft.plan.capture"))
      planLog.put(key, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)): Unit

  /** The last captured pre-pin plan for `key`, if capture is enabled. */
  def lastPlan(key: String): Option[String] = Option(planLog.get(key))

  /** Release only the pin registered under `key` (r16, the r15 advice:
    * specs that must clear ONE op's by-design pin before a leak
    * assertion release it by key, keeping every other pin — and any
    * genuine leak routed through ResultPins — on the witness surface).
    */
  def release(key: String): Unit = {
    val rdd = pins.remove(key)
    if (rdd != null) rdd.unpersist(false)
    val df = ckPins.remove(key)
    if (df != null) releaseCheckpoint(df)
  }

  /** Release every registered result pin (long-session / spec hygiene). */
  def releaseAll(): Unit = {
    import scala.jdk.CollectionConverters._
    pins.keySet().asScala.toList.foreach { k =>
      val rdd = pins.remove(k)
      if (rdd != null) rdd.unpersist(false)
    }
    ckPins.keySet().asScala.toList.foreach { k =>
      val df = ckPins.remove(k)
      if (df != null) releaseCheckpoint(df)
    }
  }
}
