package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Edge-case properties of the SCD2 point-in-time lookup that the
  * fixture oracle can't exercise: same-microsecond state changes
  * produce a zero-width version that must never match, boundary facts
  * must land in exactly one version, and the left join must preserve
  * fact cardinality.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms) // distinct millisecond instants

  test("point-in-time lookup: unique match under same-timestamp changes and boundary facts") {
    // user 1: states A@t10, then TWO changes at the same instant t20
    //   (B then C by event_id order → B is a zero-width version),
    //   purchases exactly at t10, t15, t20, t30, and one pre-history
    //   purchase at t5.
    val ev = Seq(
      (1L, ts(10), 1L, "view", 0.0, ""),     // state A (view)
      (2L, ts(20), 1L, "click", 0.0, ""),    // state B — zero width
      (3L, ts(20), 1L, "error", 0.0, ""),    // state C from t20
      (100L, ts(5), 1L, "purchase", 1.0, ""),
      (101L, ts(10), 1L, "purchase", 1.0, ""),
      (102L, ts(15), 1L, "purchase", 1.0, ""),
      (103L, ts(20), 1L, "purchase", 1.0, ""),
      (104L, ts(30), 1L, "purchase", 1.0, ""),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val out = ops.EtlLoad.scd2PointInTimeFrom(ev).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out.size == 5, s"left join must preserve the 5 purchases, got ${out.size}")
    assert(out(100L).isEmpty, "pre-history purchase must have NULL state")
    assert(out(101L).contains("view"), "boundary fact at valid_from lands in that version")
    assert(out(102L).contains("view"))
    assert(out(103L).contains("error"),
      "fact at a double-change instant must hit the surviving (non-zero-width) version")
    assert(out(104L).contains("error"))
  }

  test("point-in-time lookup preserves fact cardinality on the fixture") {
    val out = SparkEntry.queries("join_scd2_pointintime")(spark, sf)
    val nOut = out.count()
    val nFacts = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(nOut == nFacts, s"$nOut output rows for $nFacts purchase facts")
    assert(out.select("event_id").distinct().count() == nFacts,
      "a fact matched more than one dimension version")
  }
}
