package graft

import org.apache.spark.sql.functions._

/** Null-key and null-aggregate semantics over synthetic data — the corpus
  * is null-free (FIXTURES.md), so the join family's outer-null behavior,
  * count(col) vs count(*), and `=` vs `<=>` (null-safe equality) are
  * otherwise unexercised. These pin the semantics every operator family
  * relies on when real data (which always has nulls) arrives.
  */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parent = Seq(
    (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")),
  ).toDF("pid", "k")

  private lazy val child = Seq(
    (Some(1L), Some(10.0)), (Some(1L), Some(5.0)),
    (Some(2L), None), // value-null row: counts in count(*), not count(value)
    (Some(9L), Some(1.0)), // orphan — never joins
    (None, Some(7.0)), // key-null row: joins nothing under `=`
  ).toDF("cid", "value")

  test("left outer join: unmatched parents keep NULL sum and zero count(col)") {
    val got = parent.join(child, col("pid") === col("cid"), "left_outer")
      .groupBy(col("pid"))
      .agg(
        count(col("cid")).as("n_matched"), // per-column count skips nulls
        count(lit(1)).as("n_rows"), // count(*) counts the padded row
        sum(col("value")).as("sum_value"),
      )
      .orderBy("pid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, Some(15.0)),
      (2L, 1L, 1L, None), // matched once, but the matched value is NULL → SUM NULL
      (3L, 0L, 1L, None), // unmatched: count(col)=0 but count(*)=1
      (4L, 0L, 1L, None),
    ))
  }

  test("equi-join drops null keys; null-safe <=> matches them") {
    val withNullKey = Seq((Some("a"), 1L), (None, 2L)).toDF("k", "n")
    val other = Seq((Some("a"), 10L), (None, 20L)).toDF("k2", "m")
    val eq = withNullKey.join(other, col("k") === col("k2")).count()
    assert(eq == 1L) // NULL = NULL is NULL → the null-key rows never meet
    val nullSafe = withNullKey.join(other, col("k") <=> col("k2")).count()
    assert(nullSafe == 2L) // <=> treats NULL as equal to NULL
  }

  test("semi/anti joins treat null keys as non-matching") {
    val semi = parent.join(child, col("pid") === col("cid"), "left_semi")
      .select("pid").as[Long].collect().sorted
    assert(semi.toSeq == Seq(1L, 2L))
    val anti = parent.join(child, col("pid") === col("cid"), "left_anti")
      .select("pid").as[Long].collect().sorted
    assert(anti.toSeq == Seq(3L, 4L)) // null-key child row excludes nothing
  }

  test("aggregates: countDistinct skips nulls, sum of all-null group is NULL not 0") {
    val df = Seq(
      ("g1", Option.empty[Double]), ("g1", None), ("g2", Some(1.0)), ("g2", None),
    ).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(sum(col("v")).as("s"), count(col("v")).as("c"),
        countDistinct(col("v")).as("cd"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("g1", None, 0L, 0L), ("g2", Some(1.0), 1L, 1L)))
  }

  test("grouping keys: NULL forms its own group and sorts NULLS FIRST by default") {
    val keys = parent.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(col("k")) // Spark default asc = nulls first (DuckDB defaults last)
      .select("k").collect().map(r => Option(r.getString(0)))
    assert(keys.toSeq == Seq(None, Some("a"), Some("b")))
  }
}
