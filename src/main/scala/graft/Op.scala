package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One keyed operator of the engine: the exact contract row of SURVEY.md §2.
  *
  * `fn` is self-contained — it reads its own parquet inputs from the passed
  * `sfDir` — so the driver can run any subset. `oracle` is the equivalent
  * ANSI SQL for DuckDB over the same tables (bare file-stem table names);
  * None for ops whose output is not portably SQL-expressible (sketches,
  * map-typed output) — those are covered by scalatest instead.
  */
final case class Op(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

/** Mixin for operator-category objects; each contributes its ops to
  * [[SparkEntry]] via the explicit registry list there.
  */
trait OpGroup {
  def ops: Seq[Op]
}
