package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.1.
  *
  * Every operator of the engine registers here as a keyed
  * `(SparkSession, sfDir) => DataFrame`; the oracle map carries the
  * DuckDB-equivalent SQL for the driver's correctness gate. Keys and
  * semantics are the SURVEY.md §2 inventory.
  */
object SparkEntry {
  /** The operator registry: each OpGroup contributes its §2 section. */
  private val groups: Seq[OpGroup] = Seq(
    ops.Scans,
    ops.Filters,
    ops.Aggs,
    ops.Joins,
    ops.SetOps,
    ops.Windows,
    ops.Sorts,
    ops.Scalars,
    ops.Dedup,
    ops.Clusters,
    ops.Vectors,
    ops.TextOps,
    ops.Multimodal,
    ops.Streaming,
    ops.UdfOps,
    ops.SqlFrontend,
    ops.EtlLoad,
    ops.Rules,
    ops.Polymorphic,
    ops.Sampling,
    ops.Analytics,
    ops.Sketches,
    ops.Drift,
    ops.Bpe,
  )

  private lazy val all: Seq[Op] = {
    val out = groups.flatMap(_.ops)
    val dup = out.groupBy(_.key).collect { case (k, v) if v.size > 1 => k }
    require(dup.isEmpty, s"duplicate op keys: ${dup.mkString(",")}")
    out
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The 5-way
    * star join is the `dump_model` homage (SURVEY §2.C).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("join_multiway_inner")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(o => o.key -> o.fn).toMap

  /** DuckDB-runnable ANSI SQL per oracled key (bare file-stem table names;
    * the driver binds them to `{sfDir}/{name}.parquet`). Ops without a
    * portable SQL equivalent are omitted → rows-only check.
    */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(o => o.oracle.map(o.key -> _)).toMap
}
