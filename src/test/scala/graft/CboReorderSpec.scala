package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Stats-driven join reordering witnessed, not hand-waved (docs/scale.md):
  * at 100 TB a 5-way join's execution order is the difference between
  * plans, and AQE only re-plans at shuffle boundaries — the INITIAL join
  * order comes from CBO over ANALYZE'd statistics. This spec runs the
  * production sequence (saveAsTable → ANALYZE TABLE … FOR ALL COLUMNS →
  * cbo+joinReorder on) and asserts the optimizer moves the selective
  * dimension join (orders ⋈ customer filtered to one mktsegment) ahead of
  * the syntactically-first fact join (lineitem ⋈ orders), while the same
  * query WITHOUT joinReorder keeps the written order.
  */
class CboReorderSpec extends SparkSpec {

  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().map(_.toString.split("\n").head)
      .map(l => Seq("cbo_lineitem", "cbo_orders", "cbo_customer").find(l.contains).getOrElse("?"))

  test("ANALYZE stats + CBO reorder the join; without joinReorder the written order stays") {
    val prev = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // Disable broadcast estimation shortcuts so the reorder decision is
      // purely the cost model's — the thing under test.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq("lineitem", "orders", "customer").foreach { t =>
        spark.read.parquet(s"$sf/$t.parquet").write.mode("overwrite").saveAsTable(s"cbo_$t")
        spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // Row-count stats actually landed in the catalog.
      val stats = spark.sql("DESC EXTENDED cbo_lineitem").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(stats.get("Statistics").exists(_.contains("rows")), s"no row stats: $stats")

      val q = """SELECT c.c_mktsegment, count(*) AS n
                 FROM cbo_lineitem l
                 JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
                 JOIN cbo_customer c ON o.o_custkey = c.c_custkey
                 WHERE c.c_mktsegment = 'BUILDING'
                 GROUP BY c.c_mktsegment"""
      val reordered = leafOrder(spark.sql(q).queryExecution.optimizedPlan)
      assert(reordered == Seq("cbo_orders", "cbo_customer", "cbo_lineitem"),
        s"CBO did not move the selective dim join first: $reordered")

      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val syntactic = leafOrder(spark.sql(q).queryExecution.optimizedPlan)
      assert(syntactic == Seq("cbo_lineitem", "cbo_orders", "cbo_customer"),
        s"unexpected baseline order: $syntactic")

      // Reordering preserves the result.
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val n = spark.sql(q).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val n2 = spark.sql(q).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(n == n2 && n.nonEmpty)
    } finally {
      prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      Seq("lineitem", "orders", "customer").foreach(t => spark.sql(s"DROP TABLE IF EXISTS cbo_$t"))
    }
  }
}
