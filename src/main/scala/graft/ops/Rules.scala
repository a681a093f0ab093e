package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._

/** §2.K — boolean-rule expansion, the one reference semantic previously
  * doc-only: cobradb's `gene_reaction_rule` strings ("(b0001 and b0002)
  * or b0003", cobradb/loading/parse.py) expand to the alternative
  * AND-complexes a reaction can run on. Here the rule text is SYNTHESIZED
  * deterministically from relational data (each order's lineitems:
  * positions ≤3 form one complex, >3 the other), parsed and distributed
  * to DNF by the custom [[graft.functions.ExplodeDnf]] Generator — and
  * because the synthesis is relational, the DuckDB oracle can compute the
  * expected expansion WITHOUT a parser, making the generator's whole
  * parse→DNF→canonicalize path hash-checked.
  *
  * Scale shape: one Generate over a grouped aggregate — linear, shuffles
  * once on the group key; the parse runs once per rule row inside the
  * executor (no driver involvement).
  */
object Rules extends OpGroup {

  private val ruleExpand = Op(
    "rule_expand_dnf",
    (s, sf) => {
      graft.functions.ExplodeDnf.register(s)
      // spread: the single-file scan is one partition, and the PARTIAL
      // collect_set otherwise runs there — 600k rows of set-building on
      // one core was the dominant cost of the r3 plan (3.3 s driver-run).
      val li = Tables.spread(s, Tables.lineitem(s, sf))
        .select(col("l_orderkey"),
          // Pre-tag each gene with its complex (0 = positions ≤3, 1 = >3)
          // so ONE collect_set carries both groups; struct sort order
          // (g, gene) makes each group's slice sorted after sort_array.
          struct(when(col("l_linenumber") <= 3, 0).otherwise(1).as("g"),
            concat(lit("P"), col("l_partkey")).as("gene")).as("item"))
      val rules = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("item"))).as("items"))
        .select(col("l_orderkey").as("o_orderkey"),
          // Either complex can be empty (orders whose line numbers are
          // all >3 or all ≤3): concat_ws skips the null alternative, so
          // the rule is built in one projection with each array_join
          // evaluated exactly once.
          concat_ws(" or ",
            when(expr("exists(items, x -> x.g = 0)"),
              concat(lit("("),
                array_join(expr("transform(filter(items, x -> x.g = 0), x -> x.gene)"), " and "),
                lit(")"))),
            when(expr("exists(items, x -> x.g = 1)"),
              concat(lit("("),
                array_join(expr("transform(filter(items, x -> x.g = 1), x -> x.gene)"), " and "),
                lit(")")))).as("rule"))
      rules.selectExpr("o_orderkey", "explode_dnf(rule) AS (combo_idx, genes)")
        .orderBy("o_orderkey", "combo_idx")
    },
    // The oracle reconstructs the same combos relationally: the ≤3 and >3
    // part sets per order, deduped via UNION (identical combos merge,
    // mirroring the parser's canonicalization), ranked lexicographically.
    Some("""WITH c1 AS (SELECT l_orderkey, array_to_string(list_sort(list_distinct(list('P' || CAST(l_partkey AS VARCHAR)))), ',') AS genes FROM lineitem WHERE l_linenumber <= 3 GROUP BY l_orderkey), c2 AS (SELECT l_orderkey, array_to_string(list_sort(list_distinct(list('P' || CAST(l_partkey AS VARCHAR)))), ',') AS genes FROM lineitem WHERE l_linenumber > 3 GROUP BY l_orderkey), u AS (SELECT * FROM c1 UNION SELECT * FROM c2) SELECT l_orderkey AS o_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY genes) AS INT) AS combo_idx, genes FROM u ORDER BY o_orderkey, combo_idx"""),
  )

  val ops: Seq[Op] = Seq(ruleExpand)
}
