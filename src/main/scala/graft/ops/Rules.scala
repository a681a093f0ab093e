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
      val li = Tables.lineitem(s, sf)
        .select(col("l_orderkey"), col("l_linenumber"),
          concat(lit("P"), col("l_partkey")).as("gene"))
      val rules = li.groupBy(col("l_orderkey"))
        .agg(
          sort_array(collect_set(when(col("l_linenumber") <= 3, col("gene")))).as("g1"),
          sort_array(collect_set(when(col("l_linenumber") > 3, col("gene")))).as("g2"))
        .withColumn("rule",
          // Either complex can be empty (the synthetic corpus has orders
          // whose line numbers are all >3 or all ≤3) — emit only the
          // non-empty alternatives.
          when(size(col("g2")) === 0,
            concat(lit("("), array_join(col("g1"), " and "), lit(")")))
            .when(size(col("g1")) === 0,
              concat(lit("("), array_join(col("g2"), " and "), lit(")")))
            .otherwise(concat(
              lit("("), array_join(col("g1"), " and "),
              lit(") or ("), array_join(col("g2"), " and "), lit(")"))))
      rules.select(col("l_orderkey").as("o_orderkey"), col("rule"))
        .selectExpr("o_orderkey", "explode_dnf(rule) AS (combo_idx, genes)")
        .orderBy("o_orderkey", "combo_idx")
    },
    // The oracle reconstructs the same combos relationally: the ≤3 and >3
    // part sets per order, deduped via UNION (identical combos merge,
    // mirroring the parser's canonicalization), ranked lexicographically.
    Some("""WITH c1 AS (SELECT l_orderkey, array_to_string(list_sort(list_distinct(list('P' || CAST(l_partkey AS VARCHAR)))), ',') AS genes FROM lineitem WHERE l_linenumber <= 3 GROUP BY l_orderkey), c2 AS (SELECT l_orderkey, array_to_string(list_sort(list_distinct(list('P' || CAST(l_partkey AS VARCHAR)))), ',') AS genes FROM lineitem WHERE l_linenumber > 3 GROUP BY l_orderkey), u AS (SELECT * FROM c1 UNION SELECT * FROM c2) SELECT l_orderkey AS o_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY genes) AS INT) AS combo_idx, genes FROM u ORDER BY o_orderkey, combo_idx"""),
  )

  val ops: Seq[Op] = Seq(ruleExpand)
}
