package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._
import parity.r6

/** §1.2's polymorphic-inheritance mapping as an executable op — the one
  * data-model row that previously had no keyed witness. The reference
  * subclasses via a discriminator column (cobradb/models.py ::
  * GenomeRegion type → Gene; :: Component type → Metabolite); the
  * Spark-native mapping (SURVEY §1.3) is a single columnar DataFrame
  * plus FILTERED PER-SUBTYPE VIEWS — never a Dataset[sealed trait],
  * which would de-columnarize every scan.
  */
object Polymorphic extends OpGroup {

  /** events as the base "GenomeRegion" table (discriminator =
    * event_type, 5 values). Two subtypes carry extra derived columns:
    * purchase → gross_value (value + 20% fee), click → k_bucket decoded
    * from the JSON payload. Each subtype is a real filtered view with
    * its own derivations; the reassembled output is the
    * single-table-inheritance layout (subtype columns NULL where
    * inapplicable) via unionByName(allowMissingColumns) — schema
    * reconciliation Spark resolves at analysis time, no row-level cost.
    * Scale shape: three narrow filter+project passes over one scan
    * (Catalyst merges the filters into partition-local predicates), one
    * union — no shuffle until the final sort.
    */
  private val polySubtypes = Op(
    "schema_polymorphic_subtypes",
    (s, sf) => {
      val base = Tables.events(s, sf)
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("value"), col("props"))
      val purchase = base.filter(col("event_type") === "purchase")
        .withColumn("gross_value", r6(col("value") * 1.2))
      val click = base.filter(col("event_type") === "click")
        .withColumn("k_bucket",
          floor(get_json_object(col("props"), "$.k").cast("int") / 10).cast("int"))
      val rest = base.filter(!col("event_type").isin("purchase", "click"))
      purchase.unionByName(click, allowMissingColumns = true)
        .unionByName(rest, allowMissingColumns = true)
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("value"), col("gross_value"), col("k_bucket"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, event_type, user_id, value, CASE WHEN event_type = 'purchase' THEN ROUND(1e-9 + value * 1.2, 6) END AS gross_value, CASE WHEN event_type = 'click' THEN CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS INT) END AS k_bucket FROM events ORDER BY event_id"""),
  )

  val ops: Seq[Op] = Seq(polySubtypes)
}
