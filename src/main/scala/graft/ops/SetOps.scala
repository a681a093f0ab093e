package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.G — set operations. The reference's multi-source merging
  * (synonyms from GenBank + model files in component_loading.py) and
  * old-minus-current ID diffing (cobradb/models.py :: DeprecatedID),
  * expressed as UNION/INTERSECT/EXCEPT which Catalyst plans as
  * aggregate-or-join (distinct union → hash agg; intersect/except →
  * left-semi/anti under distinct).
  */
object SetOps extends OpGroup {

  private def custNations(s: SparkSession, sf: String): DataFrame =
    Tables.customer(s, sf).select(col("c_nationkey").as("nationkey"))
  private def suppNations(s: SparkSession, sf: String): DataFrame =
    Tables.supplier(s, sf).select(col("s_nationkey").as("nationkey"))
  private def withName(s: SparkSession, sf: String, keys: DataFrame): DataFrame =
    keys.join(Tables.nation(s, sf), col("nationkey") === col("n_nationkey"))
      .select(col("nationkey"), col("n_name"))
      .orderBy("nationkey")

  private val unionDistinct = Op(
    "set_union_distinct",
    (s, sf) => withName(s, sf, custNations(s, sf).union(suppNations(s, sf)).distinct()),
    Some("""SELECT nationkey, n_name FROM (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey AS nationkey FROM supplier) t JOIN nation ON nationkey = n_nationkey ORDER BY nationkey"""),
  )

  private val intersect = Op(
    "set_intersect",
    (s, sf) => withName(s, sf, custNations(s, sf).intersect(suppNations(s, sf))),
    Some("""SELECT nationkey, n_name FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey AS nationkey FROM supplier) t JOIN nation ON nationkey = n_nationkey ORDER BY nationkey"""),
  )

  /** Filtered so the difference is non-empty at every sf (unfiltered,
    * suppliers cover all 25 nations and the op would be vacuous).
    */
  private val except = Op(
    "set_except",
    (s, sf) => withName(
      s, sf,
      Tables.customer(s, sf).filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, sf).filter(col("s_acctbal") > 9800)
          .select(col("s_nationkey").as("nationkey")))),
    Some("""SELECT nationkey, n_name FROM (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000 EXCEPT SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9800) t JOIN nation ON nationkey = n_nationkey ORDER BY nationkey"""),
  )

  /** BAG-semantics INTERSECT ALL (r6): multiplicity min(m, n) per key —
    * a genuinely different operator from the distinct variant (Catalyst
    * plans a count-aggregate + generate replication, not a semi-join
    * under distinct). Customers∩suppliers by nation key keeps one row
    * per MATCHED OCCURRENCE, the semantics audits need when row counts
    * carry meaning.
    */
  private val intersectAll = Op(
    "set_intersect_all",
    (s, sf) => withName(s, sf, custNations(s, sf).intersectAll(suppNations(s, sf))),
    Some("""SELECT nationkey, n_name FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL SELECT s_nationkey AS nationkey FROM supplier) t JOIN nation ON nationkey = n_nationkey ORDER BY nationkey"""),
  )

  /** BAG-semantics EXCEPT ALL (r6): multiplicity max(m − n, 0) — the
    * "what's left after consuming one match each" audit. Same filtered
    * inputs as set_except so the difference is non-vacuous at every sf.
    */
  private val exceptAll = Op(
    "set_except_all",
    (s, sf) => withName(
      s, sf,
      Tables.customer(s, sf).filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables.supplier(s, sf).filter(col("s_acctbal") > 9800)
          .select(col("s_nationkey").as("nationkey")))),
    Some("""SELECT nationkey, n_name FROM (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000 EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9800) t JOIN nation ON nationkey = n_nationkey ORDER BY nationkey"""),
  )

  val ops: Seq[Op] = Seq(unionDistinct, intersect, except, intersectAll,
    exceptAll)
}
