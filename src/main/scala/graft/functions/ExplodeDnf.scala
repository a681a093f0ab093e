package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Boolean-rule → DNF expansion. The reference's gene_reaction_rule
  * semantic (cobradb stores rules like "(b0001 and b0002) or b0003" on
  * reactions; downstream analysis needs the alternative AND-complexes):
  * parse `and`/`or`/parens, distribute to disjunctive normal form, emit
  * one row per OR-alternative.
  *
  * Combos are canonicalized — members sorted and deduped, identical
  * combos merged, combos ordered lexicographically by their joined
  * string — so the expansion is deterministic and engine-portable. No
  * absorption (a superset combo is kept): the reference semantics treat
  * each syntactic alternative as a distinct complex.
  */
object DnfParser {
  /** DNF of `rule` as sorted, distinct, comma-joined combo strings. */
  def dnf(rule: String): Seq[String] = {
    val (combos, rest) = parseOr(tokenize(rule))
    require(rest.isEmpty, s"explode_dnf: trailing tokens $rest in '$rule'")
    combos.map(_.toSeq.sorted.mkString(",")).distinct.sorted
  }

  private def tokenize(s: String): List[String] =
    s.replace("(", " ( ").replace(")", " ) ").trim
      .split("\\s+").filter(_.nonEmpty).toList

  private def isKw(t: String, kw: String): Boolean = t.equalsIgnoreCase(kw)

  private def parseOr(t: List[String]): (List[Set[String]], List[String]) = {
    var (acc, rest) = parseAnd(t)
    while (rest.headOption.exists(isKw(_, "or"))) {
      val (nxt, r2) = parseAnd(rest.tail)
      acc = acc ::: nxt
      rest = r2
    }
    (acc, rest)
  }

  // AND over OR-alternatives distributes as the cartesian union product.
  private def parseAnd(t: List[String]): (List[Set[String]], List[String]) = {
    var (acc, rest) = parseFactor(t)
    while (rest.headOption.exists(isKw(_, "and"))) {
      val (nxt, r2) = parseFactor(rest.tail)
      acc = for (a <- acc; b <- nxt) yield a ++ b
      rest = r2
    }
    (acc, rest)
  }

  private def parseFactor(t: List[String]): (List[Set[String]], List[String]) = t match {
    case "(" :: rest =>
      val (inner, r2) = parseOr(rest)
      require(r2.headOption.contains(")"), s"explode_dnf: unbalanced parens in $t")
      (inner, r2.tail)
    case id :: rest if id != ")" && !isKw(id, "and") && !isKw(id, "or") =>
      (List(Set(id)), rest)
    case other =>
      throw new IllegalArgumentException(s"explode_dnf: unexpected token ${other.headOption}")
  }
}

/** Generator form (preference-order (c): whole-row expansion is generator
  * semantics, not a scalar): `explode_dnf(rule)` →
  * rows (combo_idx INT starting at 1, genes STRING comma-joined).
  * CodegenFallback — the parse is allocation-bound either way and runs
  * once per input row, not per pair.
  */
case class ExplodeDnf(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"explode_dnf requires a string argument, got ${child.dataType.simpleString}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("combo_idx", IntegerType, nullable = false),
    StructField("genes", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    if (s == null) Nil
    else DnfParser.dnf(s.toString).zipWithIndex.map { case (g, i) =>
      InternalRow(i + 1, UTF8String.fromString(g))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeDnf =
    copy(child = newChild)

  override def prettyName: String = "explode_dnf"
}

object ExplodeDnf {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_dnf", exprs => {
        graft.GraftExtensions.checkArity(
          "explode_dnf", "explode_dnf(rule STRING)", 1, exprs)
        ExplodeDnf(exprs.head)
      }, "scala_udf")
}
