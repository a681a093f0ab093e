package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DnfParser

/** DnfParser unit + property coverage: fixed expansions, canonicalization,
  * and the semantic theorem — the DNF is logically EQUIVALENT to the rule
  * (a random truth assignment satisfies the parsed rule iff it satisfies
  * some combo), checked over random rule trees.
  */
class DnfSpec extends AnyFunSuite {

  test("fixed expansions") {
    assert(DnfParser.dnf("b0001") == Seq("b0001"))
    assert(DnfParser.dnf("(b0001 and b0002) or b0003") == Seq("b0001,b0002", "b0003"))
    assert(DnfParser.dnf("b1 and (b2 or b3)") == Seq("b1,b2", "b1,b3"))
    assert(DnfParser.dnf("(a or b) and (c or d)") == Seq("a,c", "a,d", "b,c", "b,d"))
    assert(DnfParser.dnf("((x))") == Seq("x"))
    assert(DnfParser.dnf("A AND b Or c") == Seq("A,b", "c"), "keywords case-insensitive, idents not")
  }

  test("canonicalization: dedup within and across combos, sorted output") {
    assert(DnfParser.dnf("a and a") == Seq("a"))
    assert(DnfParser.dnf("(a and b) or (b and a)") == Seq("a,b"))
    assert(DnfParser.dnf("z or a") == Seq("a", "z"))
  }

  test("malformed rules throw") {
    intercept[Exception](DnfParser.dnf("(a and b"))
    intercept[Exception](DnfParser.dnf("a and or b"))
    intercept[Exception](DnfParser.dnf(""))
  }

  // Random rule trees over 4 variables.
  private sealed trait T
  private case class V(n: String) extends T
  private case class And(l: T, r: T) extends T
  private case class Or(l: T, r: T) extends T

  private val genTree: Gen[T] = {
    val leaf = Gen.oneOf("a", "b", "c", "d").map(V.apply)
    def tree(depth: Int): Gen[T] =
      if (depth == 0) leaf
      else Gen.frequency(
        2 -> leaf,
        3 -> (for { l <- tree(depth - 1); r <- tree(depth - 1) } yield And(l, r)),
        3 -> (for { l <- tree(depth - 1); r <- tree(depth - 1) } yield Or(l, r)))
    tree(4)
  }

  private def render(t: T): String = t match {
    case V(n) => n
    case And(l, r) => s"(${render(l)} and ${render(r)})"
    case Or(l, r) => s"(${render(l)} or ${render(r)})"
  }

  private def evalTree(t: T, truth: Set[String]): Boolean = t match {
    case V(n) => truth(n)
    case And(l, r) => evalTree(l, truth) && evalTree(r, truth)
    case Or(l, r) => evalTree(l, truth) || evalTree(r, truth)
  }

  test("property: DNF is logically equivalent to the rule") {
    val genCase = for {
      t <- genTree
      truth <- Gen.listOfN(4, Gen.oneOf(true, false))
    } yield (t, Seq("a", "b", "c", "d").zip(truth).collect { case (v, true) => v }.toSet)
    (0 until 300).foreach { i =>
      val (t, truth) = genCase(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .getOrElse(fail(s"gen failed at seed $i"))
      val combos = DnfParser.dnf(render(t)).map(_.split(",").toSet)
      assert(combos.exists(_.subsetOf(truth)) == evalTree(t, truth),
        s"equivalence broken for ${render(t)} under $truth")
    }
  }
}
