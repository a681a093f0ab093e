package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.TopKAgg

/** Unit/property coverage for the custom functions — the one area where
  * internal states (partial-aggregation merges, kernel heaps) exist that
  * the end-to-end oracle can't isolate.
  */
class FunctionsSpec extends SparkSpec {

  private def gen[T](g: Gen[T], seed: Long): Option[T] =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))

  private def referenceTopK(xs: List[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.sortBy { case (id, m) => (-m, id) }.take(k)

  test("TopKAgg merge is split-invariant (scalacheck): any partitioning = global sort-take") {
    val pair = for {
      id <- Gen.choose(0L, 50L)
      m <- Gen.choose(0, 100).map(_ / 10.0) // coarse values force ties
    } yield (id, m)
    val rowsGen = Gen.listOfN(40, pair)
    (0 until 100).foreach { seed =>
      val rows = gen(rowsGen, seed.toLong).getOrElse(Nil)
      val splitAt = gen(Gen.choose(0, rows.size), seed + 1000L).getOrElse(0)
      val agg = new TopKAgg(5)
      val (l, r) = rows.splitAt(splitAt)
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.finish(agg.merge(bufL, bufR))
      assert(merged == referenceTopK(rows, 5),
        s"seed=$seed split=$splitAt rows=$rows")
    }
  }

  test("vec_dot equals an independent per-element reference on random vectors") {
    graft.functions.FloatVecDot.register(spark)
    val rnd = new scala.util.Random(7)
    val n = 40
    val mat = Array.fill(n)(Array.fill(8)(rnd.nextFloat() - 0.5f))
    import spark.implicits._
    val df = mat.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("id", "v")
    val got = df.selectExpr("id", "vec_dot(v, v) AS d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    mat.zipWithIndex.foreach { case (v, i) =>
      var acc = 0.0
      v.foreach(x => acc += x.toDouble * x.toDouble)
      assert(got(i.toLong) == acc, s"vector $i")
    }
  }

  test("vec_dot returns null on null input and errors on wrong types") {
    graft.functions.FloatVecDot.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(cast(1.0 as float))) AS d")
      .first()
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1), array(2))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"))
  }

  test("simhash60 equals the per-bit HOF formulation on random token hashes") {
    graft.functions.SimHash60.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(40))(rnd.nextLong() & ((1L << 60) - 1)))
    }
    val df = rows.toDF("id", "hs")
    val got = df.selectExpr("id", "simhash60(hs) AS sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.selectExpr("id",
      "aggregate(sequence(0, 59), 0L, (acc, j) -> acc | if(aggregate(hs, 0, (a, h) -> a + if(((h >> j) & 1) = 1, 1, -1)) > 0, shiftleft(1L, j), 0L)) AS sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // Interpreted path (eval) agrees with codegen: force via a literal.
    val one = spark.sql("SELECT simhash60(array(CAST(7 AS BIGINT))) AS sh").first().getLong(0)
    assert(one == 7L)
    assert(spark.sql("SELECT simhash60(CAST(NULL AS ARRAY<BIGINT>)) AS sh").first().isNullAt(0))
  }

}
