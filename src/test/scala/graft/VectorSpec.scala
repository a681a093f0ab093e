package graft

import org.apache.spark.sql.functions._

/** Properties of the vector ops the oracle can't check (vec_ann_ivf has
  * no SQL equivalent by design — it's the approximate scale path).
  */
class VectorSpec extends SparkSpec {

  test("vec_ann_ivf returns at most 5 ranked neighbors per query, sims in [-1,1]") {
    val ann = SparkEntry.queries("vec_ann_ivf")(spark, sf).cache()
    val badGroups = ann.groupBy("a_vec_id").agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .filter(col("n") > 5 || col("mx") > 5).count()
    assert(badGroups == 0)
    val badSims = ann.filter(col("cos_sim") < -1.0 || col("cos_sim") > 1.0).count()
    assert(badSims == 0)
    assert(ann.select("a_vec_id").distinct().count() == Tables.embeddings(spark, sf).count())
  }

  test("vec_ann_ivf top-1 never beats the exact top-1 (subset property)") {
    val ann = SparkEntry.queries("vec_ann_ivf")(spark, sf)
      .filter(col("rk") === 1).select(col("a_vec_id"), col("cos_sim").as("ann_sim"))
    val exact = SparkEntry.queries("vec_cosine_topk")(spark, sf)
      .filter(col("rk") === 1).select(col("a_vec_id"), col("cos_sim").as("exact_sim"))
    val violations = ann.join(exact, "a_vec_id")
      .filter(col("ann_sim") > col("exact_sim") + 1e-9).count()
    assert(violations == 0)
  }

  test("FloatVecDot matches the interpreted HOF computation exactly") {
    graft.functions.FloatVecDot.register(spark)
    val diff = Tables.embeddings(spark, sf)
      .withColumn("custom", expr("vec_dot(embedding, embedding)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"))
      .filter(col("custom") =!= col("hof"))
      .count()
    assert(diff == 0, "codegen'd dot product diverges from sequential HOF fold")
  }
}
