package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The stubbed decode path: the codec is fake (environment has none) but
  * the plumbing contract — schema, determinism, coverage — is real and
  * must hold for any codec swapped in.
  */
class MultimodalSpec extends SparkSpec {

  test("mm_decode_features has the declared schema and full coverage") {
    val df = SparkEntry.queries("mm_decode_features")(spark, sf)
    assert(df.schema == StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", FloatType, nullable = false),
    )))
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("mm_decode_features is deterministic across runs and partitionings") {
    val a = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    val b = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    assert(a.sameElements(b))
    val bounds = SparkEntry.queries("mm_decode_features")(spark, sf)
      .filter(col("width") < 64 || col("height") < 64 ||
        col("mean_luma") < 0 || col("mean_luma") >= 1).count()
    assert(bounds == 0)
  }
}
