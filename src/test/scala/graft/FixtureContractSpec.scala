package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture contract: the events reader must tolerate every ts encoding the
  * driver corpus has shipped — INT64 TIMESTAMP(NANOS) (surfaces as a long
  * under the legacy conf), TIMESTAMP micros (UTC-adjusted), and
  * TIMESTAMP_NTZ micros — and normalize all of them to the SAME instants.
  * The r8 fixture regeneration flipped nanos→micros and silently broke 55
  * operators because the reader hard-coded one encoding; this spec turns
  * any future drift into one pinpointed failure instead.
  */
class FixtureContractSpec extends SparkSpec {

  private val instantsUs: Seq[Long] = Seq(
    1706628453123456L, // 2024-01-30T14:47:33.123456Z
    1706628454000000L,
    1706628455999999L,
    1709999999000001L,
    1710000000000000L,
  )

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_fixture_$tag").toFile
    d.deleteOnExit()
    d.getPath
  }

  /** Read back `path` through the shared normalizer and return epoch-micros. */
  private def normalizedMicros(path: String): Seq[Long] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = Tables.normalizeEventsTs(spark.read.parquet(path))
    assert(df.schema("ts").dataType == TimestampType,
      s"normalizer must land on TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts")).as("us")).orderBy("us")
      .collect().map(_.getLong(0)).toSeq
  }

  test("normalizeEventsTs: nanos-as-long encoding (pre-r8 fixtures)") {
    // A genuine TIMESTAMP(NANOS) file surfaces as LongType under the legacy
    // conf; a plain INT64 nanos column takes the identical reader branch.
    val dir = tmpDir("nanos")
    spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.map(us => Row(us * 1000L))),
      StructType(Seq(StructField("ts", LongType))),
    ).write.mode("overwrite").parquet(dir)
    assert(normalizedMicros(dir) == instantsUs.sorted)
  }

  test("normalizeEventsTs: TIMESTAMP micros encoding") {
    val dir = tmpDir("micros")
    spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.map(us => Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000, (us % 1000000) * 1000))))),
      StructType(Seq(StructField("ts", TimestampType))),
    ).write.mode("overwrite").parquet(dir)
    assert(normalizedMicros(dir) == instantsUs.sorted)
  }

  test("normalizeEventsTs: TIMESTAMP_NTZ micros encoding (r8+ fixtures)") {
    // Session tz is UTC, so the NTZ→TS cast must be a relabel, not a shift.
    val dir = tmpDir("ntz")
    spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.map(us =>
        Row(java.time.LocalDateTime.ofEpochSecond(
          us / 1000000, ((us % 1000000) * 1000).toInt, java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampNTZType))),
    ).write.mode("overwrite").parquet(dir)
    assert(normalizedMicros(dir) == instantsUs.sorted)
  }

  test("normalizeEventsTs: all three encodings agree on random instants (property)") {
    // Deterministic pseudo-random micros across 1970–2200 (including
    // sub-second tails) — every encoding of the same instant set must
    // normalize to the identical sorted sequence.
    val rnd = new scala.util.Random(9)
    val us = Seq.fill(200)(math.abs(rnd.nextLong()) % 7258118400000000L)
    val dirs = Map(
      "long" -> tmpDir("prop_long"), "ts" -> tmpDir("prop_ts"), "ntz" -> tmpDir("prop_ntz"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(us.map(u => Row(u * 1000L))),
      StructType(Seq(StructField("ts", LongType))),
    ).write.mode("overwrite").parquet(dirs("long"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(us.map(u => Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(u / 1000000, (u % 1000000) * 1000))))),
      StructType(Seq(StructField("ts", TimestampType))),
    ).write.mode("overwrite").parquet(dirs("ts"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(us.map(u =>
        Row(java.time.LocalDateTime.ofEpochSecond(
          u / 1000000, ((u % 1000000) * 1000).toInt, java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampNTZType))),
    ).write.mode("overwrite").parquet(dirs("ntz"))
    val expected = us.sorted
    dirs.foreach { case (enc, dir) =>
      assert(normalizedMicros(dir) == expected, s"encoding $enc diverged")
    }
  }

  test("normalizeEventsTs: rejects an unsupported ts type loudly") {
    val df = spark.range(1).select(col("id").cast(StringType).as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(df))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("driver fixture: events reader yields 2024-era TimestampType at sf0.001") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    val Row(lo: java.sql.Timestamp, hi: java.sql.Timestamp) =
      ev.agg(min("ts"), max("ts")).head()
    // The corpus is a ~30-day 2024 window; a unit-factor bug (nanos read as
    // micros or vice versa) lands in 1970 or year ~56k — both far outside.
    assert(lo.getTime > 1500000000000L && hi.getTime < 2500000000000L,
      s"events.ts range [$lo, $hi] outside plausible 2024-era bounds — encoding drift?")
  }

  test("embeddings reader normalizes both float and double element widths") {
    // Live fixture (whatever width it ships) must land on array<float>.
    assert(Tables.embeddings(spark, sf).schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    // A double-element vintage takes the cast branch with identical values
    // (these doubles are exactly float-representable).
    val sfDir = tmpDir("embdouble") // acts as a miniature sf directory
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(0.5d, -2.25d, 8.0d), 0),
        Row(2L, Seq(1.5d, 0.0d, -0.125d), 1))),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)),
        StructField("label", IntegerType))),
    ).write.mode("overwrite").parquet(s"$sfDir/embeddings.parquet")
    val out = Tables.embeddings(spark, sfDir)
    assert(out.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    val v1 = out.filter(col("vec_id") === 1L)
      .select(col("embedding")).head.getSeq[Float](0)
    assert(v1 == Seq(0.5f, -2.25f, 8.0f))
  }

  test("driver fixture: core table schemas at sf0.001 match the engine contract") {
    // Set the legacy conf BEFORE the direct events read: on a nanos-vintage
    // fixture the raw scan otherwise throws PARQUET_TYPE_ILLEGAL at schema
    // resolution — and this test must not depend on an earlier test in the
    // suite having set the sticky session conf first.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def names(t: String): Seq[String] =
      spark.read.parquet(s"$sf/$t.parquet").schema.fieldNames.toSeq
    assert(names("events").toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(names("documents").contains("doc_id"))
    assert(names("embeddings").toSet == Set("vec_id", "embedding", "label"))
    assert(names("lineitem").contains("l_orderkey"))
    assert(names("orders").contains("o_orderkey"))
  }
}
