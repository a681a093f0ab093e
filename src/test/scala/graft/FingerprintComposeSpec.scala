package graft

/** The fingerprint composition law, executed (r11): the whole-table
  * mod-2^62 hash sum must equal the sum of the per-partition hash sums
  * mod 2^62, row counts must add up, and min/max must be the extrema of
  * the partition extrema — so replica reconciliation can check 100 TB
  * partition-by-partition and trust that clean partitions compose to a
  * clean table.
  */
class FingerprintComposeSpec extends SparkSpec {

  test("etl_fingerprint_by_partition composes to etl_table_fingerprint") {
    val m = 4611686018427387904L
    val whole = SparkEntry.queries("etl_table_fingerprint")(spark, sf).collect()(0)
    val parts = SparkEntry.queries("etl_fingerprint_by_partition")(spark, sf).collect()
    assert(parts.length > 1, "expected more than one ship-month partition")
    assert(parts.map(_.getLong(1)).sum == whole.getLong(0), "row counts do not add up")
    // (Σ aᵢ mod m) mod m == (Σ aᵢ) mod m — fold with BigInt so the spec
    // itself cannot overflow.
    val folded = (parts.map(r => BigInt(r.getLong(2))).sum mod BigInt(m)).toLong
    assert(folded == whole.getLong(1),
      s"partition hash sums fold to $folded, table reports ${whole.getLong(1)}")
    assert(parts.map(_.getLong(3)).min == whole.getLong(2), "min of partition minima")
    assert(parts.map(_.getLong(4)).max == whole.getLong(3), "max of partition maxima")
  }
}
