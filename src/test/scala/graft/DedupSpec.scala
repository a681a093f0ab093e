package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Invariants of the dedup/similarity ops — the properties cobradb's
  * hash_reaction relies on (SURVEY §5.2.3), checked against the actual
  * Spark expressions, not a reimplementation.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** The exact canonical-hash expression used by dedup_canonical_hash_sorted. */
  private def canonHash(c: String) = md5(concat_ws(" ", sort_array(split(lower(col(c)), " "))))

  test("canonical hash is invariant under token permutation (scalacheck gen)") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val doc = Gen.nonEmptyListOf(word)
    val rnd = new scala.util.Random(42)
    // 50 generated docs, shuffled, hashed in ONE Spark job.
    val cases = (0 until 50).flatMap { i =>
      doc.apply(Gen.Parameters.default.withSize(1 + i % 20), org.scalacheck.rng.Seed(i.toLong))
        .map(ws => (ws.mkString(" "), rnd.shuffle(ws).mkString(" ")))
    }
    assert(cases.size >= 40, "generator drought")
    val bad = cases.toDF("text", "text2")
      .select(canonHash("text").as("h1"), canonHash("text2").as("h2"))
      .filter(col("h1") =!= col("h2"))
      .count()
    assert(bad == 0)
  }

  test("sim_jaccard_pairs values are in (0.9, 1] range and symmetric keys ordered") {
    val rows = SparkEntry.queries("sim_jaccard_pairs")(spark, sf)
      .select("a_doc_id", "b_doc_id", "jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.9 && j <= 1.0)
    }
  }

  test("minhash 8/8 agreement implies high exact jaccard on average") {
    // MinHash is probabilistic: P[all 8 bands agree] = J^8, so individual
    // false positives are expected (a J=0.44 pair slips through with
    // p≈1.5e-3, and there are ~10^5 pairs). The sound assertion is on
    // the aggregate: selected pairs average far above the corpus mean.
    val mh = SparkEntry.queries("sim_minhash_portable")(spark, sf)
      .select(col("a_doc_id"), col("b_doc_id"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(lower(col("text")), " ")).as("toks"))
    val joined = mh
      .join(docs.select(col("doc_id").as("a_doc_id"), col("toks").as("a_toks")), "a_doc_id")
      .join(docs.select(col("doc_id").as("b_doc_id"), col("toks").as("b_toks")), "b_doc_id")
      .withColumn("j",
        size(array_intersect(col("a_toks"), col("b_toks"))).cast("double") /
          size(array_union(col("a_toks"), col("b_toks"))))
    val Array(meanJ, minJ) = joined.agg(avg(col("j")), min(col("j")))
      .first().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(meanJ >= 0.7, s"mean jaccard of 8/8 pairs only $meanJ")
    assert(minJ >= 0.25, s"8/8 pair with near-zero jaccard $minJ")
  }

  test("minhash LSH pairs are a high-recall subset of the brute-force pairs") {
    // Soundness: every LSH pair must ALSO pass the exact-Jaccard verify,
    // so LSH ⊆ brute force is a hard invariant (the candidate stage can
    // only lose pairs, never invent them). Recall is probabilistic:
    // 1−(1−j⁴)⁴ ≥ 0.986 at the 0.9 threshold — assert ≥ 0.95 observed.
    val brute = SparkEntry.queries("sim_jaccard_pairs")(spark, sf)
      .select("a_doc_id", "b_doc_id", "jaccard")
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("a_doc_id", "b_doc_id", "jaccard")
    val extra = lsh.exceptAll(brute).count()
    assert(extra == 0, s"$extra LSH pairs not in brute-force output")
    val nBrute = brute.count().toDouble
    val nLsh = lsh.count().toDouble
    assert(nLsh / nBrute >= 0.95, s"LSH recall ${nLsh / nBrute}")
  }

  test("banded simhash Hamming search is EXACT (equals the all-pairs filter)") {
    import org.apache.spark.sql.functions._
    // Pigeonhole: ≤8 differing bits over 9 disjoint bands forces ≥1
    // identical band, so the band-bucketed op must return EXACTLY the
    // brute-force all-pairs result — not a probabilistic subset.
    val banded = SparkEntry.queries("dedup_simhash_hamming")(spark, sf)
    val sh = SparkEntry.queries("dedup_simhash")(spark, sf)
    val a = sh.select(col("doc_id").as("a_doc_id"), col("simhash").as("a_sh"))
    val b = sh.select(col("doc_id").as("b_doc_id"), col("simhash").as("b_sh"))
    val brute = a.join(b, col("a_doc_id") < col("b_doc_id"))
      .filter(expr("bit_count(a_sh ^ b_sh)") <= 8)
      .select(col("a_doc_id"), col("b_doc_id"),
        expr("bit_count(a_sh ^ b_sh)").cast("int").as("hamming"))
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty,
      "banded Hamming search diverges from brute force")
    assert(banded.count() > 0, "radius-8 search is vacuous at this tier")
  }

  test("blocked containment join is LOSSLESS (equals the all-pairs filter)") {
    // The prefix+positional candidate stage must be exact, not a recall
    // curve: prefix filtering guarantees the lowest-ranked common token
    // of any qualifying pair is probed, first-collision emits it exactly
    // once — so blocked == brute force is a hard invariant.
    val blocked = SparkEntry.queries("sim_containment_pairs")(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(lower(col("text")), " ")).as("toks"))
    val a = docs.select(col("doc_id").as("a_doc_id"), col("toks").as("a_toks"))
    val b = docs.select(col("doc_id").as("b_doc_id"), col("toks").as("b_toks"))
    val brute = a.join(b, col("a_doc_id") < col("b_doc_id"))
      .withColumn("i", size(array_intersect(col("a_toks"), col("b_toks"))))
      .withColumn("mn", least(size(col("a_toks")), size(col("b_toks"))))
      .filter(col("i").cast("double") / col("mn") >= 0.9)
      .select(col("a_doc_id"), col("b_doc_id"),
        ops.parity.r6(col("i").cast("double") / col("mn")).as("containment"))
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty,
      "blocked containment diverges from brute force")
    assert(blocked.count() > 0, "containment search is vacuous at this tier")
  }

  test("editdist name-pair memoization is LOSSLESS within brands") {
    // The memoized plan (levenshtein once per distinct ordered name
    // pair, expanded back through equi-joins) must equal the naive
    // within-brand all-pairs formulation exactly — the Δlen prefilter
    // is a true lower bound on edit distance and the expansion joins
    // must neither drop nor duplicate part pairs.
    val blocked = SparkEntry.queries("sim_editdist_brand_pairs")(spark, sf)
    val p = Tables.part(spark, sf).select(col("p_partkey"), col("p_name"), col("p_brand"))
    val a = p.select(col("p_brand"), col("p_partkey").as("a_partkey"), col("p_name").as("a_name"))
    val b = p.select(col("p_brand"), col("p_partkey").as("b_partkey"), col("p_name").as("b_name"))
    val naive = a.join(b, Seq("p_brand"))
      .filter(col("a_partkey") < col("b_partkey"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 3)
      .select(col("p_brand"), col("a_partkey"), col("b_partkey"),
        col("a_name"), col("b_name"), col("dist"))
    assert(blocked.exceptAll(naive).isEmpty && naive.exceptAll(blocked).isEmpty,
      "memoized editdist diverges from the all-pairs formulation")
    assert(blocked.count() > 0, "fuzzy matcher is vacuous at this tier")
  }

  test("map_entries_build agrees with agg_pivot_matrix counts") {
    // The op renders the map as a sorted "k:v,..." entries string (§7.3
    // "no MapType in output"); parse it back to rows for the comparison.
    val m = SparkEntry.queries("map_entries_build")(spark, sf)
      .select(col("user_id"), explode(split(col("type_counts"), ",")).as("kv"))
      .select(col("user_id"),
        split(col("kv"), ":").getItem(0).as("event_type"),
        split(col("kv"), ":").getItem(1).cast("long").as("n"))
    val p = SparkEntry.queries("agg_pivot_matrix")(spark, sf)
    val fromPivot = p.select(col("user_id"),
        expr("stack(5, 'click', click, 'error', error, 'purchase', purchase, 'signup', signup, 'view', view) AS (event_type, n)"))
      .filter(col("n") > 0)
    assert(m.exceptAll(fromPivot).isEmpty && fromPivot.exceptAll(m).isEmpty)
  }
}
