package graft

import org.apache.spark.sql.functions._

/** Independent re-derivations of the two corpus-statistics text ops added
  * after round 7: exact substring dedup (Lee 2022-style rolling-window
  * coverage) and the char-trigram LM quality score. Each test recomputes
  * the op's answer with straight driver-side Scala over the same fixture —
  * a different algorithm shape (hash maps + interval lists, not joins and
  * window functions) — and demands exact agreement.
  */
class TextDepthSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  test("dedup_substring_exact matches a brute-force window-coverage re-derivation") {
    val W = 40; val S = 8
    // Brute force: windows per doc at stride S, cross-doc duplicated
    // hashes, per-doc interval union of duplicated windows.
    val wins: Seq[(Long, Int, String)] = docs.flatMap { case (id, text, _) =>
      (1 to (text.length - W + 1) by S).filter(_ => text.length >= W).map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dig = md.digest(text.substring(p - 1, p - 1 + W).getBytes("UTF-8"))
        (id, p, dig.map("%02x".format(_)).mkString)
      }
    }
    val dupHashes = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expect: Map[Long, (Long, Long, Long)] = docs.map { case (id, text, _) =>
      val mine = wins.filter(w => w._1 == id)
      val dups = mine.filter(w => dupHashes(w._3)).map(_._2).sorted
      var end = 0L; var cov = 0L
      dups.foreach { p =>
        val hi = p + W; val lo = math.max(end, p.toLong)
        if (hi > lo) cov += hi - lo
        end = math.max(end, hi)
      }
      id -> ((mine.size.toLong, dups.size.toLong, cov))
    }.toMap
    val got = SparkEntry.queries("dedup_substring_exact")(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (nw, nd, ch) = expect(id)
      assert(r.getLong(1) == nw, s"doc $id n_windows ${r.getLong(1)} != $nw")
      assert(r.getLong(2) == nd, s"doc $id n_dup_windows ${r.getLong(2)} != $nd")
      assert(r.getLong(3) == ch, s"doc $id dup_chars ${r.getLong(3)} != $ch")
    }
    val nDup = expect.values.count(_._2 > 0)
    info(s"${docs.size} docs, $nDup with cross-doc duplicated spans, ${dupHashes.size} shared hashes")
  }

  test("dedup_substring_exact coverage never exceeds the document length") {
    SparkEntry.queries("dedup_substring_exact")(spark, sf).collect().foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9,
        s"doc ${r.getLong(0)} dup_frac ${r.getDouble(4)} out of [0,1]")
    }
  }

  test("text_charlm_score matches a hash-map trigram-LM re-derivation") {
    val lowered = docs.map { case (id, t, _) => (id, t.toLowerCase) }
    val c3 = scala.collection.mutable.Map.empty[String, Long]
    val c2 = scala.collection.mutable.Map.empty[String, Long]
    val vset = scala.collection.mutable.Set.empty[String]
    lowered.foreach { case (_, t) =>
      (0 until t.length).foreach(i => vset += t.substring(i, i + 1))
      if (t.length >= 3) (0 to t.length - 3).foreach { i =>
        c3(t.substring(i, i + 3)) = c3.getOrElse(t.substring(i, i + 3), 0L) + 1
        c2(t.substring(i, i + 2)) = c2.getOrElse(t.substring(i, i + 2), 0L) + 1
      }
    }
    val v = vset.size
    def round(x: Double, d: Int): Double =
      BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect: Map[Long, (Long, Double, Double)] = lowered.map { case (id, t) =>
      if (t.length < 3) id -> ((0L, Double.NaN, Double.NaN))
      else {
        val probs = (0 to t.length - 3).map { i =>
          // Mirror the op: round each prob to 12 decimals, exact-sum.
          BigDecimal(round((c3(t.substring(i, i + 3)) + 1).toDouble /
            (c2(t.substring(i, i + 2)) + v), 12)).setScale(12)
        }
        val avg = round(probs.sum.toDouble / probs.size + 1e-9, 6)
        id -> ((probs.size.toLong, avg, round(-math.log(avg) + 1e-9, 6)))
      }
    }.toMap
    val got = SparkEntry.queries("text_charlm_score")(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (n, avg, nll) = expect(id)
      assert(r.getLong(1) == n, s"doc $id n_tri ${r.getLong(1)} != $n")
      assert(math.abs(r.getDouble(2) - avg) < 1e-9, s"doc $id avg_prob ${r.getDouble(2)} != $avg")
      assert(math.abs(r.getDouble(3) - nll) < 1e-9, s"doc $id nll ${r.getDouble(3)} != $nll")
    }
    info(s"charlm over ${docs.size} docs, |V|=$v, |m3|=${c3.size}, |m2|=${c2.size}")
  }

  test("text_compression_ratio separates repetitive / prose / random and is deterministic") {
    import spark.implicits._
    // Crafted fixture: the discriminative power IS the op's contract.
    val tmp = java.nio.file.Files.createTempDirectory("graft_cr").toString
    val prose = "the quick brown fox jumps over the lazy dog and then walks home " * 8
    val repetitive = "spam " * 104
    val random = {
      val rnd = new scala.util.Random(42)
      Seq.fill(520)((rnd.nextInt(36) match {
        case i if i < 10 => ('0' + i).toChar
        case i => ('a' + i - 10).toChar
      })).mkString
    }
    Seq((1L, repetitive, "en", "synth", repetitive.length.toLong),
        (2L, prose, "en", "synth", prose.length.toLong),
        (3L, random, "en", "synth", random.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("text_compression_ratio")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) < rows(2L) && rows(2L) < rows(3L),
      s"expected repetitive ${rows(1L)} < prose ${rows(2L)} < random ${rows(3L)}")
    assert(rows(1L) < 0.10, s"repetitive text should crush: ${rows(1L)}")
    assert(rows(3L) > 0.5, s"random text should resist: ${rows(3L)}")
    val again = SparkEntry.queries("text_compression_ratio")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == rows, "deflate at a fixed level must be deterministic")
    // and over the real corpus: every ratio is positive and bounded
    SparkEntry.queries("text_compression_ratio")(spark, sf).collect().foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.2,
        s"doc ${r.getLong(0)} ratio ${r.getDouble(3)} out of band")
    }
  }
}
