package graft.ops

import graft.{Op, OpGroup, Tables}
import org.apache.spark.sql.functions._
import parity._

/** Text-analysis surface for training-data pipelines (north-star
  * extension; the reference's closest analog is synonym/ID string
  * normalization in cobradb). Everything is built-in expressions — the
  * whole file stays inside WholeStageCodegen, linear in corpus size, and
  * oracle-checkable.
  */
object TextOps extends OpGroup {

  /** Tiny public stopword lexicons (top function words per language) —
    * the deterministic n-gram/lexicon-profile heuristic for language ID.
    */
  private val lexicon: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "was"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "del", "se", "las"),
    "fr" -> Seq("le", "de", "un", "et", "les", "des", "est", "dans", "que", "une"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "wo", "zai", "you", "ta", "zhe"),
  )

  /** Language ID: score each candidate language by lexicon-hit count
    * over the token stream, predict the argmax (ties → lexicographic
    * lang; no hits → 'und'). A real system would use char-n-gram
    * profiles; the dataflow — explode → broadcast lexicon join → per-doc
    * argmax window — is identical.
    */
  private val langid = Op(
    "text_langid",
    (s, sf) => {
      import s.implicits._
      val lex = lexicon.flatMap { case (l, ws) => ws.map((l, _)) }.toDF("cand_lang", "word")
      val hits = Tables.documents(s, sf)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .join(broadcast(lex), "word")
        .groupBy(col("doc_id"), col("cand_lang"))
        .agg(count(lit(1)).as("n_hits"))
      val best = hits.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("n_hits").desc, col("cand_lang").asc)))
        .filter(col("rk") === 1)
      Tables.documents(s, sf)
        .join(best, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("lang").as("actual_lang"),
          coalesce(col("cand_lang"), lit("und")).as("pred_lang"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .orderBy("doc_id")
    },
    Some("""WITH lex(cand_lang, word) AS (VALUES ('en','the'),('en','and'),('en','of'),('en','to'),('en','in'),('en','is'),('en','you'),('en','that'),('en','it'),('en','was'),('de','der'),('de','die'),('de','und'),('de','den'),('de','von'),('de','zu'),('de','das'),('de','mit'),('de','sich'),('de','des'),('es','de'),('es','la'),('es','que'),('es','el'),('es','en'),('es','y'),('es','los'),('es','del'),('es','se'),('es','las'),('fr','le'),('fr','de'),('fr','un'),('fr','et'),('fr','les'),('fr','des'),('fr','est'),('fr','dans'),('fr','que'),('fr','une'),('zh','de'),('zh','shi'),('zh','bu'),('zh','le'),('zh','ren'),('zh','wo'),('zh','zai'),('zh','you'),('zh','ta'),('zh','zhe')), hits AS (SELECT doc_id, cand_lang, count(*) AS n_hits FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents) t JOIN lex USING (word) GROUP BY doc_id, cand_lang), best AS (SELECT doc_id, cand_lang, n_hits FROM hits QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, cand_lang) = 1) SELECT d.doc_id AS doc_id, d.lang AS actual_lang, COALESCE(b.cand_lang, 'und') AS pred_lang, COALESCE(b.n_hits, 0) AS n_hits FROM documents d LEFT OUTER JOIN best b ON d.doc_id = b.doc_id ORDER BY doc_id"""),
  )

  /** Quality scoring: token count, average word length, stopword ratio,
    * digit ratio, combined into a LINEAR score (deliberately no
    * exp/log — libm implementations differ across engines in the last
    * ulp; a linear form is exactly portable after rounding).
    */
  private val qualityScore = Op(
    "text_quality_score",
    (s, sf) =>
      Tables.documents(s, sf)
        .withColumn("toks", split(lower(col("text")), " "))
        .withColumn("n_tok", size(col("toks")))
        .withColumn("n_stop",
          size(expr("filter(toks, x -> x IN ('the','and','of','to','in','is','you','that','it','was'))")))
        .withColumn("n_digit", length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
        .withColumn("avg_word_len",
          r6((length(col("text")) - (col("n_tok") - 1)).cast("double") / col("n_tok")))
        .withColumn("stop_ratio", r6(col("n_stop").cast("double") / col("n_tok")))
        .withColumn("digit_ratio", r6(col("n_digit").cast("double") / length(col("text"))))
        .withColumn("quality",
          r6(least(lit(1.0), greatest(lit(0.0),
            lit(0.3) + least(col("n_tok").cast("double") / 200, lit(0.35)) +
              col("n_stop").cast("double") / col("n_tok") * 0.5 -
              col("n_digit").cast("double") / length(col("text")) * 2.0))))
        .select(col("doc_id"), col("n_tok"), col("avg_word_len"),
          col("stop_ratio"), col("digit_ratio"), col("quality"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(len(toks) AS INT) AS n_tok, ROUND(1e-9 + CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks), 6) AS avg_word_len, ROUND(1e-9 + CAST(n_stop AS DOUBLE) / len(toks), 6) AS stop_ratio, ROUND(1e-9 + CAST(n_digit AS DOUBLE) / length(text), 6) AS digit_ratio, ROUND(1e-9 + LEAST(1.0, GREATEST(0.0, 0.3 + LEAST(CAST(len(toks) AS DOUBLE) / 200, 0.35) + CAST(n_stop AS DOUBLE) / len(toks) * 0.5 - CAST(n_digit AS DOUBLE) / length(text) * 2.0)), 6) AS quality FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks, len(list_filter(string_split(lower(text), ' '), x -> x IN ('the','and','of','to','in','is','you','that','it','was'))) AS n_stop, length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit FROM documents) t ORDER BY doc_id"""),
  )

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * tokenizer (letter runs / digit runs / single other chars) — the
    * cheap token-budget estimator of a data pipeline.
    */
  private val tokenCount = Op(
    "text_token_count",
    (s, sf) =>
      Tables.documents(s, sf)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("re_tokens"),
          length(col("text")).as("n_chars_calc"),
          col("n_chars"),
        )
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens, CAST(length(text) AS INT) AS n_chars_calc, n_chars FROM documents ORDER BY doc_id"""),
  )

  /** Document fingerprinting: rolling 5-token shingles, md5 per shingle,
    * min-hash as the fingerprint (winnowing-lite). Same doc content ⇒
    * same fingerprint regardless of engine.
    */
  private val fingerprint = Op(
    "text_fingerprint",
    (s, sf) =>
      Tables.documents(s, sf)
        .withColumn("toks", split(lower(col("text")), " "))
        .withColumn("shingle_hashes",
          expr("transform(sequence(1, greatest(size(toks) - 4, 1)), i -> md5(concat_ws(' ', slice(toks, i, 5))))"))
        .select(
          col("doc_id"),
          size(col("shingle_hashes")).as("n_shingles"),
          array_min(col("shingle_hashes")).as("fp_min"),
        )
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(len(sh) AS INT) AS n_shingles, list_min(sh) AS fp_min FROM (SELECT doc_id, list_transform(generate_series(1, greatest(len(toks) - 4, 1)), i -> md5(array_to_string(toks[i:i+4], ' '))) AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) t) t2 ORDER BY doc_id"""),
  )

  /** PII redaction — the compliance pass every training corpus runs
    * before export: emails and phone-shaped digit runs replaced with
    * typed placeholders, plus per-doc hit counts so a pipeline can
    * quarantine high-PII docs instead of silently rewriting them. Pure
    * regexp built-ins (codegen, linear); the patterns are deliberately
    * in the RE2-compatible subset both engines interpret identically
    * (character classes + bounded repetition, no lookaround).
    */
  private val piiRedact = Op(
    "text_pii_redact",
    (s, sf) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"
      Tables.documents(s, sf)
        .select(
          col("doc_id"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            phone, "<PHONE>").as("redacted"),
          size(split(col("text"), email, -1)).minus(1).as("n_emails"),
          size(split(col("text"), phone, -1)).minus(1).as("n_phones"),
        )
        .withColumn("redacted_hash", md5(col("redacted")))
        .select("doc_id", "redacted_hash", "n_emails", "n_phones")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}', '<PHONE>', 'g')) AS redacted_hash, CAST(len(string_split_regex(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS INT) AS n_emails, CAST(len(string_split_regex(text, '[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}')) - 1 AS INT) AS n_phones FROM documents ORDER BY doc_id"""),
  )

  /** Top-k word 3-grams per language — corpus phrase statistics (the
    * boilerplate/template detector's first stage): explode each doc's
    * consecutive word triples, count per (lang, ngram), keep the top 10
    * per lang by count (ties lexicographic). The per-lang window
    * parallelizes across languages and ranks only the aggregated
    * (lang, ngram) counts — never the raw explode stream.
    */
  private val ngramTopk = Op(
    "text_ngram_topk",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      // Docs under 3 tokens are FILTERED, not clamped: Spark's
      // sequence(1, 0) yields a DESCENDING [1, 0] (DuckDB's
      // generate_series is empty) — a greatest()-clamp would fabricate
      // partial n-grams on one engine only.
      val toks = Tables.spread(s, Tables.documents(s, sf))
        .select(col("lang"), split(lower(col("text")), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")).as("ngram"))
      toks.groupBy(col("lang"), col("ngram"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("n").desc, col("ngram").asc)).cast("int"))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk"), col("ngram"), col("n"))
        .orderBy("lang", "rk")
    },
    Some("""WITH g AS (SELECT lang, unnest(list_transform(generate_series(1, len(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS ngram FROM (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents) t WHERE len(toks) >= 3), c AS (SELECT lang, ngram, COUNT(*) AS n FROM g GROUP BY lang, ngram) SELECT lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, ngram ASC) AS INT) AS rk, ngram, n FROM c QUALIFY rk <= 10 ORDER BY lang, rk"""),
  )

  /** Feature-hashing TF-IDF (r5) — the fixed-width featurization stage
    * between curation and model training: each word maps to one of 64
    * buckets by a PORTABLE hash (low 60 bits of md5, same scheme as the
    * simhash kernel), and a doc's bucket weight sums tf · ln(N/df) over
    * its words in that bucket. Feature hashing is what makes the
    * vectorizer 100 TB-viable: no vocabulary dictionary to build,
    * broadcast, or grow — the width is fixed up front and collisions
    * are the accepted trade (Weinberger et al. 2009). Parity: each
    * term's double is r6-rounded THEN decimal-cast before the sum, so
    * the bucket sum is order-free and the ln() last-ulp skew between
    * engines is absorbed per-term by the tie shift. The df relation is
    * vocab-sized — broadcast here; frequency-capped into a bounded dict
    * at real scale (same note as the dedup vocab).
    */
  private val hashedTfidf = Op(
    "text_hashed_tfidf",
    (s, sf) => {
      val docs = Tables.spread(s, Tables.documents(s, sf))
      // Corpus N as a 1-row scalar aggregate cross-joined in (the
      // etl_dq_checks discipline) — not a count() driver pre-pass, so
      // the whole op is ONE job with no extra scan.
      val nDf = Tables.documents(s, sf).agg(count(lit(1)).as("n_docs"))
      val tf = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      // The df (vocabulary) side joins as a PLAIN shuffle equi-join on
      // word — never a broadcast hint (r9 verdict #3): a web corpus's
      // vocabulary is unbounded, so a forced vocab broadcast is a
      // driver OOM at scale, while the shuffle join costs one exchange
      // of the already-shuffled-by-word tf relation's keys. (AQE may
      // still ELECT to broadcast when the measured vocab is small —
      // that runtime decision is exactly the right altitude for it.)
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      tf.join(df, "word")
        .crossJoin(broadcast(nDf))
        .withColumn("bucket",
          expr("cast(conv(substring(md5(word), 1, 15), 16, 10) as bigint) % 64"))
        .groupBy("doc_id", "bucket")
        .agg(sum(expr(
          "cast(round(tf * ln(cast(n_docs as double) / df) + 1e-9, 6) as decimal(18,6))"))
          .cast("double").as("weight"))
        .orderBy("doc_id", "bucket")
    },
    Some("""WITH tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents) t GROUP BY doc_id, word), df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word) SELECT tf.doc_id, CAST(concat('0x', substr(md5(tf.word), 1, 15)) AS BIGINT) % 64 AS bucket, CAST(SUM(CAST(ROUND(tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df) + 1e-9, 6) AS DECIMAL(18,6))) AS DOUBLE) AS weight FROM tf JOIN df ON tf.word = df.word GROUP BY 1, 2 ORDER BY doc_id, bucket"""),
  )

  /** Per-doc KEYWORD extraction (r5): top-3 words by tf·ln(N/df) — the
    * unhashed sibling of text_hashed_tfidf and the tagging/indexing
    * stage of a document pipeline. The rank window runs over each doc's
    * DISTINCT words (≤ vocab), never the token stream. The ranking
    * compares the per-term ROUNDED weight (the text_hashed_tfidf
    * discipline): ln() implementations differ in the last ulp across
    * engines, so ranking raw doubles could flip the rk≤3 cut on
    * near-equal weights; after rounding, near-equal weights become
    * EXACTLY equal and fall through to the word tie-break identically
    * in both engines.
    */
  private val keywords = Op(
    "text_keywords_tfidf",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      // Same one-job N fold as text_hashed_tfidf: scalar aggregate,
      // cross join, no count() pre-pass.
      val nDf = Tables.documents(s, sf).agg(count(lit(1)).as("n_docs"))
      val tf = Tables.spread(s, Tables.documents(s, sf))
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("weight").desc, col("word").asc)
      // Plain shuffle join on word, same rationale as text_hashed_tfidf:
      // the vocabulary is unbounded at corpus scale, so no broadcast
      // hint on the df side (r9 verdict #3).
      tf.join(df, "word")
        .crossJoin(broadcast(nDf))
        .withColumn("weight", r6(col("tf") * log(col("n_docs").cast("double") / col("df"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("word"), col("weight"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents) t GROUP BY doc_id, word), df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word), sc AS (SELECT tf.doc_id, tf.word, ROUND(1e-9 + tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df), 6) AS weight FROM tf JOIN df ON tf.word = df.word) SELECT doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY weight DESC, word ASC) AS INT) AS rk, word, weight FROM sc QUALIFY rk <= 3 ORDER BY doc_id, rk"""),
  )

  /** Bigram CROSS-ENTROPY novelty score (r5) — the perplexity-proxy
    * quality filter: each doc's average −ln p(w₂|w₁) under the corpus's
    * own bigram MLE (count(w₁w₂)/count(w₁·)). Low = templated/boilerplate
    * text the corpus model predicts well; high = novel (or noise). This
    * is the statistical-LM stand-in for the neural-perplexity filter of
    * a real curation pipeline — same dataflow (corpus model → per-doc
    * score), model swappable. The model tables are corpus aggregates
    * joined back to the doc's bigram stream; the per-term ln is rounded
    * then decimal-summed (order-free, ulp-tolerant) and normalized per
    * doc.
    */
  private val bigramNovelty = Op(
    "text_bigram_novelty",
    (s, sf) => {
      val grams = Tables.spread(s, Tables.documents(s, sf))
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), expr(
          "explode(transform(slice(ws, 1, size(ws) - 1), (w, i) -> struct(w AS w1, ws[i + 1] AS w2)))").as("g"))
        .select(col("doc_id"), col("g.w1"), col("g.w2"))
      val bi = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val uni = bi.groupBy("w1").agg(sum(col("c2")).as("c1"))
      val model = bi.join(uni, "w1")
        .select(col("w1"), col("w2"),
          expr("cast(round(-ln(c2 / cast(c1 as double)) + 1e-9, 6) as decimal(18,6))").as("nll"))
      // No broadcast hint on the model: the corpus's distinct-bigram
      // table is strictly LARGER than the unigram vocabulary (whose
      // forced broadcast the tfidf keys already ban) — unbounded at web
      // scale, a guaranteed OOM if hinted. It is a plain equi-join on
      // (w1, w2); the cost model elects broadcast while the measured
      // model is small and flips to shuffle on its own at scale.
      // Pinned by PlanShapeSpec (no ResolvedHint in this plan).
      grams.join(model, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          r6(sum(col("nll")).cast("double") / count(lit(1))).as("avg_nll"))
        .orderBy("doc_id")
    },
    Some("""WITH grams AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents) d, unnest(generate_series(1, len(ws) - 1)) t(i) WHERE len(ws) >= 2), bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM grams GROUP BY w1, w2), uni AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bi GROUP BY w1), model AS (SELECT bi.w1, bi.w2, CAST(ROUND(-ln(bi.c2 / CAST(uni.c1 AS DOUBLE)) + 1e-9, 6) AS DECIMAL(18,6)) AS nll FROM bi JOIN uni ON bi.w1 = uni.w1) SELECT g.doc_id, COUNT(*) AS n_bigrams, ROUND(1e-9 + CAST(SUM(m.nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll FROM grams g JOIN model m ON g.w1 = m.w1 AND g.w2 = m.w2 GROUP BY g.doc_id ORDER BY g.doc_id"""),
  )

  /** ZIPF PROFILE of the corpus vocabulary (r6) — the sanity check every
    * corpus-statistics pass runs: natural text follows freq ∝ rank^s
    * with s ≈ −1, and a far-off slope flags template/boilerplate or
    * synthetic text. One tokenize→count aggregation (partition-parallel,
    * map-side combined), a rank window over the AGGREGATED vocabulary
    * only (freq desc, word — total order), then the OLS closed form of
    * ln(freq) on ln(rank) over the top-100 ranks, with each ln rounded
    * to a decimal BEFORE the sum (the bigramNovelty ulp discipline:
    * order-free exact sums of identically-rounded doubles). Output is
    * the one-row corpus profile next to stats_column_profile.
    */
  private val docfreqZipf = Op(
    "text_docfreq_zipf",
    (s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val freq = Tables.documents(s, sf)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val top = freq
        .withColumn("rk", row_number().over(
          Window.orderBy(col("freq").desc, col("word").asc)))
        .filter(col("rk") <= 100)
        .withColumn("lx", expr("cast(round(ln(rk) + 1e-9, 6) as decimal(18,6))"))
        .withColumn("ly", expr("cast(round(ln(freq) + 1e-9, 6) as decimal(18,6))"))
      val a = top.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("lx")).cast("double").as("sx"),
        sum(col("ly")).cast("double").as("sy"),
        // lx·ly is EXACT at scale 12 in both engines (DECIMAL(18,6)²) —
        // an intermediate cast back to (18,6) would round ties under
        // different rules (Spark HALF_UP, DuckDB half-to-even).
        sum(expr("lx * ly")).cast("double").as("sxy"),
        sum(expr("lx * lx")).cast("double").as("sxx"),
        max(col("freq")).as("top_freq"))
      val vocab = freq.agg(count(lit(1)).as("vocab_size"),
        sum(col("freq")).as("n_tokens"))
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      a.crossJoin(vocab).select(
        col("vocab_size"), col("n_tokens"), col("top_freq"),
        r6((col("n") * col("sxy") - col("sx") * col("sy")) /
          when(den =!= 0, den)).as("zipf_slope"))
    },
    Some("""WITH freq AS (SELECT word, COUNT(*) AS freq FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t WHERE word <> '' GROUP BY word), top AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS rk FROM freq QUALIFY rk <= 100), lt AS (SELECT freq, rk, CAST(ROUND(ln(rk) + 1e-9, 6) AS DECIMAL(18,6)) AS lx, CAST(ROUND(ln(freq) + 1e-9, 6) AS DECIMAL(18,6)) AS ly FROM top), a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy, CAST(SUM(lx * ly) AS DOUBLE) AS sxy, CAST(SUM(lx * lx) AS DOUBLE) AS sxx, MAX(freq) AS top_freq FROM lt), v AS (SELECT COUNT(*) AS vocab_size, CAST(SUM(freq) AS BIGINT) AS n_tokens FROM freq) SELECT v.vocab_size, v.n_tokens, a.top_freq, ROUND(1e-9 + (a.n * a.sxy - a.sx * a.sy) / NULLIF(a.n * a.sxx - a.sx * a.sx, 0), 6) AS zipf_slope FROM a CROSS JOIN v"""),
  )

  /** BENCHMARK DECONTAMINATION check (r6) — the eval-integrity stage of
    * an LLM data pipeline: flag training docs sharing any 8-gram word
    * shingle with a held-out benchmark set (here: source 'src0' plays
    * the benchmark; everything else is the training corpus). Both sides
    * reduce to DISTINCT (doc, shingle-md5) / DISTINCT shingle-md5 first,
    * and the overlap is one equi-join on the hash — the inverted-index
    * shape (work = sum of per-shingle df products, linear on real
    * corpora) — never a doc-pair loop. Per-doc hit counts aggregate the
    * join output; the flag threshold (any hit) is exact-integer.
    * At 100 TB the benchmark side is small and broadcasts; the corpus
    * side streams.
    */
  private val contaminationCheck = Op(
    "text_contamination_check",
    (s, sf) => {
      def shingles(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("toks", split(lower(col("text")), " "))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, greatest(size(toks) - 7, 1)), i -> md5(concat_ws(' ', slice(toks, i, 8))))")).as("sh"))
        .distinct()
      val docs = Tables.documents(s, sf)
      val bench = shingles(docs.filter(col("source") === "src0"))
        .select(col("sh")).distinct()
      val corpus = shingles(docs.filter(col("source") =!= "src0"))
      val hits = corpus.join(broadcast(bench.withColumn("hit", lit(1))), Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
      hits.select(col("doc_id"), col("n_shingles"), col("n_hits"),
          (col("n_hits") > 0).as("contaminated"))
        .orderBy("doc_id")
    },
    Some("""WITH sh AS (SELECT DISTINCT doc_id, source, s AS sh FROM (SELECT doc_id, source, unnest(list_transform(generate_series(1, greatest(len(toks) - 7, 1)), i -> md5(array_to_string(toks[i:i+7], ' ')))) AS s FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents) t) u), bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'), corpus AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0') SELECT c.doc_id, COUNT(*) AS n_shingles, CAST(SUM(CASE WHEN b.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hits, CAST(SUM(CASE WHEN b.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) > 0 AS contaminated FROM corpus c LEFT JOIN bench b ON b.sh = c.sh GROUP BY c.doc_id ORDER BY c.doc_id"""),
  )

  /** WITHIN-DOCUMENT REPETITION FILTER (r7) — the Gopher-style quality
    * gate (Rae et al. 2021 §A1.1, public): templated/degenerate text
    * shows up as a single word or n-gram dominating its own document.
    * Per doc: top-word share, top-bigram share, and the fraction of
    * trigram instances belonging to a repeated trigram; docs exceeding
    * the (adapted, token-level) thresholds flag for removal. One
    * explode emits ALL gram sizes (1..3) into a single (doc, n, gram)
    * relation — one count aggregation and one per-(doc, n) rollup serve
    * every feature, instead of three scans; both aggregations are
    * map-side-combinable and linear in corpus size, and nothing beyond
    * the per-doc feature table shuffles. Flags compare the ROUNDED
    * shares (both engines), so the gate itself is parity-exact.
    */
  private val repetitionGopher = Op(
    "text_repetition_gopher",
    (s, sf) => {
      val g = Tables.spread(s, Tables.documents(s, sf))
        .withColumn("ws", expr("filter(split(lower(text), ' '), w -> w <> '')"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          """flatten(transform(sequence(1, 3), n ->
             transform(sequence(1, size(ws) - n + 1), i ->
               struct(n AS n, concat_ws(chr(1), slice(ws, i, n)) AS gram))))""")).as("e"))
        .select(col("doc_id"), col("e.n").as("n"), col("e.gram").as("gram"))
      val cnt = g.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
      val per = cnt.groupBy("doc_id", "n").agg(
        sum(col("c")).as("tot"), max(col("c")).as("mx"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup"))
      per.groupBy("doc_id").agg(
          max(when(col("n") === 1, col("tot"))).as("n_words"),
          r6(max(when(col("n") === 1, col("mx").cast("double") / col("tot")))).as("top_word_share"),
          r6(max(when(col("n") === 2, col("mx").cast("double") / col("tot")))).as("top_bigram_share"),
          r6(max(when(col("n") === 3, col("dup").cast("double") / col("tot")))).as("dup_trigram_frac"))
        .withColumn("flagged",
          col("top_bigram_share") > 0.18 || col("dup_trigram_frac") > 0.30)
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws FROM documents), dd AS (SELECT * FROM d WHERE len(ws) >= 3), g AS (SELECT doc_id, 1 AS n, unnest(ws) AS gram FROM dd UNION ALL SELECT doc_id, 2 AS n, unnest(list_transform(generate_series(1, len(ws) - 1), i -> array_to_string(ws[i:i+1], chr(1)))) AS gram FROM dd UNION ALL SELECT doc_id, 3 AS n, unnest(list_transform(generate_series(1, len(ws) - 2), i -> array_to_string(ws[i:i+2], chr(1)))) AS gram FROM dd), cnt AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY doc_id, n, gram), per AS (SELECT doc_id, n, CAST(SUM(c) AS BIGINT) AS tot, MAX(c) AS mx, COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS dup FROM cnt GROUP BY doc_id, n) SELECT doc_id, MAX(CASE WHEN n = 1 THEN tot END) AS n_words, ROUND(1e-9 + MAX(CASE WHEN n = 1 THEN CAST(mx AS DOUBLE) / tot END), 6) AS top_word_share, ROUND(1e-9 + MAX(CASE WHEN n = 2 THEN CAST(mx AS DOUBLE) / tot END), 6) AS top_bigram_share, ROUND(1e-9 + MAX(CASE WHEN n = 3 THEN CAST(dup AS DOUBLE) / tot END), 6) AS dup_trigram_frac, (ROUND(1e-9 + MAX(CASE WHEN n = 2 THEN CAST(mx AS DOUBLE) / tot END), 6) > 0.18 OR ROUND(1e-9 + MAX(CASE WHEN n = 3 THEN CAST(dup AS DOUBLE) / tot END), 6) > 0.30) AS flagged FROM per GROUP BY doc_id ORDER BY doc_id"""),
  )

  /** Corpus-trained character-trigram language-model scoring — the
    * CCNet-style statistical quality filter (Wenzek 2020) with the
    * KenLM stage replaced by a model the engine trains itself in two
    * aggregations: c3(abc) and c2(ab) counts over every char position,
    * add-one smoothing against the corpus character vocabulary V, and a
    * per-doc mean next-char probability avg_prob = mean_p[(c3+1)/(c2+V)]
    * with its negative-log surprise nll. Scale shape: one explode per
    * pass (linear), two model aggregations (shuffle on gram key, output
    * bounded by charset^3), then a join of positions against the models —
    * no driver action, no pairwise stage; in production the two model
    * relations are artifacts trained once and reused across scoring
    * runs. Parity: probs are rounded to 12 decimals and decimal-summed
    * (order-free); nll takes ln of the ALREADY-ROUNDED 6-decimal mean so
    * both engines feed libm the identical double.
    */
  private val charlmScore = Op(
    "text_charlm_score",
    (s, sf) => {
      def tri = Tables.spread(s,
          Tables.documents(s, sf).filter(length(col("text")) >= 3))
        .select(col("doc_id"), lower(col("text")).as("lt"))
        .select(col("doc_id"), explode(expr("sequence(1, length(lt) - 2)")).as("p"), col("lt"))
        .select(col("doc_id"),
          expr("substring(lt, p, 3)").as("t3"),
          expr("substring(lt, p, 2)").as("t2"))
      val m3 = tri.groupBy("t3").agg(count(lit(1)).as("c3"))
      val m2 = tri.groupBy("t2").agg(count(lit(1)).as("c2"))
      // |V| as a 1-row scalar-aggregate fold-in (no driver action).
      val vDf = Tables.documents(s, sf).filter(length(col("text")) >= 1)
        .select(lower(col("text")).as("lt"))
        .select(explode(expr("sequence(1, length(lt))")).as("p"), col("lt"))
        .agg(countDistinct(expr("substring(lt, p, 1)")).as("vs"))
      val scored = tri.join(m3, "t3").join(m2, "t2").crossJoin(vDf)
        .withColumn("prob",
          expr("cast(round(cast(c3 + 1 as double) / (c2 + vs), 12) as decimal(18,12))"))
      val perdoc = scored.groupBy("doc_id").agg(
        count(lit(1)).as("n_tri"), sum(col("prob")).as("sp"))
      Tables.documents(s, sf)
        .join(perdoc, Seq("doc_id"), "left_outer")
        .withColumn("avg_prob", r6(col("sp").cast("double") / col("n_tri")))
        .select(col("doc_id"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          col("avg_prob"),
          r6(-log(col("avg_prob"))).as("nll"))
        .orderBy("doc_id")
    },
    Some("""WITH tri AS (SELECT doc_id, substr(lower(text), p, 3) AS t3, substr(lower(text), p, 2) AS t2 FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - 2)) AS p) g WHERE length(text) >= 3), m3 AS (SELECT t3, COUNT(*) AS c3 FROM tri GROUP BY t3), m2 AS (SELECT t2, COUNT(*) AS c2 FROM tri GROUP BY t2), v AS (SELECT COUNT(DISTINCT substr(lower(text), p, 1)) AS vs FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS p) g WHERE length(text) >= 1), scored AS (SELECT tri.doc_id, CAST(ROUND(CAST(m3.c3 + 1 AS DOUBLE) / (m2.c2 + v.vs), 12) AS DECIMAL(18,12)) AS prob FROM tri JOIN m3 USING (t3) JOIN m2 USING (t2) CROSS JOIN v), perdoc AS (SELECT doc_id, COUNT(*) AS n_tri, SUM(prob) AS sp FROM scored GROUP BY doc_id) SELECT d.doc_id AS doc_id, COALESCE(p.n_tri, 0) AS n_tri, ROUND(1e-9 + CAST(p.sp AS DOUBLE) / p.n_tri, 6) AS avg_prob, ROUND(1e-9 + -LN(ROUND(1e-9 + CAST(p.sp AS DOUBLE) / p.n_tri, 6)), 6) AS nll FROM documents d LEFT JOIN perdoc p USING (doc_id) ORDER BY doc_id"""),
  )

  /** Lexical diversity per document (r9d) — type-token ratio and hapax
    * share: the vocabulary-richness screens that catch two failure modes
    * the length/punct quality score misses — template/boilerplate text
    * (TTR → 0: many tokens, few types) and gibberish/ID dumps (hapax
    * share → 1: every token unique). Standard Gopher-adjacent corpus
    * filters. Dataflow: one explode to (doc, word), one (doc, word)
    * hash-agg, one doc rollup — linear, map-side combinable, shuffle
    * keyed by doc (never corpus-wide vocabulary). Counts are integers;
    * the two ratios are single divisions rounded once.
    */
  private val lexicalDiversity = Op(
    "text_lexical_diversity",
    (s, sf) => {
      import graft.ops.parity.r6
      Tables.documents(s, sf)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
          r6(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
          r6(col("n_hapax").cast("double") / col("n_types")).as("hapax_share"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents), c AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2), d AS (SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_types, SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax FROM c GROUP BY 1) SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_types AS BIGINT) AS n_types, CAST(n_hapax AS BIGINT) AS n_hapax, ROUND(1e-9 + CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr, ROUND(1e-9 + CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_share FROM d ORDER BY doc_id"""),
  )

  /** Compression-ratio quality signal (r9h) — deflated bytes / raw
    * bytes per document: the classic corpus filter (Gopher §A.1.2 and
    * every CommonCrawl pipeline): machine-generated/repetitive text
    * compresses far below human prose, random IDs barely compress at
    * all, so both tails are screened with ONE number and no language
    * model. zlib at fixed level 6 with the JDK's bundled zlib is
    * deterministic for a given input, but no SQL engine exposes
    * deflate, so this is a NO-ORACLE key gated by TextDepthSpec
    * invariants (repetitive ≪ prose < random, determinism). A Scala
    * UDF is the right tier here — there is no builtin, and a custom
    * codegen Expression would still black-box the zlib call; the UDF
    * is a pure per-row projection, embarrassingly parallel, no shuffle
    * before the output sort at any scale.
    */
  private val compressionRatio = Op(
    "text_compression_ratio",
    (s, sf) => {
      val deflateLen = udf { t: String =>
        if (t == null || t.isEmpty) 0L
        else {
          val in = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val d = new java.util.zip.Deflater(6, false)
          d.setInput(in); d.finish()
          val buf = new Array[Byte](8192)
          var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          d.end()
          total
        }
      }
      Tables.documents(s, sf)
        .withColumn("raw_bytes", octet_length(col("text")).cast("long"))
        .withColumn("deflate_bytes", deflateLen(col("text")))
        .withColumn("compression_ratio",
          r6(col("deflate_bytes").cast("double") /
            when(col("raw_bytes") > 0, col("raw_bytes"))))
        .select(col("doc_id"), col("raw_bytes"), col("deflate_bytes"),
          col("compression_ratio"))
        .orderBy("doc_id")
    },
    None,
  )

  /** SENTENCE-SEGMENTATION profile (r11) — the structural text stats a
    * curation pass reads next to the token-level ones: sentences split
    * on [.!?]+ runs, per-doc sentence count, mean words per sentence,
    * and the longest sentence's char length (run-on detector; a doc of
    * one enormous "sentence" is boilerplate/code, a doc of 2-word
    * fragments is a listing). Pure per-row HOF compute over the scan —
    * no shuffle before the output sort; the sentence arrays never
    * explode into rows.
    */
  private val sentenceStats = Op(
    "text_sentence_stats",
    (s, sf) => {
      Tables.documents(s, sf)
        .withColumn("sents", expr(
          "filter(transform(split(text, '[.!?]+'), x -> trim(x)), x -> x != '')"))
        .filter(size(col("sents")) > 0)
        .select(col("doc_id"),
          size(col("sents")).as("n_sentences"),
          r6(expr("aggregate(sents, 0, (acc, x) -> acc + size(filter(split(x, ' '), w -> w != '')))")
            .cast("double") / size(col("sents"))).as("avg_words_per_sentence"),
          expr("aggregate(sents, 0, (acc, x) -> greatest(acc, length(x)))").as("max_sentence_chars"))
        .orderBy("doc_id")
    },
    Some("""WITH s AS (SELECT doc_id, list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'), x -> trim(x)), x -> x <> '') AS sents FROM documents) SELECT doc_id, CAST(len(sents) AS INT) AS n_sentences, ROUND(1e-9 + CAST(list_reduce(list_transform(sents, x -> len(list_filter(string_split(x, ' '), w -> w <> ''))), (a, b) -> a + b) AS DOUBLE) / len(sents), 6) AS avg_words_per_sentence, CAST(list_reduce(list_transform(sents, x -> length(x)), (a, b) -> greatest(a, b)) AS INT) AS max_sentence_chars FROM s WHERE len(sents) > 0 ORDER BY doc_id"""),
  )

  /** VOCABULARY COVERAGE CURVE points (r11) — the corpus statistic a
    * tokenizer-budget decision reads: what fraction of all bigram
    * OCCURRENCES do the top-{100, 500, 1000} distinct bigrams cover?
    * (Near-1 at small k = templated/boilerplate corpus; slow growth =
    * diverse text; the same curve decides BPE vocab size.) One bigram
    * count agg (linear, map-side combined), then the top-1000 counts
    * come from the BOUNDED-HEAP vec_topk partial aggregate — NOT a
    * global rank window, which would single-partition the
    * vocabulary-sized relation (the weak-plan class the r10 verdict
    * banned for broadcasts; same reasoning for sorts). The coverage
    * sums are tie-invariant — the top-k C-MULTISET is unique however
    * equal counts break — so the heap's id tiebreak cannot diverge
    * from the oracle's (c desc, g asc) ranking.
    */
  private val ngramCoverage = Op(
    "text_ngram_coverage",
    (s, sf) => {
      graft.functions.VecTopK.register(s)
      val grams = Tables.spread(s, Tables.documents(s, sf))
        .select(split(lower(col("text")), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(slice(ws, 1, size(ws) - 1), (w, i) -> concat(w, ' ', ws[i + 1]))")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
      def covOf(k: Int) = r6(expr(
        s"aggregate(transform(slice(top, 1, $k), e -> e.sim), 0D, (a, b) -> a + b)")
        / col("n_occurrences"))
      grams.agg(
          count(lit(1)).as("n_distinct_bigrams"),
          sum("c").cast("long").as("n_occurrences"),
          expr("vec_topk(xxhash64(g), cast(c as double), 1000)").as("top"))
        .select(col("n_distinct_bigrams"), col("n_occurrences"),
          covOf(100).as("cov_top100"),
          covOf(500).as("cov_top500"),
          covOf(1000).as("cov_top1000"))
    },
    Some("""WITH grams AS (SELECT concat(ws[i], ' ', ws[i + 1]) AS g FROM (SELECT string_split(lower(text), ' ') AS ws FROM documents) d, unnest(generate_series(1, len(ws) - 1)) t(i) WHERE len(ws) >= 2), cnt AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g), rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, g ASC) AS rk FROM cnt) SELECT COUNT(*) AS n_distinct_bigrams, CAST(SUM(c) AS BIGINT) AS n_occurrences, ROUND(1e-9 + CAST(SUM(CASE WHEN rk <= 100 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6) AS cov_top100, ROUND(1e-9 + CAST(SUM(CASE WHEN rk <= 500 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6) AS cov_top500, ROUND(1e-9 + CAST(SUM(CASE WHEN rk <= 1000 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6) AS cov_top1000 FROM rk"""),
  )

  val ops: Seq[Op] = Seq(langid, qualityScore, tokenCount, fingerprint,
    piiRedact, ngramTopk, hashedTfidf, keywords, bigramNovelty, docfreqZipf,
    contaminationCheck, repetitionGopher, charlmScore, lexicalDiversity,
    compressionRatio, sentenceStats, ngramCoverage)
}
