package graft.operators

import graft.functions.TextFns
import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization/word frequency, canonical document
  * signatures (the reference's bridge-group signature machinery, SURVEY.md
  * §2.3 A1-A8, generalized to documents), language-ID heuristic, quality
  * scoring, token counting, and rolling-hash fingerprinting.
  *
  * Scale: all are per-row projections plus one hash aggregate — fully
  * partition-parallel, no skew risk beyond word frequency (bounded
  * vocabulary here; at 100 TB, word-freq would add a salted partial-agg
  * round which Spark's partial aggregation already performs).
  */
object TextOps extends OpModule {

  /** Explode tokens → corpus word frequency (A1/A2/A5 + G1). */
  val t20WordFreq: Op = Op(
    "t20_word_freq",
    Some("""
      SELECT word,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM (SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS word
            FROM documents)
      GROUP BY word
      ORDER BY word
    """))((spark, dir) => {
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("word")
  })

  /** Canonical bag-of-words signature per document: sorted distinct
    * tokens joined by '|', md5'd — the reference's cause-group signature
    * (spark_script_sim.py:181-192: sort, concat_ws ':' / '|') applied to
    * documents. Identical signature ⇒ same token set. */
  val t21DocSignature: Op = Op(
    "t21_doc_signature",
    Some("""
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x != ''))), '|')) AS token_sig,
             CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x != ''))) AS INTEGER) AS n_distinct_tokens
      FROM documents
      ORDER BY doc_id
    """))((spark, dir) => {
    val toks = TextFns.tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(concat_ws("|", array_sort(array_distinct(toks)))).as("token_sig"),
        size(array_distinct(toks)).as("n_distinct_tokens"))
      .orderBy("doc_id")
  })

  private val langDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"))

  /** Language-ID heuristic: occurrence-weighted stopword hits per
    * language dictionary; argmax with a fixed priority order, 'unknown'
    * when nothing hits. (An n-gram char-model variant would train state;
    * the stopword form is the stateless, per-row-parallel one.) */
  val t22LangId: Op = Op(
    "t22_langid", {
    val hitsSql = langDicts.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(w, x -> list_contains($arr, x))) AS hits_$l"
    }.mkString(",\n               ")
    val caseSql =
      """CASE WHEN hits_en = 0 AND hits_es = 0 AND hits_de = 0 AND hits_fr = 0 THEN 'unknown'
        |     WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
        |     WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
        |     WHEN hits_de >= hits_fr THEN 'de'
        |     ELSE 'fr' END""".stripMargin
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
      ), scored AS (
        SELECT doc_id, lang,
               $hitsSql
        FROM toks
      )
      SELECT doc_id, lang AS labeled_lang,
             CAST(hits_en AS INTEGER) AS hits_en, CAST(hits_es AS INTEGER) AS hits_es,
             CAST(hits_de AS INTEGER) AS hits_de, CAST(hits_fr AS INTEGER) AS hits_fr,
             $caseSql AS predicted_lang
      FROM scored
      ORDER BY doc_id
    """)
  })((spark, dir) => {
    val toks = TextFns.tokens(col("text"))
    val withHits = langDicts.foldLeft(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang").as("labeled_lang"), toks.as("w"))) {
      case (df, (l, ws)) =>
        val dict = array(ws.map(lit): _*)
        df.withColumn(s"hits_$l", size(filter(col("w"), x => array_contains(dict, x))))
    }
    withHits
      .withColumn(
        "predicted_lang",
        when(col("hits_en") === 0 && col("hits_es") === 0 && col("hits_de") === 0 && col("hits_fr") === 0, "unknown")
          .when(col("hits_en") >= col("hits_es") && col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr"), "en")
          .when(col("hits_es") >= col("hits_de") && col("hits_es") >= col("hits_fr"), "es")
          .when(col("hits_de") >= col("hits_fr"), "de")
          .otherwise("fr"))
      .select("doc_id", "labeled_lang", "hits_en", "hits_es", "hits_de", "hits_fr", "predicted_lang")
      .orderBy("doc_id")
  })

  /** Quality scoring: length/word/distinct/stopword ratios combined into
    * a [0,1]-ish score. All ratios are integer-derived doubles, so the
    * score is bit-identical across engines. */
  val t23Quality: Op = Op(
    "t23_quality",
    Some("""
      WITH t AS (
        SELECT doc_id, n_chars,
               list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
      ), m AS (
        SELECT doc_id, n_chars,
               CAST(len(w) AS INTEGER) AS n_words,
               CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
               CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','is','in'], x))) AS INTEGER) AS n_stop
        FROM t
      )
      SELECT doc_id, n_chars, n_words, n_distinct,
             CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
             CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
             0.5 * (CAST(n_distinct AS DOUBLE) / n_words)
                      + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_words)
                      + 0.2 * LEAST(CAST(n_words AS DOUBLE) / 60.0, 1.0) AS quality_score
      FROM m
      ORDER BY doc_id
    """))((spark, dir) => {
    val stop = array(Seq("the", "a", "of", "and", "to", "is", "in").map(lit): _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), TextFns.tokens(col("text")).as("w"))
      .select(
        col("doc_id"), col("n_chars"),
        size(col("w")).as("n_words"),
        size(array_distinct(col("w"))).as("n_distinct"),
        size(filter(col("w"), x => array_contains(stop, x))).as("n_stop"))
      .select(
        col("doc_id"), col("n_chars"), col("n_words"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_words")).as("distinct_ratio"),
        (col("n_stop").cast("double") / col("n_words")).as("stopword_ratio"),
        (lit(0.5) * (col("n_distinct").cast("double") / col("n_words"))
          + lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_words"))
          + lit(0.2) * least(col("n_words").cast("double") / 60.0, lit(1.0))).as("quality_score"))
      .orderBy("doc_id")
  })

  /** Token counting: whitespace tokens vs a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars). */
  val t24TokenStats: Op = Op(
    "t24_token_stats",
    Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INTEGER) AS n_bpeish_tokens,
             CAST(length(text) AS INTEGER) AS n_chars_raw,
             CAST(length(text) AS DOUBLE)
               / len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS chars_per_token
      FROM documents
      ORDER BY doc_id
    """))((spark, dir) => {
    val bpeish = regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        size(bpeish).as("n_bpeish_tokens"),
        length(col("text")).as("n_chars_raw"),
        (length(col("text")).cast("double") / size(bpeish)).as("chars_per_token"))
      .orderBy("doc_id")
  })

  /** Document fingerprint: minimum md5 over character 8-grams (a
    * winnowing-style content fingerprint — stable under small edits
    * elsewhere in the doc), plus the 8-gram cardinality. */
  val t25Fingerprint: Op = Op(
    "t25_fingerprint",
    Some("""
      WITH g AS (
        SELECT doc_id,
               [md5(substring(text, i, 8)) FOR i IN generate_series(1, greatest(length(text) - 7, 1))] AS hs,
               [substring(text, i, 8) FOR i IN generate_series(1, greatest(length(text) - 7, 1))] AS gs
        FROM documents
      )
      SELECT doc_id,
             list_aggregate(hs, 'min') AS fingerprint,
             CAST(len(list_distinct(gs)) AS INTEGER) AS n_distinct_8grams
      FROM g
      ORDER BY doc_id
    """))((spark, dir) => {
    val grams = TextFns.charShingles(col("text"), 8)
    Tables.spread(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        array_min(transform(grams, g => md5(g))).as("fingerprint"),
        size(array_distinct(grams)).as("n_distinct_8grams"))
      .orderBy("doc_id")
  })

  /** TF-IDF top-3 terms per document. The idf factor is the RAW ratio
    * (N+1)/(df+1) rather than its logarithm: log is monotone, so the
    * per-document ranking is identical, while products and quotients of
    * small integers in IEEE double are exactly rounded on every engine —
    * a transcendental would risk last-ulp drift between libm
    * implementations and break hash equality. Shapes: one token explode,
    * one (doc, word) count, one word-level doc-frequency aggregate
    * joined back (broadcast at this vocabulary; shuffle-join at corpus
    * scale), one per-doc top-k window. */
  val t26TfIdf: Op = Op(
    "t26_tfidf_top_terms",
    Some("""
      WITH words AS (
        SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS word
        FROM documents
      ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
      ), df AS (
        SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
      ), n AS (
        SELECT COUNT(DISTINCT doc_id) AS n FROM words
      ), scored AS (
        SELECT doc_id, word,
               CAST(tf AS DOUBLE) * (CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) AS score
        FROM tf JOIN df USING (word) CROSS JOIN n
      ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rnk
        FROM scored
      )
      SELECT doc_id, word, CAST(rnk AS INTEGER) AS rnk, score
      FROM ranked WHERE rnk <= 3
      ORDER BY doc_id, rnk
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    // ONE doc_id exchange carries the whole query, placed on the RAW
    // (doc_id, text) rows so it moves ~5k strings, not ~1M exploded
    // words, and the tokenize+explode runs 32-way AFTER the shuffle
    // (it also replaces the usual Tables.spread round-robin — same
    // exchange, useful key). Hashpartitioning on doc_id satisfies the
    // tf aggregate's (doc_id, word) clustering (the subset rule),
    // survives the aggregate and the broadcast df join, and is exactly
    // the top-k window's required distribution — so the 650k-row scored
    // exchange+sort the window used to pay disappears; only df's
    // word-level rollup and the 15k-row presentation sort shuffle after
    // this point. (Partitioning by (doc_id, word) instead would
    // aggregate equally well but NOT satisfy the window, which is the
    // superset direction the rule rejects.)
    //
    // df and N both derive from the (doc, word) aggregate — tf rows are
    // distinct per (doc, word), so counting them per word IS the
    // document frequency. tf feeds THREE consumers (scored's join left,
    // df, n); cache it so the token stream is exploded and aggregated
    // once, not once per branch (same pattern as d2Pairs' shingle
    // cache — Spark does not reuse uncached non-exchange subtrees).
    // Release: Op functions return a LAZY frame, so there is no
    // after-the-terminal-action point to unpersist inside the op;
    // MEMORY_AND_DISK blocks are evicted LRU under executor-storage
    // pressure, which is the intended release path (long-lived sessions:
    // the bench additionally clearCache()s between reps).
    val tf = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .cache()
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().agg(count(lit(1)).as("n"))
    // No broadcast HINT on df: a natural-language lexicon is small, but
    // whitespace tokens over web text (urls, ids, typos) are unbounded —
    // a forced broadcast would hit the 8 GB limit and fail outright
    // where a shuffle join just gets slower. AQE's runtime stats convert
    // this to a broadcast join whenever df is actually small, which is
    // the graceful version of the same optimization.
    val scored = tf.join(df, Seq("word")).crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double")
          * ((col("n") + 1).cast("double") / (col("df") + 1).cast("double")))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("word"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("word"), col("rnk"), col("score"))
      .orderBy("doc_id", "rnk")
  })

  /** Deterministic hash-based train/valid/test split — the corpus-
    * curation primitive for reproducible sampling at any scale: the
    * split is a pure function of doc_id (md5 bucket 0-99 → 80/10/10),
    * so it is stable under re-runs, partitioning, and engine choice, and
    * needs no shuffle or state. Output is the per-(lang, split) census. */
  val t27HashSplit: Op = Op(
    "t27_hash_split_census",
    Some(s"""
      WITH s AS (
        SELECT doc_id, lang, ${HashSplit.duckSplit("doc_id")} AS split
        FROM documents
      )
      SELECT lang, split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
      FROM s
      GROUP BY lang, split
      ORDER BY lang, split
    """))((spark, dir) => {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), HashSplit.splitOf(col("doc_id")).as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .orderBy("lang", "split")
  })

  private val KMV_K = 64

  /** KMV (k-minimum-values) distinct-count sketch per language — the
    * mergeable-sketch primitive: each partition keeps only its k
    * smallest word hashes, merge = k smallest of a union, estimate =
    * (k−1)/U_k. Chosen over HLL because the sketch is a DETERMINISTIC
    * function of the data (the k minimum md5-derived values), so the
    * DuckDB mirror reproduces the estimate bit-for-bit — approximate in
    * accuracy, exact in cross-engine agreement. Groups with fewer than
    * k distinct values fall back to the exact count (the sketch is
    * exact below k by construction). */
  val t28KmvDistinct: Op = Op(
    "t28_kmv_distinct_sketch",
    Some(s"""
      WITH words AS (
        SELECT lang, UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS word
        FROM documents
      ), h AS (
        SELECT DISTINCT lang,
               CAST(('0x' || substring(md5(word), 1, 13)) AS BIGINT) AS h
        FROM words
      ), r AS (
        SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rnk FROM h
      ), kth AS (
        SELECT lang, h AS hk FROM r WHERE rnk = $KMV_K
      ), exact AS (
        SELECT lang, COUNT(DISTINCT word) AS n_exact FROM words GROUP BY lang
      )
      SELECT e.lang, CAST(n_exact AS BIGINT) AS n_exact,
             COALESCE(CAST(${KMV_K - 1} AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                        / CAST(hk AS DOUBLE),
                      CAST(n_exact AS DOUBLE)) AS kmv_estimate
      FROM exact e LEFT JOIN kth USING (lang)
      ORDER BY lang
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    // words feeds both the sketch and the exact branch (the oracle
    // defines n_exact over WORDS, not hashes, so the branches cannot
    // merge) — cache it rather than exploding the corpus twice.
    // Released by LRU eviction (see t26's cache note: lazy ops cannot
    // unpersist after an action they never run).
    val words = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("word"))
      .cache()
    // 52-bit uniform hash: md5 prefix, so U_k = hk / 2^52. Fused
    // (r14): same value, no md5-hex/conv strings.
    val h = words.select(col("lang"),
        TextFns.md5PrefixLong(col("word"), 13).as("h"))
      .distinct()
    val w = Window.partitionBy("lang").orderBy("h")
    val kth = h.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === KMV_K)
      .select(col("lang"), col("h").as("hk"))
    val exact = words.groupBy("lang").agg(countDistinct(col("word")).as("n_exact"))
    exact.join(kth, Seq("lang"), "left")
      .select(col("lang"), col("n_exact"),
        coalesce(
          lit((KMV_K - 1).toDouble) * lit(4503599627370496.0) / col("hk").cast("double"),
          col("n_exact").cast("double")).as("kmv_estimate"))
      .orderBy("lang")
  })

  /** Repetition-based quality signals per document — the filter family
    * pretraining pipelines use for degenerate/templated text (the
    * Gopher/MassiveText rules): type-token ratio (distinct words /
    * words), the most-frequent word's share, and the most-frequent
    * BIGRAM's share (highly repetitive boilerplate has a dominant
    * bigram even when unigrams look diverse). All three are exact
    * integer-count ratios — one (doc, word) aggregate and one
    * (doc, bigram) aggregate, both map-side combinable; nothing here
    * ranks or sorts the corpus. */
  val t29Repetition: Op = Op(
    "t29_repetition_quality",
    Some("""
      WITH words AS (
        SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS w
        FROM documents
      ), wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
      ), tok AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types, CAST(MAX(c) AS BIGINT) AS top
        FROM wc GROUP BY doc_id
      ), toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
      ), bg AS (
        SELECT doc_id, UNNEST([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w) - 1)]) AS g
        FROM toks WHERE len(w) >= 2
      ), bc AS (
        SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g
      ), big AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top2, CAST(SUM(c) AS BIGINT) AS n2
        FROM bc GROUP BY doc_id
      )
      SELECT t.doc_id, n_tokens, n_types,
             CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
             CAST(top AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
             COALESCE(CAST(top2 AS DOUBLE) / CAST(n2 AS DOUBLE), CAST(0 AS DOUBLE)) AS top_bigram_frac
      FROM tok t LEFT JOIN big USING (doc_id)
      ORDER BY doc_id
    """))((spark, dir) => {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
    val wc = docs.select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val tok = wc.groupBy("doc_id").agg(
      sum("c").as("n_tokens"), count(lit(1)).as("n_types"), max("c").as("top"))
    val bc = docs.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(TextFns.wordShingles(col("w"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val big = bc.groupBy("doc_id").agg(max("c").as("top2"), sum("c").as("n2"))
    tok.join(big, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double")).as("type_token_ratio"),
        (col("top").cast("double") / col("n_tokens").cast("double")).as("top_token_frac"),
        coalesce(col("top2").cast("double") / col("n2").cast("double"), lit(0.0))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  })

  private val PackBudget = 1024 // tokens per training sequence

  /** Greedy sequence packing — the step that turns a curated corpus
    * into fixed-token-budget training sequences: within each
    * (lang, shard), documents in doc_id order are assigned to the bin
    * their cumulative token offset starts in. Sharding is the same
    * deterministic md5-bucket as t27, which is exactly how production
    * packing scales: the running-sum window is per (lang, shard), so
    * no partition ever holds more than one shard's rows — never a
    * corpus-wide window. Output is the bin census (docs, tokens, fill
    * ratio against the budget). */
  val t30SequencePacking: Op = Op(
    "t30_sequence_packing",
    Some(s"""
      WITH d AS (
        SELECT lang, doc_id,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
               len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens
        FROM documents
      ), c AS (
        SELECT lang, shard, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM d
      ), b AS (
        SELECT lang, shard, n_tokens, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin
        FROM c
      )
      SELECT lang, CAST(shard AS BIGINT) AS shard, bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(n_tokens) AS DOUBLE) / $PackBudget AS fill_ratio
      FROM b
      GROUP BY lang, shard, bin
      ORDER BY lang, shard, bin
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"), col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 8).as("shard"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $PackBudget"))
    b.groupBy("lang", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .withColumn("fill_ratio", col("total_tokens").cast("double") / PackBudget)
      .orderBy("lang", "shard", "bin")
  })

  /** Dataset-mixture construction: per-SOURCE sampling rates (the
    * upweight-wikipedia / downweight-crawl step of building a
    * pretraining mix) applied as a deterministic hash acceptance test —
    * doc kept iff its 52-bit md5 bucket falls below the source's
    * rate threshold (rates here: 1, 1/2, 1/4 by source index mod 3;
    * thresholds are exact powers of two so both engines compare the
    * same integers). Like t27's split this is a pure per-row
    * projection + one aggregate: reproducible at any scale, no
    * sampling state, rerunnable per shard. The census reports
    * realized rates so mix drift is observable. */
  val t31SourceMixture: Op = Op(
    "t31_source_mixture",
    Some("""
      WITH d AS (
        -- coalesce+error mirrors the Spark side's loud NULL handling: a
        -- NULL source must abort the mixture build in BOTH engines, not
        -- silently take the 1/4-rate ELSE branch here while Spark raises.
        -- (Non-numeric suffixes already align: both CASTs throw.)
        SELECT source, lang,
               coalesce(CAST(substring(source, 4) AS INT),
                        error('t31_source_mixture: null source')) % 3 AS e,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS bucket,
               len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens
        FROM documents
      ), k AS (
        SELECT source, lang, n_tokens,
               CASE WHEN bucket < (CASE e WHEN 0 THEN 4503599627370496
                                          WHEN 1 THEN 2251799813685248
                                          ELSE 1125899906842624 END)
                    THEN 1 ELSE 0 END AS kept
        FROM d
      )
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(kept) AS BIGINT) AS n_kept,
             CAST(SUM(kept * n_tokens) AS BIGINT) AS kept_tokens,
             CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS realized_rate
      FROM k
      GROUP BY source, lang
      ORDER BY source, lang
    """))((spark, dir) => {
    // No length cap (mirrors the oracle's `substring(source, 4)`), and a
    // null parse fails LOUDLY instead of silently taking the 1/4-rate
    // branch: a source named outside `srcN` is a config error, and a
    // silently wrong mixture is the worst possible failure mode for a
    // pretraining mix. try_cast + raise_error gives the same loud error
    // in ANSI and non-ANSI sessions alike (plain cast would diverge).
    val idx = expr("try_cast(substring(source, 4) AS int)")
    val e = coalesce(idx, raise_error(format_string(
      "t31_source_mixture: source '%s' has no numeric suffix", col("source")))) % 3
    val threshold = when(e === 0, lit(4503599627370496L))
      .when(e === 1, lit(2251799813685248L))
      .otherwise(lit(1125899906842624L))
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10).cast("long")
    val k = Tables.spread(Tables.documents(spark, dir))
      .select(col("source"), col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
        when(bucket < threshold, 1L).otherwise(0L).as("kept"))
    k.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("n_tokens")).as("kept_tokens"))
      .withColumn("realized_rate",
        col("n_kept").cast("double") / col("n_total"))
      .select("source", "lang", "n_total", "n_kept", "kept_tokens", "realized_rate")
      .orderBy("source", "lang")
  })

  private val DecontamN = 8 // decontamination gram width (words)

  /** Benchmark decontamination: find evaluation documents whose word
    * 8-grams leak into the training pool — the check every serious
    * pretraining pipeline runs before trusting its eval numbers
    * (the GPT-3/Gopher n-gram-overlap method). The eval set here is the
    * deterministic doc_id % 50 == 0 slice; in production it is the
    * benchmark corpus.
    *
    * Scale shape: per-doc DISTINCT grams (array_distinct before the
    * explode keeps boilerplate from multiplying rows), int64 gram keys
    * (15-hex md5 prefix — the repo's standard cross-engine hash), then
    * ONE gram-keyed equi-join of the small eval side against the train
    * side — a hash join partitioned on the gram, never an all-pairs
    * comparison — into a per-eval-doc count-distinct. At 100 TB the
    * eval side is tiny and broadcastable; ultra-common grams (hot
    * keys) are the known skew point and would be pre-filtered by
    * document frequency in production. */
  val t32Decontamination: Op = Op(
    "t32_decontamination",
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
      ), grams AS (
        SELECT doc_id,
               UNNEST(list_distinct([array_to_string(w[i:i+${DecontamN - 1}], ' ')
                                     FOR i IN generate_series(1, len(w) - ${DecontamN - 1})])) AS g
        FROM toks WHERE len(w) >= $DecontamN
      ), hashed AS (
        SELECT doc_id, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS gh
        FROM grams
      ), eval_g AS (SELECT doc_id, gh FROM hashed WHERE doc_id % 50 = 0),
         train_g AS (SELECT doc_id, gh FROM hashed WHERE doc_id % 50 <> 0)
      SELECT e.doc_id AS eval_doc_id,
             CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_train_docs,
             CAST(COUNT(DISTINCT e.gh) AS BIGINT) AS n_shared_grams
      FROM eval_g e JOIN train_g t ON t.gh = e.gh
      GROUP BY e.doc_id
      ORDER BY eval_doc_id
    """))((spark, dir) => {
    val grams = decontamGrams(spark, dir)
    val evalG = grams.filter(col("doc_id") % 50 === 0)
    val trainG = grams.filter(col("doc_id") % 50 =!= 0)
    evalG.as("e").join(trainG.as("t"), col("e.gh") === col("t.gh"))
      .groupBy(col("e.doc_id").as("eval_doc_id"))
      .agg(
        countDistinct(col("t.doc_id")).as("n_train_docs"),
        countDistinct(col("e.gh")).as("n_shared_grams"))
      .orderBy("eval_doc_id")
  })

  /** (doc_id, gh): one row per DISTINCT word-8-gram per document, hashed
    * to int64 (15-hex md5 prefix, the repo's standard cross-engine key).
    * Shared by the two decontamination views (t32 eval-side audit, t37
    * train-side removal list). */
  private def decontamGrams(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= DecontamN)
      // Fused hash (r14): hash every position in one codegen'd loop,
      // then distinct the longs — the same set as distinct-strings →
      // md5 (equal grams hash equal), no gram strings, no conv parse.
      .select(col("doc_id"),
        explode(array_distinct(
          TextFns.wordShingleHashLong(col("w"), DecontamN))).as("gh"))

  // Bloom sizing for the t37 probe: fixed foldable constants (the
  // aggregate requires them) — 2^22 bits (512 KiB) over ~300k distinct
  // eval grams ≈ 14 bits/key ≈ sub-1% false positives at sf0.1. The
  // bits are ALSO the per-task aggregation-buffer size (every partial
  // allocates and serializes the full bitset), so oversizing is paid
  // n_partitions times at build; size for the real eval corpus, and
  // remember false positives only add rows to the confirming join,
  // never to the result.
  private val BloomEstItems = 1L * 1000 * 1000
  private val BloomNumBits = 1L << 22

  /** Train-side decontamination removal list — the other half of the
    * t32 audit: for each TRAINING document that shares a word-8-gram
    * with the eval slice, how many eval documents it collides with and
    * how many of its grams leak. This is the list a pretraining
    * pipeline actually acts on (drop/flag these docs before export);
    * t32 is the eval-side severity view of the same join.
    *
    * Scale shape: the train side is the 100 TB side, and this op never
    * shuffles it wholesale. A Bloom filter over the eval grams (built
    * lazily as a scalar subquery via [[org.apache.spark.sql.graft.BloomProbe]]
    * — Spark's own runtime-filter expression pair) is broadcast into
    * the train-side SCAN, so only candidate grams (true leaks + the
    * ~2% false-positive tail) flow into the exact confirming join that
    * removes false positives. The oracle is the PLAIN exact join — the
    * Bloom stage is pure pruning and must never change the answer,
    * which is exactly what BloomDecontamSpec pins (including under a
    * deliberately undersized, high-FP filter). */
  val t37BloomDecontam: Op = Op(
    "t37_bloom_decontamination",
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
      ), grams AS (
        SELECT doc_id,
               UNNEST(list_distinct([array_to_string(w[i:i+${DecontamN - 1}], ' ')
                                     FOR i IN generate_series(1, len(w) - ${DecontamN - 1})])) AS g
        FROM toks WHERE len(w) >= $DecontamN
      ), hashed AS (
        SELECT doc_id, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS gh
        FROM grams
      ), eval_g AS (SELECT doc_id, gh FROM hashed WHERE doc_id % 50 = 0),
         train_g AS (SELECT doc_id, gh FROM hashed WHERE doc_id % 50 <> 0)
      SELECT t.doc_id AS train_doc_id,
             CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs,
             CAST(COUNT(DISTINCT t.gh) AS BIGINT) AS n_leaked_grams
      FROM train_g t JOIN eval_g e ON t.gh = e.gh
      GROUP BY t.doc_id
      ORDER BY train_doc_id
    """))((spark, dir) => {
    val grams = decontamGrams(spark, dir)
    // evalG feeds TWO independent subtrees (the Bloom-build scalar
    // subquery and the confirming join's broadcast side), each of which
    // would otherwise re-run the full tokenize+8-gram+md5 corpus pass;
    // cache the eval slice (1/50th of the docs — the small side at any
    // scale) so the op pays the corpus scan twice (eval fill + train),
    // not three times. Released by storage LRU like the module's other
    // caches.
    val evalG = grams.filter(col("doc_id") % 50 === 0).cache()
    val trainG = grams.filter(col("doc_id") % 50 =!= 0)
    val candidates = trainG.filter(
      org.apache.spark.sql.graft.BloomProbe.mightContain(
        evalG, col("gh"), BloomEstItems, BloomNumBits)(col("gh")))
    candidates.as("t")
      .join(broadcast(evalG.as("e")), col("t.gh") === col("e.gh"))
      .groupBy(col("t.doc_id").as("train_doc_id"))
      .agg(
        countDistinct(col("e.doc_id")).as("n_eval_docs"),
        countDistinct(col("t.gh")).as("n_leaked_grams"))
      .orderBy("train_doc_id")
  })

  private val ChunkLen = 32    // tokens per chunk
  private val ChunkStride = 24 // stride between chunk starts (8-token overlap)

  /** Sliding-window document chunking — the RAG/context-window prep step
    * that cuts each document into fixed-token windows with overlap.
    * Chunk starts are 1, 1+stride, 1+2·stride, … ≤ len; the final chunk
    * may be short. Output is one row per chunk with an int64 content
    * hash (15-hex md5 prefix, the repo's standard cross-engine key)
    * instead of the chunk text, so the result stays narrow.
    *
    * Scale shape: a pure per-row projection + explode — no shuffle
    * except the presentation ORDER BY. The chunk count per row is
    * ⌈len/stride⌉, so output size is linear in corpus tokens; nothing
    * is corpus-global. */
  val t33DocChunking: Op = Op(
    "t33_doc_chunking",
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
      ), starts AS (
        SELECT doc_id, w, UNNEST(generate_series(1, len(w), $ChunkStride)) AS s
        FROM toks WHERE len(w) >= 1
      ), chunks AS (
        SELECT doc_id, CAST((s - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
               CAST(s AS BIGINT) AS start_token,
               w[s : s + ${ChunkLen - 1}] AS c
        FROM starts
      )
      SELECT doc_id, chunk_idx, start_token,
             CAST(len(c) AS BIGINT) AS n_tokens,
             CAST(('0x' || substring(md5(array_to_string(c, ' ')), 1, 15)) AS BIGINT) AS chunk_hash
      FROM chunks
      ORDER BY doc_id, chunk_idx
    """))((spark, dir) => {
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")), lit(ChunkStride))).as("s"))
      .select(col("doc_id"),
        expr(s"CAST((s - 1) div $ChunkStride AS BIGINT)").as("chunk_idx"),
        col("s").cast("long").as("start_token"),
        slice(col("w"), col("s"), lit(ChunkLen)).as("c"))
      .select(col("doc_id"), col("chunk_idx"), col("start_token"),
        size(col("c")).cast("long").as("n_tokens"),
        conv(substring(md5(array_join(col("c"), " ")), 1, 15), 16, 10)
          .cast("long").as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  })

  private val BlockSize = 512 // tokens per packed block

  /** Concat-and-split block packing — the OTHER standard way to turn a
    * corpus into fixed-size training sequences (t30 is the greedy
    * document-preserving bin packer; this is the GPT-style stream
    * packer that concatenates documents and cuts every `BlockSize`
    * tokens, splitting documents across block boundaries). Within each
    * (lang, md5-shard) stream, a document occupies token offsets
    * [cum − n, cum) of the concatenation and therefore intersects
    * blocks ⌊(cum−n)/B⌋ … ⌊(cum−1)/B⌋. Output is the per-block census:
    * document count, token count (= B for every interior block — the
    * packing invariant), and how many documents carried over from the
    * previous block.
    *
    * Scale shape: the running sum is per (lang, shard) exactly like
    * t30 — never a corpus-wide window — and each document expands to
    * its ⌈n/B⌉+1 block spans, so work is linear in corpus tokens. */
  val t34BlockPacking: Op = Op(
    "t34_block_packing",
    Some(s"""
      WITH d AS (
        SELECT lang, doc_id,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
               len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens
        FROM documents
      ), c AS (
        SELECT lang, shard, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM d WHERE n_tokens >= 1
      ), spans AS (
        SELECT lang, shard, cum, cum - n_tokens AS st,
               UNNEST(generate_series(CAST((cum - n_tokens) // $BlockSize AS BIGINT),
                                      CAST((cum - 1) // $BlockSize AS BIGINT))) AS block
        FROM c
      )
      SELECT lang, CAST(shard AS BIGINT) AS shard, CAST(block AS BIGINT) AS block,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LEAST(cum, (block + 1) * $BlockSize)
                      - GREATEST(st, block * $BlockSize)) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN st < block * $BlockSize THEN 1 ELSE 0 END) AS BIGINT) AS n_carryover
      FROM spans
      GROUP BY lang, shard, block
      ORDER BY lang, shard, block
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"), col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 8).as("shard"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("st", col("cum") - col("n_tokens"))
      .select(col("lang"), col("shard"), col("cum"), col("st"),
        explode(sequence(
          expr(s"st div $BlockSize"), expr(s"(cum - 1) div $BlockSize"))).as("block"))
    spans.groupBy("lang", "shard", "block")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("cum"), (col("block") + 1) * BlockSize)
          - greatest(col("st"), col("block") * BlockSize)).as("n_tokens"),
        sum(when(col("st") < col("block") * BlockSize, 1L).otherwise(0L))
          .as("n_carryover"))
      .orderBy("lang", "shard", "block")
  })

  /** Stratified deterministic sampling: keep exactly ⌈20%⌉ of each
    * language's documents, chosen by ranking on a salted md5-derived
    * int64 of the doc id — a uniform, reproducible draw that is a pure
    * function of the data (re-runs and both engines agree bit-for-bit),
    * the sampling primitive mixture building runs per stratum. The salt
    * ('samp:') decorrelates the draw from t27's split hash, so sampling
    * within a split stays uniform. The quota is integer math
    * ((n+4) div 5 = ⌈n/5⌉) — no float threshold to disagree on. At
    * scale: one window per stratum (lang cardinality is small; a
    * high-cardinality stratum key partitions the same way), and the
    * full-table count per stratum comes from the same window pass, not
    * a second scan. */
  val t35StratifiedSample: Op = Op(
    "t35_stratified_sample",
    Some("""
      WITH h AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substring(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM documents
      ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM h
      )
      SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, source,
             CAST(n_lang AS BIGINT) AS n_lang
      FROM r WHERE rnk <= (n_lang + 4) // 5
      ORDER BY lang, rnk
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val h = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        conv(substring(md5(concat(lit("samp:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("hv"))
    val byLang = Window.partitionBy("lang")
    h.withColumn("rnk", row_number().over(byLang.orderBy(col("hv"), col("doc_id"))))
      .withColumn("n_lang", count(lit(1)).over(byLang))
      .filter(col("rnk") <= expr("(n_lang + 4) div 5"))
      .select(col("lang"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("source"), col("n_lang"))
      .orderBy("lang", "rnk")
  })

  // PII patterns — ASCII-conservative so Java regex (Spark) and RE2
  // (DuckDB) agree exactly: both support these classes, quantifiers and
  // \b identically. Replacement order is fixed (email, IPv4, phone) and
  // mirrored in the oracle.
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redact all three PII classes from a text column (fixed order). */
  def scrubPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** PII census + scrub accounting per language — the redaction stage
    * every public-corpus pipeline runs before training. Counts emails /
    * IPv4s / phone numbers per doc (pure per-row regex work — no
    * shuffle until the tiny per-lang rollup) and reports, per language:
    * docs containing any PII, total matches per class, and the exact
    * post-scrub character volume (integer lengths, so both engines
    * agree bit-for-bit). The scrub itself is [[scrubPii]]; this census
    * is the audit artifact a pipeline owner reviews — a source suddenly
    * contributing thousands of emails is the regression signal.
    *
    * Counting contract: each class is counted independently on the RAW
    * text, so nested matches are counted once per class (an address like
    * `user@10.0.0.1.com` is one email AND one IPv4 detection) while the
    * sequential scrub replaces only the outermost — the census measures
    * detection exposure per class, not replacement arithmetic. */
  val t36PiiScrub: Op = Op(
    "t36_pii_scrub",
    Some(s"""
      WITH c AS (
        SELECT lang,
               len(regexp_extract_all(text, '$EmailRe')) AS n_em,
               len(regexp_extract_all(text, '$Ipv4Re')) AS n_ip,
               len(regexp_extract_all(text, '$PhoneRe')) AS n_ph,
               length(regexp_replace(regexp_replace(regexp_replace(
                 text, '$EmailRe', '<EMAIL>', 'g'),
                 '$Ipv4Re', '<IP>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_len
        FROM documents
      )
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_em + n_ip + n_ph > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_pii,
             CAST(SUM(n_em) AS BIGINT) AS n_emails,
             CAST(SUM(n_ip) AS BIGINT) AS n_ipv4,
             CAST(SUM(n_ph) AS BIGINT) AS n_phones,
             CAST(SUM(scrubbed_len) AS BIGINT) AS scrubbed_chars
      FROM c
      GROUP BY lang
      ORDER BY lang
    """))((spark, dir) => {
    val c = Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_em"),
        size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).as("n_ip"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_ph"),
        length(scrubPii(col("text"))).as("scrubbed_len"))
    c.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_em") + col("n_ip") + col("n_ph") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"),
        sum(col("n_em")).cast("long").as("n_emails"),
        sum(col("n_ip")).cast("long").as("n_ipv4"),
        sum(col("n_ph")).cast("long").as("n_phones"),
        sum(col("scrubbed_len")).as("scrubbed_chars"))
      .orderBy("lang")
  })

  override def ops: Seq[Op] =
    Seq(t20WordFreq, t21DocSignature, t22LangId, t23Quality, t24TokenStats,
      t25Fingerprint, t26TfIdf, t27HashSplit, t28KmvDistinct, t29Repetition,
      t30SequencePacking, t31SourceMixture, t32Decontamination,
      t33DocChunking, t34BlockPacking, t35StratifiedSample, t36PiiScrub,
      t37BloomDecontam)
}
