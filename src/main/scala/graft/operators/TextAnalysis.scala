package graft.operators

import graft.{CacheScope, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extension beyond the reference surface): token counting, quality
  * scoring, language-ID heuristic, document fingerprinting.
  *
  * All are pure column expressions / explode+agg shapes, so they scale
  * embarrassingly parallel: no shuffle except the per-doc re-aggregation
  * after explode, which is partial-agg friendly (doc_id keys are unique
  * and dense, no skew).
  */
object TextAnalysis {

  private val stopEn = Seq("the", "a", "of", "and", "to")

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting + per-doc scalar stats (no shuffle at all)
    QueryDef(
      "text_tokens",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"),
            length(col("text")).as("n_chars_computed"),
            col("n_chars"),
            (length(col("text")) -
              length(regexp_replace(col("text"), " ", ""))).as("n_spaces"),
            length(regexp_replace(col("text"), "[^aeiou]", "")).as("n_vowels"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                length(text) AS n_chars_computed,
                n_chars,
                length(text) - length(replace(text, ' ', '')) AS n_spaces,
                length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels
              FROM documents ORDER BY doc_id""")),

    // ---- quality scoring: stopword ratio + vocabulary diversity via
    //      explode -> re-aggregate (map-side combinable)
    QueryDef(
      "text_quality",
      (s, d) => {
        val toks = Tables.t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        toks.groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_distinct"),
            (countDistinct(col("tok")).cast("double") / count(lit(1)))
              .as("diversity"),
            (sum(when(col("tok").isin(stopEn: _*), 1).otherwise(0)).cast("double") /
              count(lit(1))).as("stopword_ratio"),
            (sum(length(col("tok"))).cast("double") / count(lit(1)))
              .as("avg_token_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, COUNT(*) AS n_tokens,
                 COUNT(DISTINCT tok) AS n_distinct,
                 CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS diversity,
                 CAST(SUM(CASE WHEN tok IN (${stopEn.map("'" + _ + "'").mkString(",")})
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stopword_ratio,
                 CAST(SUM(length(tok)) AS DOUBLE) / COUNT(*) AS avg_token_len
               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents)
               GROUP BY doc_id ORDER BY doc_id""")),

    // ---- language-ID heuristic: marker-token hit counts per language,
    //      argmax with deterministic tiebreak
    QueryDef(
      "text_langid",
      (s, d) => {
        val markers = Map(
          "en" -> Seq("the", "a", "and", "query", "join"),
          "de" -> Seq("der", "die", "das", "und", "nicht"),
          "es" -> Seq("el", "la", "los", "que", "y"),
          "fr" -> Seq("le", "la", "les", "et", "que"))
        val toks = Tables.t(s, d, "documents")
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
        val scoreCols = markers.toSeq.map { case (l, ws) =>
          sum(when(col("tok").isin(ws: _*), 1).otherwise(0)).as(s"s_$l")
        }
        val scored = toks.groupBy(col("doc_id"), col("lang"))
          .agg(scoreCols.head, scoreCols.tail: _*)
        scored.select(
            col("doc_id"), col("lang").as("labeled_lang"),
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
                 col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
              .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
                    col("s_de") > 0, "de")
              .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
              .when(col("s_fr") > 0, "fr")
              .otherwise("unknown").as("guessed_lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
                SELECT doc_id, lang,
                  SUM(CASE WHEN tok IN ('the','a','and','query','join') THEN 1 ELSE 0 END) AS s_en,
                  SUM(CASE WHEN tok IN ('der','die','das','und','nicht') THEN 1 ELSE 0 END) AS s_de,
                  SUM(CASE WHEN tok IN ('el','la','los','que','y') THEN 1 ELSE 0 END) AS s_es,
                  SUM(CASE WHEN tok IN ('le','la','les','et','que') THEN 1 ELSE 0 END) AS s_fr
                FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY doc_id, lang)
              SELECT doc_id, lang AS labeled_lang,
                CASE
                  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                  WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                  WHEN s_fr > 0 THEN 'fr'
                  ELSE 'unknown' END AS guessed_lang
              FROM scored ORDER BY doc_id""")),

    // ---- rolling-hash winnowing fingerprint: min of Rabin-Karp hashes of
    //      all 8-char windows. The native expression is O(n) per doc (true
    //      rolling update); the oracle recomputes each window in O(n·k).
    QueryDef(
      "text_winnow",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            graft.functions.expressions.winnowFingerprint(col("text"), lit(8))
              .as("winnow_fp"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                CAST((SELECT MIN(list_reduce(
                    list_prepend(CAST(0 AS HUGEINT),
                      list_transform(string_split(substr(text, i, 8), ''),
                                     c -> CAST(ascii(c) AS HUGEINT))),
                    (a, b) -> (a * 31 + b) % 2305843009213693951))
                 FROM unnest(generate_series(1, length(text) - 7)) AS u(i))
                  AS BIGINT) AS winnow_fp
              FROM documents ORDER BY doc_id""")),

    // ---- document fingerprinting: content hash + order-insensitive
    //      bag-of-words fingerprint (md5-derived 60-bit integer)
    QueryDef(
      "text_fingerprint",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            md5(col("text").cast("binary")).as("content_md5"),
            conv(substring(md5(
              array_join(array_sort(split(col("text"), " ")), " ").cast("binary")),
              1, 15), 16, 10).cast("long").as("bow_fingerprint"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                md5(text) AS content_md5,
                CAST('0x' || substr(md5(array_to_string(list_sort(string_split(text,' ')), ' ')), 1, 15)
                     AS BIGINT) AS bow_fingerprint
              FROM documents ORDER BY doc_id""")),

    // ---- MATCH ... AGAINST natural-language mode (reference
    //      sql/expression/matchagainst.go + sql/fulltext/fulltext.go:
    //      word-tokenized relevance). Spark-first TF-IDF: per-doc term
    //      frequencies stay in whole-stage codegen; the corpus document
    //      frequencies are ONE aggregated row broadcast back over the scan
    //      (no per-row subquery, no second shuffle) — the same plan shape
    //      holds at 100 TB with the stats row still scalar-sized.
    QueryDef(
      "text_match",
      (s, d) => {
        val toks = split(lower(col("text")), "[^a-z0-9]+")
        def tf(term: String) =
          size(filter(toks, w => w === term))
        val scored = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            tf("data").as("tf_data"), tf("learning").as("tf_learning"))
        val stats = scored.agg(
          count(lit(1)).as("n_docs"),
          sum((col("tf_data") > 0).cast("long")).as("df_data"),
          sum((col("tf_learning") > 0).cast("long")).as("df_learning"))
        scored.crossJoin(broadcast(stats))
          .select(
            col("doc_id"), col("tf_data"), col("tf_learning"),
            round(
              when(col("df_data") > 0, col("tf_data") *
                log(col("n_docs").cast("double") / col("df_data"))).otherwise(0.0) +
              when(col("df_learning") > 0, col("tf_learning") *
                log(col("n_docs").cast("double") / col("df_learning"))).otherwise(0.0),
              6).as("relevance"),
            (col("tf_data") + col("tf_learning") > 0).as("matched"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tfs AS (
                SELECT doc_id,
                  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    w -> w = 'data')) AS INT) AS tf_data,
                  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    w -> w = 'learning')) AS INT) AS tf_learning
                FROM documents),
              stats AS (
                SELECT count(*) AS n_docs,
                  sum(CASE WHEN tf_data > 0 THEN 1 ELSE 0 END) AS df_data,
                  sum(CASE WHEN tf_learning > 0 THEN 1 ELSE 0 END) AS df_learning
                FROM tfs)
              SELECT doc_id, tf_data, tf_learning,
                round(CASE WHEN df_data > 0
                        THEN tf_data * ln(CAST(n_docs AS DOUBLE) / df_data)
                        ELSE 0.0 END +
                      CASE WHEN df_learning > 0
                        THEN tf_learning * ln(CAST(n_docs AS DOUBLE) / df_learning)
                        ELSE 0.0 END, 6) AS relevance,
                (tf_data + tf_learning) > 0 AS matched
              FROM tfs, stats ORDER BY doc_id""")),

    // ---- deterministic train/val/test split — a training-data pipeline
    //      staple (beyond the reference surface): assignment is a pure
    //      function of (doc_id, salt) via md5 bucketing, so it is stable
    //      across runs, cluster sizes, and partitionings — no sampling
    //      state, no shuffle for the assignment itself. The query verifies
    //      the per-language stratification counts (80/10/10 target).
    QueryDef(
      "sample_split",
      (s, d) => {
        // bucket in [0, 100): first 7 md5 hex digits are uniform
        val bucket = (conv(substring(
          md5(concat(col("doc_id"), lit(":split:v1"))), 1, 7), 16, 10)
          .cast("long") % 100).cast("int")
        val split = when(bucket < 80, "train")
          .when(bucket < 90, "val").otherwise("test")
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("lang"), split.as("split"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("lang"), col("split"))
      },
      Some("""SELECT lang, split, COUNT(*) AS n_docs,
                MIN(doc_id) AS first_doc
              FROM (
                SELECT doc_id, lang,
                  CASE WHEN b < 80 THEN 'train'
                       WHEN b < 90 THEN 'val' ELSE 'test' END AS split
                FROM (
                  SELECT doc_id, lang,
                    CAST('0x' || substr(md5(doc_id || ':split:v1'), 1, 7)
                      AS BIGINT) % 100 AS b
                  FROM documents))
              GROUP BY lang, split ORDER BY lang, split""")),

    // ---- MATCH ... AGAINST (... WITH QUERY EXPANSION) — reference
    //      fulltext.go's third mode: blind relevance feedback. Pass 1
    //      scores the original terms; the top-5 documents' most frequent
    //      long tokens (minus the originals and stopwords) become
    //      expansion terms; pass 2 re-scores with the expanded set. The
    //      expansion vocabulary is DATA (a 3-row broadcast), so pass 2 is
    //      an equi-join on token, not a re-planned literal — the shape a
    //      100 TB expansion needs. Every step is deterministically
    //      tie-broken, so DuckDB re-derives identical expansion terms.
    QueryDef(
      "text_query_expansion",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val toks = split(lower(col("text")), "[^a-z0-9]+")
        def tf(term: String) = size(filter(toks, w => w === term))
        val scored = docs.select(col("doc_id"), toks.as("tk"),
          (tf("data") + tf("learning")).as("rel1"))
        val wTop = Window.orderBy(col("rel1").desc, col("doc_id"))
        val topDocs = scored.filter(col("rel1") > 0)
          .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 5)
        val stop = stopEn ++ Seq("data", "learning")
        val expansion = topDocs
          .select(explode(col("tk")).as("tok"))
          .filter(length(col("tok")) >= 4 && !col("tok").isInCollection(stop))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          .withColumn("trk", row_number().over(
            Window.orderBy(col("n").desc, col("tok"))))
          .filter(col("trk") <= 3)
          .select(col("tok"))
        val expHits = scored
          .select(col("doc_id"), explode(col("tk")).as("tok"))
          .join(broadcast(expansion), Seq("tok"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("rel_exp"))
        scored.join(expHits, Seq("doc_id"), "left")
          .na.fill(0, Seq("rel_exp"))
          .select(col("doc_id"), col("rel1"), col("rel_exp"),
            (col("rel1") + col("rel_exp")).as("rel_total"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '[^a-z0-9]+') AS tk
                FROM documents),
              scored AS (
                SELECT doc_id, tk,
                  CAST(len(list_filter(tk, w -> w = 'data')) AS INT) +
                  CAST(len(list_filter(tk, w -> w = 'learning')) AS INT)
                    AS rel1
                FROM t),
              top_docs AS (
                SELECT doc_id, tk FROM (
                  SELECT doc_id, tk,
                    row_number() OVER (ORDER BY rel1 DESC, doc_id) AS rk
                  FROM scored WHERE rel1 > 0) WHERE rk <= 5),
              expansion AS (
                SELECT tok FROM (
                  SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok)
                    AS trk
                  FROM (SELECT unnest(tk) AS tok FROM top_docs)
                  WHERE length(tok) >= 4
                    AND tok NOT IN ('the','a','of','and','to','data','learning')
                  GROUP BY tok) WHERE trk <= 3),
              exp_hits AS (
                SELECT doc_id, COUNT(*) AS rel_exp
                FROM (SELECT doc_id, unnest(tk) AS tok FROM scored) x
                JOIN expansion e ON x.tok = e.tok
                GROUP BY doc_id)
              SELECT s.doc_id, s.rel1,
                CAST(COALESCE(h.rel_exp, 0) AS BIGINT) AS rel_exp,
                CAST(s.rel1 + COALESCE(h.rel_exp, 0) AS BIGINT) AS rel_total
              FROM scored s LEFT JOIN exp_hits h ON s.doc_id = h.doc_id
              ORDER BY s.doc_id""")),

    // ---- MATCH ... AGAINST ('...' IN BOOLEAN MODE) — reference
    //      sql/fulltext/fulltext.go + sql/expression/matchagainst.go
    //      boolean-mode grammar: `+word` required, `-word` excluded,
    //      bare words optional (contribute to relevance), `"phrase"`
    //      contiguous-token match, `word*` prefix wildcard. The query
    //      string is a plan-time literal, so the grammar compiles straight
    //      to codegen'd column predicates over the token array — zero
    //      extra shuffles, scan-speed at 100 TB. Boolean-mode relevance is
    //      the TF sum of non-excluded present terms (no IDF / 50% rule,
    //      matching MySQL's boolean scorer).
    QueryDef(
      "text_match_boolean",
      (s, d) => {
        import graft.functions.FullText
        val toks = split(lower(col("text")), "[^a-z0-9]+")
        val norm = concat(lit(" "),
          regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), lit(" "))
        def tf(term: String) = size(filter(toks, w => w === term))
        val (matched, relevance) = FullText.booleanMatch(col("text"),
          """+data -quantum "machine learning" learn*""")
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            tf("data").as("tf_data"),
            tf("quantum").as("tf_quantum"),
            (instr(norm, " machine learning ") > 0).cast("int")
              .as("has_phrase"),
            size(filter(toks, w => w.startsWith("learn")))
              .as("tf_learn_star"),
            matched.as("matched"),
            relevance.as("relevance"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '[^a-z0-9]+') AS toks,
                  ' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')
                    || ' ' AS norm
                FROM documents),
              f AS (
                SELECT doc_id,
                  CAST(len(list_filter(toks, w -> w = 'data')) AS INT) AS tf_data,
                  CAST(len(list_filter(toks, w -> w = 'quantum')) AS INT)
                    AS tf_quantum,
                  CAST(CASE WHEN instr(norm, ' machine learning ') > 0
                    THEN 1 ELSE 0 END AS INT) AS has_phrase,
                  CAST(len(list_filter(toks, w -> w LIKE 'learn%')) AS INT)
                    AS tf_learn_star
                FROM t)
              SELECT doc_id, tf_data, tf_quantum, has_phrase, tf_learn_star,
                tf_data > 0 AND tf_quantum = 0 AS matched,
                CASE WHEN tf_data > 0 AND tf_quantum = 0
                  THEN tf_data + has_phrase + tf_learn_star ELSE 0 END
                  AS relevance
              FROM f ORDER BY doc_id""")),

    // ---- PII / markup scrubbing: email, URL and phone redaction as
    //      pure regexp_replace chains — per-row, shuffle-free, codegen'd;
    //      the standard pre-training cleanup pass. Deterministic synthetic
    //      PII is injected per doc so the redaction is actually exercised
    //      (the corpus itself is clean). Patterns avoid lookaround so the
    //      Java-regex (Spark) and RE2 (oracle) dialects agree.
    QueryDef(
      "text_scrub",
      (s, d) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val urlRe = "https?://[A-Za-z0-9./_-]+"
        val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
        val injected = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com via http://ex.com/p/"), col("doc_id").cast("string"),
          lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        val scrubbed = regexp_replace(
          regexp_replace(
            regexp_replace(injected, emailRe, "<EMAIL>"),
            urlRe, "<URL>"),
          phoneRe, "<PHONE>")
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            regexp_count(injected, lit(emailRe)).as("n_emails"),
            regexp_count(injected, lit(urlRe)).as("n_urls"),
            regexp_count(injected, lit(phoneRe)).as("n_phones"),
            length(scrubbed).as("scrub_len"),
            md5(scrubbed.cast("binary")).as("scrub_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH inj AS (
                SELECT doc_id,
                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com via http://ex.com/p/'
                    || CAST(doc_id AS VARCHAR) || ' call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
                FROM documents),
              scrub AS (
                SELECT doc_id, t,
                  regexp_replace(regexp_replace(regexp_replace(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    'https?://[A-Za-z0-9./_-]+', '<URL>', 'g'),
                    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS clean
                FROM inj)
              SELECT doc_id,
                len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                len(regexp_extract_all(t, 'https?://[A-Za-z0-9./_-]+')) AS n_urls,
                len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{4}\b')) AS n_phones,
                length(clean) AS scrub_len,
                md5(clean) AS scrub_md5
              FROM scrub ORDER BY doc_id""")),

    // ---- repetition stats (Gopher-style quality filters): duplicate-word
    //      fraction and most-frequent-bigram fraction. Bigram counting is
    //      explode -> two-level agg keyed on doc_id — map-side combinable,
    //      no skew (doc_id is unique-dense); the word stats are per-row
    //      array ops. One shuffle on doc_id total.
    QueryDef(
      "text_repetition",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val wordStats = docs.select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_words"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct_words"))
        // split() projected once — a lambda-body reference would
        // re-evaluate it per bigram (quadratic in document length)
        val bigrams = docs
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(ws) >= 2
                 THEN transform(sequence(1, size(ws) - 1),
                   i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
                 ELSE CAST(array() AS array<string>) END""")).as("b"))
        val perBigram = bigrams.groupBy(col("doc_id"), col("b"))
          .agg(count(lit(1)).as("c"))
        val perDoc = perBigram.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_cnt"))
        wordStats.join(perDoc, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_words"),
            (col("n_distinct_words").cast("double") / col("n_words"))
              .as("distinct_word_frac"),
            (col("top_cnt").cast("double") / col("n_bigrams"))
              .as("top_bigram_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              ws AS (
                SELECT doc_id, len(ws) AS n_words,
                  len(list_distinct(ws)) AS n_distinct_words
                FROM w),
              bg AS (
                SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                  i -> ws[i] || ' ' || ws[i+1])) AS b
                FROM w WHERE len(ws) >= 2),
              bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
              ba AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                       MAX(c) AS top_cnt
                     FROM bc GROUP BY doc_id)
              SELECT ws.doc_id, n_words,
                CAST(n_distinct_words AS DOUBLE) / n_words AS distinct_word_frac,
                CAST(top_cnt AS DOUBLE) / n_bigrams AS top_bigram_frac
              FROM ws LEFT JOIN ba ON ws.doc_id = ba.doc_id
              ORDER BY ws.doc_id""")),

    // ---- benchmark-contamination check: fraction of each doc's distinct
    //      word 5-grams that appear in a "benchmark" set (docs with
    //      doc_id % 97 = 0 stand in for an eval suite). The benchmark
    //      n-gram set is small by construction, so the membership probe is
    //      a BROADCAST semi-join against the corpus n-grams — the corpus
    //      side never shuffles; per-doc re-agg is partial-agg friendly.
    QueryDef(
      "text_contamination",
      (s, d) => {
        // per-doc dedup is a per-ROW array_distinct, not a (doc_id, ngram)
        // distinct — no corpus-wide shuffle just to dedupe within docs.
        // N-grams are represented as xxhash64 of the 5-word slice, never
        // materialized as strings: extraction skips the per-window concat
        // alloc, the per-row distinct and the bench membership probe run
        // over 8-byte longs, and the broadcast set is ~8× smaller. A
        // 64-bit collision would merge two distinct n-grams (birthday
        // bound ~n²/2⁶⁵ — immaterial at any corpus size that fits an
        // engine). split() is projected ONCE before the lambda —
        // referencing it inside the transform body re-evaluates the
        // split per n-gram, turning extraction quadratic in doc length.
        val docs = Tables.t(s, d, "documents")
        // ONE corpus text scan: the hashed n-gram frame persists and
        // both the bench set and the corpus probe derive from it
        // (PlanAuditSpec pins the single-scan shape)
        val ngs = CacheScope.track(docs
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), expr(
            """array_distinct(CASE WHEN size(ws) >= 5
                 THEN transform(sequence(1, size(ws) - 4),
                   i -> xxhash64(slice(ws, i, 5)))
                 ELSE CAST(array() AS array<bigint>) END)""").as("ngs"))
          .persist())
        val bench = ngs.filter(col("doc_id") % 97 === 0)
          .select(explode(col("ngs")).as("ng")).distinct()
          .withColumn("hit", lit(1))
        ngs
          .select(col("doc_id"), size(col("ngs")).as("n_ngrams"),
            explode(col("ngs")).as("ng"))
          .join(broadcast(bench), Seq("ng"), "left")
          .groupBy(col("doc_id"))
          .agg(max(col("n_ngrams")).cast("long").as("n_ngrams"),
            sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(col("doc_id"), col("n_ngrams"), col("n_hits"),
            (col("n_hits").cast("double") / col("n_ngrams"))
              .as("contamination_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              ng AS (
                SELECT DISTINCT doc_id, ng FROM (
                  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
                    i -> array_to_string(ws[i:i+4], ' '))) AS ng
                  FROM w WHERE len(ws) >= 5)),
              bench AS (
                SELECT DISTINCT ng FROM ng WHERE doc_id % 97 = 0)
              SELECT n.doc_id,
                COUNT(*) AS n_ngrams,
                CAST(SUM(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits,
                CAST(SUM(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) AS contamination_frac
              FROM ng n LEFT JOIN bench b ON n.ng = b.ng
              GROUP BY n.doc_id ORDER BY n.doc_id""")),

    // ---- corpus bigram statistics per document: a count-based language
    //      -model quality signal (the shape of a KenLM perplexity filter,
    //      kept in exact integer arithmetic so the score is deterministic
    //      across engines and merge orders). Model build = one shuffle on
    //      the bigram; scoring = equi-join back, per-doc aggregate. At
    //      100 TB the model is a table, not a broadcast — the same join
    //      shape holds.
    QueryDef(
      "text_bigram_stats",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        // persisted: the model build AND the scoring join both read the
        // exploded bigrams — one corpus scan + tokenization pass total
        // (at 100 TB: a checkpoint table, same plan shape)
        val bi = CacheScope.track(docs.select(col("doc_id"), posexplode(
            when(size(col("w")) >= 2, expr(
              "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"))
              .otherwise(expr("array()")))
            .as(Seq("pos", "bg")))
          .persist())
        val model = bi.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
        bi.join(model, "bg")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_bigrams"),
            (sum(col("c2")).cast("double") / count(lit(1)))
              .as("avg_bigram_count"),
            count(when(col("c2") <= 2, 1)).as("n_rare"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH words AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              bi AS (
                SELECT doc_id,
                  unnest(list_transform(range(0, len(w)-1),
                    i -> w[i+1] || ' ' || w[i+2])) AS bg
                FROM words),
              model AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY bg)
              SELECT doc_id, COUNT(*) AS n_bigrams,
                CAST(SUM(c2) AS DOUBLE) / COUNT(*) AS avg_bigram_count,
                COUNT(CASE WHEN c2 <= 2 THEN 1 END) AS n_rare
              FROM bi JOIN model USING (bg)
              GROUP BY doc_id ORDER BY doc_id""")),

    // ---- sequence packing: greedily fill documents into fixed-size
    //      token windows (the "pack training examples into context
    //      length" step of an LLM data pipeline). Documents hash into
    //      BUCKETS — the unit of parallelism — and pack sequentially in
    //      doc_id order inside each bucket via flatMapGroups (genuine
    //      per-partition imperative state; each bucket's packer is O(1)
    //      memory beyond its own docs). An oversized document occupies a
    //      window of its own. 100 TB path: bucket count scales with the
    //      corpus (shard key), so each group stays executor-sized; the
    //      single shuffle is the groupByKey on bucket. Oracle: the same
    //      greedy fill as a per-bucket recursive CTE.
    QueryDef(
      "text_pack_sequences",
      (s, d) => {
        import s.implicits._
        val C = 2048
        val NB = 8
        val toks = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            (col("doc_id") % NB).cast("int").as("bucket"),
            size(split(col("text"), " ")).as("tokens"))
          .as[(Long, Int, Int)]
        toks.groupByKey(_._2)
          .flatMapGroups { (bucket: Int, it: Iterator[(Long, Int, Int)]) =>
            val docs = it.toArray.sortBy(_._1)
            var acc = 0; var pack = 0; var first = true
            docs.iterator.map { case (id, _, t) =>
              if (first) { acc = t; first = false }
              else if (acc + t > C) { pack += 1; acc = t }
              else acc += t
              (id, bucket, pack, t)
            }
          }
          .toDF("doc_id", "bucket", "pack_id", "tokens")
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE ordered AS (
                SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS bucket,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS tokens,
                       row_number() OVER (PARTITION BY doc_id % 8
                                          ORDER BY doc_id) AS rn
                FROM documents),
              rec AS (
                SELECT bucket, rn, doc_id, tokens,
                       tokens AS acc, 0 AS pack
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.bucket, o.rn, o.doc_id, o.tokens,
                  CASE WHEN r.acc + o.tokens > 2048 THEN o.tokens
                       ELSE r.acc + o.tokens END,
                  CASE WHEN r.acc + o.tokens > 2048 THEN r.pack + 1
                       ELSE r.pack END
                FROM rec r JOIN ordered o
                  ON o.bucket = r.bucket AND o.rn = r.rn + 1)
              SELECT doc_id, bucket, CAST(pack AS INTEGER) AS pack_id, tokens
              FROM rec ORDER BY doc_id""")),

    // ---- overlapping document chunking (the RAG / context-window prep
    // step every training-data pipeline runs before embedding):
    // fixed-size character windows with overlap, plus a per-chunk md5
    // for downstream exact dedup. Pure per-row explode — NO shuffle
    // anywhere in the plan (the ORDER BY is presentation-only for the
    // oracle compare); the explode factor is bounded by
    // ceil(doc_len/stride), so executor memory stays flat at 100 TB and
    // parallelism follows the parquet splits.
    QueryDef(
      "text_chunk",
      (s, d) => {
        // K=500-char chunks, 100-char overlap -> stride 400
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            length(col("text")).as("len"))
          .withColumn("n_chunks",
            expr("greatest(1, (len - 100 + 399) div 400)"))
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
          .select(
            col("doc_id"),
            col("chunk_id").cast("int").as("chunk_id"),
            (col("chunk_id") * 400 + 1).cast("int").as("chunk_start"),
            expr("substring(text, cast(chunk_id*400+1 as int), 500)")
              .as("chunk"),
            md5(expr("substring(text, cast(chunk_id*400+1 as int), 500)"))
              .as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some("""WITH d AS (
                SELECT doc_id, text, length(text) AS len FROM documents),
              n AS (
                SELECT doc_id, text,
                       greatest(1, (len - 100 + 399) // 400) AS n_chunks
                FROM d),
              c AS (
                SELECT doc_id, text,
                       CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_id
                FROM n)
              SELECT doc_id, chunk_id,
                     CAST(chunk_id*400 + 1 AS INTEGER) AS chunk_start,
                     substring(text, chunk_id*400 + 1, 500) AS chunk,
                     md5(substring(text, chunk_id*400 + 1, 500)) AS chunk_md5
              FROM c ORDER BY doc_id, chunk_id""")),

    // ---- balanced per-group sampling (the data-mixing step that caps
    // each language/source at a quota so one domain can't dominate a
    // training mix): deterministic md5 order inside each group, keep the
    // first N. One hash exchange on the group key; the window is
    // bounded per group, and at 100 TB a skew-heavy group bounds at the
    // same quota — the shuffle carries only (doc_id, lang, md5), not
    // the document text (projection pruned before the exchange).
    QueryDef(
      "sample_balanced",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(concat(col("doc_id"), lit(":bal:v1"))))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("lang"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 200)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_kept,
                MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
              FROM (
                SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(doc_id || ':bal:v1')) AS rn
                FROM documents)
              WHERE rn <= 200
              GROUP BY lang ORDER BY lang""")),

    // ---- keyword extraction: top-3 TF-IDF terms per document (the
    //      tagging / routing step of a corpus pipeline). Two token-keyed
    //      exchanges: per-doc TF, corpus DF; the corpus size is ONE
    //      aggregated row broadcast over the scored frame; top-k per doc
    //      plans as WindowGroupLimit so per-group state is bounded at k.
    //      Scores stay exact across engines: integer tf/df/n feed
    //      identical double expressions (tf * ln(n/df)).
    QueryDef(
      "text_keywords",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.t(s, d, "documents")
        val toks = docs
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
          .filter(length(col("tok")) > 0)
        // persisted: both the scoring join and the document-frequency
        // aggregate read tf — without the cache Catalyst plans the
        // tokenize + (doc, tok) aggregation chain twice (the dfreq branch
        // prunes columns differently, so ReuseExchange never fires) and
        // the corpus is tokenized twice per run (guide §2.4; at 100 TB:
        // one corpus pass instead of two)
        val tf = CacheScope.track(
          toks.groupBy(col("doc_id"), col("tok"))
            .agg(count(lit(1)).as("tf"))
            .persist())
        val dfreq = tf.groupBy(col("tok"))
          .agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "tok")
          .crossJoin(broadcast(n))
          .withColumn("score",
            col("tf") * log(col("n_docs").cast("double") / col("df")))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("tok"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("tok"),
            round(col("score"), 6).as("score"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH toks AS (
                SELECT doc_id, tok FROM (
                  SELECT doc_id, unnest(string_split_regex(lower(text),
                    '[^a-z0-9]+')) AS tok FROM documents)
                WHERE length(tok) > 0),
              tf AS (
                SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
              dfreq AS (
                SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT COUNT(*) AS n_docs FROM documents),
              scored AS (
                SELECT tf.doc_id, tf.tok,
                  tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS score
                FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
              SELECT doc_id, rk, tok, round(score, 6) AS score FROM (
                SELECT doc_id, tok, score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, tok) AS rk
                FROM scored)
              WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // ---- exact distribution quantiles at scale (the "pick the length
    //      filter threshold" step of corpus curation). Naive exact
    //      quantiles sort every row of a language into one window
    //      partition — unusable at 100 TB. This is the histogram shape:
    //      groupBy (lang, length) collapses billions of rows into at
    //      most |distinct lengths| histogram buckets per language
    //      (map-side combinable), and the cumulative pass + nearest-rank
    //      pick run over the tiny histogram, not the corpus. Thresholds
    //      use pure integer arithmetic (ceil(q*n) = (n*q+99) div 100) so
    //      both engines agree bit-for-bit.
    QueryDef(
      "text_length_quantiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.t(s, d, "documents")
          .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
        val hist = docs.groupBy(col("lang"), col("n"))
          .agg(count(lit(1)).as("cnt"))
        val cum = hist.withColumn("cum",
          sum(col("cnt")).over(Window.partitionBy(col("lang")).orderBy(col("n"))))
        val tot = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("total"))
        cum.join(tot, "lang")
          .groupBy(col("lang"), col("total"))
          .agg(
            min(when(col("cum") >= expr("(total*50+99) div 100"), col("n"))).as("p50"),
            min(when(col("cum") >= expr("(total*90+99) div 100"), col("n"))).as("p90"),
            min(when(col("cum") >= expr("(total*99+99) div 100"), col("n"))).as("p99"))
          .orderBy(col("lang"))
      },
      Some("""WITH lens AS (
                SELECT lang, len(string_split(text, ' ')) AS n FROM documents),
              hist AS (
                SELECT lang, n, COUNT(*) AS cnt FROM lens GROUP BY 1, 2),
              cum AS (
                SELECT lang, n, cnt,
                       SUM(cnt) OVER (PARTITION BY lang ORDER BY n) AS cum
                FROM hist),
              tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total FROM hist GROUP BY 1)
              SELECT lang, total,
                MIN(CASE WHEN cum >= (total*50+99)//100 THEN n END) AS p50,
                MIN(CASE WHEN cum >= (total*90+99)//100 THEN n END) AS p90,
                MIN(CASE WHEN cum >= (total*99+99)//100 THEN n END) AS p99
              FROM cum JOIN tot USING (lang)
              GROUP BY lang, total ORDER BY lang""")),

    // ---- corpus-level n-gram counting (the classic "count every
    //      5-gram over the crawl" job, here trigrams): explode per doc,
    //      one ngram-keyed exchange with partial aggregation doing the
    //      heavy lifting map-side, then a global top-k that plans as
    //      TakeOrdered (no second full sort). The only data that crosses
    //      the wire is (ngram, partial count) pairs.
    QueryDef(
      "text_ngram_topk",
      (s, d) => {
        val tg = Tables.t(s, d, "documents")
          .select(split(col("text"), " ").as("w"))
          .select(explode(
            when(size(col("w")) >= 3, expr(
              "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
              .otherwise(expr("array()"))).as("ng"))
        tg.groupBy(col("ng")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("ng"))
          .limit(20)
      },
      Some("""WITH words AS (
                SELECT string_split(text, ' ') AS w FROM documents),
              tg AS (
                SELECT unnest(list_transform(range(0, len(w)-2),
                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS ng
                FROM words WHERE len(w) >= 3)
              SELECT ng, COUNT(*) AS c FROM tg
              GROUP BY 1 ORDER BY c DESC, ng LIMIT 20""")),

    // ---- deterministic global training order (the "shuffle the mix
    //      before sharding into training files" step): every document
    //      gets a salted-md5 shuffle key, the corpus range-partitions on
    //      that key (Spark's distributed sort), and zipWithIndex assigns
    //      the global position with one count-per-partition pass — no
    //      single-partition window, no driver collect. Re-running with
    //      the same salt reproduces the exact order (resumable sharding).
    QueryDef(
      "sample_shuffle",
      (s, d) => {
        import s.implicits._
        val sorted = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            md5(concat(col("doc_id"), lit(":shuf:v1"))).as("skey"))
          .orderBy(col("skey"))
          .as[(Long, String)]
        sorted.rdd.zipWithIndex()
          .map { case ((id, k), i) => (id, k, i + 1L) }
          .toDF("doc_id", "skey", "shuffle_pos")
          .orderBy(col("shuffle_pos"))
      },
      Some("""SELECT doc_id, md5(doc_id || ':shuf:v1') AS skey,
                     row_number() OVER (ORDER BY md5(doc_id || ':shuf:v1'))
                       AS shuffle_pos
              FROM documents ORDER BY shuffle_pos""")),

    // ---- temperature-weighted multi-source mixture sampling (the
    //      "mix corpora with T≈2 ⇒ alpha=0.5 before training" step):
    //      per-source weights n^0.5 flatten the source distribution,
    //      the per-source keep probability p = B·w/(Σw·n) is a
    //      broadcast-sized table, and the keep decision is a
    //      deterministic per-row md5 threshold — stable across runs,
    //      partitionings, and cluster sizes. ONE corpus aggregate for
    //      the counts + one filtered scan; nothing corpus-sized
    //      shuffles. IEEE sqrt/× /÷ are correctly rounded, so the
    //      identical formula text yields bit-identical thresholds in
    //      both engines.
    QueryDef(
      "sample_mixture",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val src = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val tot = src.agg(sum(sqrt(col("n"))).as("sumw"))
        val probs = src.crossJoin(broadcast(tot))
          .select(col("source"), col("n"),
            least(lit(1.0),
              lit(2000.0) * sqrt(col("n")) / (col("sumw") * col("n")))
              .as("p"))
        val keep = docs.select(col("source"), col("doc_id"))
          .join(broadcast(probs), Seq("source"))
          .filter((conv(substring(
            md5(concat(col("doc_id"), lit(":mix:v1"))), 1, 7), 16, 10)
            .cast("long") % 1000000).cast("double") < col("p") * 1000000)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_kept"))
        probs.join(keep, Seq("source"), "left")
          .select(col("source"), col("n").as("n_docs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            col("first_kept"))
          .orderBy(col("source"))
      },
      Some("""WITH src AS (
                SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
              tot AS (SELECT SUM(sqrt(n)) AS sumw FROM src),
              probs AS (
                SELECT source, n,
                  LEAST(1.0, 2000.0 * sqrt(n) / (tot.sumw * n)) AS p
                FROM src, tot),
              keep AS (
                SELECT d.source, COUNT(*) AS n_kept,
                  MIN(d.doc_id) AS first_kept
                FROM documents d JOIN probs p USING (source)
                WHERE CAST(CAST('0x' || substr(
                    md5(d.doc_id || ':mix:v1'), 1, 7) AS BIGINT) % 1000000
                  AS DOUBLE) < p.p * 1000000
                GROUP BY d.source)
              SELECT p.source, p.n AS n_docs,
                COALESCE(k.n_kept, 0) AS n_kept, k.first_kept
              FROM probs p LEFT JOIN keep k ON p.source = k.source
              ORDER BY p.source""")),

    // ---- hashed-feature linear quality classifier (the fasttext-style
    //      "score every document with a tiny linear model" gate): each
    //      token hashes into one of 64 buckets (md5 — cross-engine
    //      deterministic), each bucket carries a fixed pseudo-random
    //      integer weight, and the document score is the token-weight
    //      sum — computed per row with transform+aggregate in EXACT
    //      integer arithmetic: zero shuffles, zero UDFs, embarrassingly
    //      parallel. Real model weights would arrive as a 64-row
    //      broadcast instead of a formula; the plan shape is identical.
    QueryDef(
      "text_classifier",
      (s, d) => {
        Tables.t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
            expr("""aggregate(transform(w, t ->
                   (CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT)
                      % 64 * 2654435761 % 1009) - 504),
                 0L, (acc, x) -> acc + x)""").as("score"))
          .withColumn("label",
            when(col("score") > 0, "keep").otherwise("drop"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                len(string_split(text, ' ')) AS n_tokens,
                CAST(list_sum(list_transform(string_split(text, ' '), t ->
                  (CAST('0x' || substr(md5(t), 1, 7) AS BIGINT)
                     % 64 * 2654435761 % 1009) - 504)) AS BIGINT) AS score,
                CASE WHEN list_sum(list_transform(string_split(text, ' '),
                  t -> (CAST('0x' || substr(md5(t), 1, 7) AS BIGINT)
                     % 64 * 2654435761 % 1009) - 504)) > 0
                  THEN 'keep' ELSE 'drop' END AS label
              FROM documents ORDER BY doc_id""")),

    // ---- the end-to-end curation funnel: length filter -> vocabulary
    //      diversity filter -> exact dedup -> normalized (case/punct)
    //      near-dup drop, each stage operating on the previous stage's
    //      survivors, reported as per-stage in/kept counts. This is the
    //      composition a real corpus pipeline runs nightly; the whole
    //      funnel is ONE scan + two content-hash window exchanges + one
    //      aggregate — survivor-scoped dedup uses min-over-partition of
    //      the surviving doc_id instead of a second pass, so adding a
    //      stage never re-reads the corpus.
    QueryDef(
      "pipeline_curate",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val staged = Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            size(split(col("text"), " ")).as("n"))
          .withColumn("keep1", col("n").between(5, 5000))
          .withColumn("keep2", col("keep1") &&
            (size(array_distinct(split(col("text"), " "))).cast("double") /
              col("n") >= 0.3))
          .withColumn("first2",
            min(when(col("keep2"), col("doc_id")))
              .over(Window.partitionBy(md5(col("text")))))
          .withColumn("keep3", col("keep2") && col("doc_id") === col("first2"))
          .withColumn("first3",
            min(when(col("keep3"), col("doc_id")))
              .over(Window.partitionBy(
                md5(regexp_replace(lower(col("text")), "[^a-z ]", "")))))
          .withColumn("keep4", col("keep3") && col("doc_id") === col("first3"))
        val agg = staged.agg(
          count(lit(1)).as("total"),
          count(when(col("keep1"), 1)).as("k1"),
          count(when(col("keep2"), 1)).as("k2"),
          count(when(col("keep3"), 1)).as("k3"),
          count(when(col("keep4"), 1)).as("k4"))
        agg.select(explode(array(
            struct(lit(1).as("stage"), lit("length").as("name"),
              col("total").as("docs_in"), col("k1").as("docs_kept")),
            struct(lit(2).as("stage"), lit("diversity").as("name"),
              col("k1").as("docs_in"), col("k2").as("docs_kept")),
            struct(lit(3).as("stage"), lit("exact_dedup").as("name"),
              col("k2").as("docs_in"), col("k3").as("docs_kept")),
            struct(lit(4).as("stage"), lit("normalized_dedup").as("name"),
              col("k3").as("docs_in"), col("k4").as("docs_kept"))))
            .as("s"))
          .select(col("s.stage").as("stage"), col("s.name").as("name"),
            col("s.docs_in").as("docs_in"), col("s.docs_kept").as("docs_kept"))
          .orderBy(col("stage"))
      },
      Some("""WITH base AS (
                SELECT doc_id, text,
                       len(string_split(text, ' ')) AS n
                FROM documents),
              f AS (
                SELECT doc_id, text, n,
                  (n BETWEEN 5 AND 5000) AS keep1,
                  (n BETWEEN 5 AND 5000) AND
                    (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / n >= 0.3) AS keep2
                FROM base),
              d3 AS (
                SELECT *,
                  keep2 AND doc_id = MIN(CASE WHEN keep2 THEN doc_id END)
                    OVER (PARTITION BY md5(text)) AS keep3
                FROM f),
              d4 AS (
                SELECT *,
                  keep3 AND doc_id = MIN(CASE WHEN keep3 THEN doc_id END)
                    OVER (PARTITION BY
                      md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')))
                    AS keep4
                FROM d3),
              agg AS (
                SELECT COUNT(*) AS total,
                  COUNT(CASE WHEN keep1 THEN 1 END) AS k1,
                  COUNT(CASE WHEN keep2 THEN 1 END) AS k2,
                  COUNT(CASE WHEN keep3 THEN 1 END) AS k3,
                  COUNT(CASE WHEN keep4 THEN 1 END) AS k4
                FROM d4)
              SELECT 1 AS stage, 'length' AS name,
                     total AS docs_in, k1 AS docs_kept FROM agg
              UNION ALL SELECT 2, 'diversity', k1, k2 FROM agg
              UNION ALL SELECT 3, 'exact_dedup', k2, k3 FROM agg
              UNION ALL SELECT 4, 'normalized_dedup', k3, k4 FROM agg
              ORDER BY stage"""))
  )
}
