package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token/subword
  * counting, quality scoring, language ID, fingerprinting — the
  * corpus-scale generalization of the reference's word-count features
  * (`llama-chatbot/main.py:211-212`) and phrase-set eval
  * (`llama-chatbot/eval.py:16-30`).
  *
  * Every function is a pure per-row Column expression: no UDFs, no
  * shuffle, fully inside whole-stage codegen — at 100 TB these scans are
  * embarrassingly parallel and bounded by parquet read throughput.
  *
  * Oracle mirrors re-express the identical arithmetic in DuckDB
  * (string_split_regex / list_filter / list_transform); doubles are
  * rounded at 6dp on both sides after identical per-row IEEE-754 ops.
  */
object TextQueries {

  /** DuckDB mirror of TextFunctions.tokens. */
  private[operators] val toksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  private val stopSqlList =
    "['the','a','an','of','to','and','in','is','on','for']"

  // Tiny per-language stopword profiles for the n-gram/stopword language
  // heuristic. Deliberately small and deterministic (not a real langid
  // model); the oracle mirrors the exact same sets.
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  /** Stopword-profile language guess over a materialized tokens column:
    * argmax over per-language hit counts, ties broken by profile order;
    * no hits -> "und" (undetermined). */
  def langIdOf(toks: Column): Column = {
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, x => x.isInCollection(words)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), els) =>
      when(sc === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** DuckDB mirror of [[langId]] (same profiles, same tie-break). */
  private def langIdSql: String = {
    val scores = langProfiles.map { case (lang, words) =>
      lang -> s"len(list_filter($toksSql, x -> x IN (${words.map("'" + _ + "'").mkString(",")})))"
    }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    scores.foldRight("'und'") { case ((lang, sc), els) =>
      s"CASE WHEN $sc = ($best) AND ($best) > 0 THEN '$lang' ELSE $els END"
    }
  }

  /** DuckDB mirror of TextFunctions.qualityScoreOf over a `toks`
    * column expression and a `text` column expression — shared by q31
    * and the dedup-survivor selection (q84). */
  private[operators] def qualitySql(toks: String, text: String): String =
    s"""least(1.0, greatest(0.0,
       |    least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) * 0.6
       |    + least((CASE WHEN len($toks) = 0 THEN 0.0
       |        ELSE CAST(len(list_filter($toks, x -> x IN ('the','a','an',
       |          'of','to','and','in','is','on','for'))) AS DOUBLE)
       |          / len($toks) END) * 4.0, 1.0) * 0.2
       |    + greatest(1.0 - (CASE WHEN length($text) = 0 THEN 0.0
       |        ELSE CAST(length($text) - length(regexp_replace($text,
       |          '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length($text)
       |        END) * 5.0, 0.0) * 0.2))""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // ---- A5/X3 generalized: per-document token statistics ----
    GraftQuery("q30_token_stats",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents)
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords,
         |  round(CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
         |           AS DOUBLE) / len(toks) END, 6) AS mean_tok_len,
         |  round(CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(toks, x -> x IN ('the','a','an','of',
         |      'to','and','in','is','on','for'))) AS DOUBLE) / len(toks)
         |    END, 6) AS stop_ratio
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          tokenCountOf(col("toks")).as("n_tokens"),
          subwordCount(col("text")).as("n_subwords"),
          round(meanTokenLengthOf(col("toks")), 6).as("mean_tok_len"),
          round(stopwordRatioOf(col("toks")), 6).as("stop_ratio"))
        .orderBy("doc_id")
    },

    // ---- quality scoring + filter (weighted-clamp pattern, A4/D3) ----
    GraftQuery("q31_quality_filter",
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks, text FROM documents),
         |q AS (SELECT doc_id, lang,
         |  ${qualitySql("toks", "text")} AS quality
         |  FROM t)
         |SELECT doc_id, lang, round(quality, 6) AS quality
         |FROM q WHERE quality >= 0.5
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), col("text"),
          tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
          qualityScoreOf(col("text"), col("toks")).as("quality"))
        .filter(col("quality") >= 0.5)
        .select(col("doc_id"), col("lang"),
          round(col("quality"), 6).as("quality"))
        .orderBy("doc_id")
    },

    // ---- language-ID heuristic + agreement with the labeled lang ----
    GraftQuery("q32_langid",
      s"""SELECT guess, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN guess = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         |FROM (SELECT lang, $langIdSql AS guess FROM documents) t
         |GROUP BY guess ORDER BY guess""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("lang"), tokens(col("text")).as("toks"))
        .select(col("lang"), langIdOf(col("toks")).as("guess"))
        .groupBy(col("guess"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("guess") === col("lang"), 1L).otherwise(0L))
            .cast("long").as("n_match"))
        .orderBy("guess")
    },

    // ---- X6/X4/X2: substring preview + routing predicate over text ----
    GraftQuery("q33_preview_route",
      """SELECT doc_id,
        |  substr(text, 1, 40) AS preview,
        |  CASE WHEN contains(lower(text), 'spark') THEN 'enhanced'
        |       ELSE 'plain' END AS route
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          substring(col("text"), 1, 40).as("preview"),
          when(lower(col("text")).contains("spark"), "enhanced")
            .otherwise("plain").as("route"))
        .orderBy("doc_id")
    },

    // ---- edit-distance near-match (levenshtein, both engines native) ----
    GraftQuery("q36_edit_distance",
      """WITH t AS (SELECT doc_id, substr(text, 1, 20) AS head
        |           FROM documents WHERE doc_id < 40)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.head, b.head) AS INTEGER) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val t = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") < 40))
        .select(col("doc_id"), substring(col("text"), 1, 20).as("head"))
      t.as("a").join(t.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.head"), col("b.head")).as("dist"))
        .filter(col("dist") <= 8)
        .orderBy("doc_a", "doc_b")
    },

    // ---- deterministic train/val/test split: stable md5-hash bucketing
    //      (the training-data split that never reshuffles when the
    //      corpus grows — a doc's split is a pure function of its id) ----
    GraftQuery("q37_train_val_split",
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10 AS bucket
        |  FROM documents),
        |s AS (SELECT lang,
        |        CASE WHEN bucket < 8 THEN 'train'
        |             WHEN bucket = 8 THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM t)
        |SELECT split, lang, COUNT(*) AS n
        |FROM s GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .withColumn("bucket",
          conv(substring(md5(concat(lit("split#"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 10)
        .select(col("lang"),
          when(col("bucket") < 8, "train")
            .when(col("bucket") === 8, "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("split", "lang")
    },

    // ---- corpus TF-IDF: per-doc top terms by tf * N/df ----
    // The corpus-level statistic the reference never computes: document
    // frequency via explode + distinct-agg, rarity weight N/df kept as
    // an exact integer ratio (no ln -> no libm cross-engine drift),
    // per-doc top-3 by (tfidf desc, term). Two shuffles total: the
    // (doc, term) tf agg and the term df agg; N broadcasts.
    GraftQuery("q35_tfidf_top_terms",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf
         |       FROM tok GROUP BY doc_id, term),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term,
         |         CAST(tf.tf * n.n AS DOUBLE) / df.df AS tfidf
         |       FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
         |r AS (SELECT doc_id, term, tfidf,
         |        ROW_NUMBER() OVER (PARTITION BY doc_id
         |          ORDER BY tfidf DESC, term) AS rk
         |      FROM sc)
         |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tfidf
         |FROM r WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      // explode_outer: see Boilerplate — avoids the inferred-filter
      // double tokenize on the scan
      val tok = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          explode_outer(tokens(col("text"))).as("term"))
        .filter(col("term").isNotNull)
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      // df = rows per term in tf (one row per (doc, term)) as a WINDOW
      // over the tf frame, not a second aggregation branch joined back:
      // the branch form re-computed the whole explode + tf subtree for
      // the df side (Spark plans each join input independently — two
      // corpus passes) and then shuffled tf by term for the join anyway.
      // The window pays the same one term-keyed exchange and reads the
      // tf rows it already has — one explode pass, one less join, at
      // any scale.
      val wDf = Window.partitionBy(col("term"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(wDf))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          ((col("tf") * col("n")).cast("double") / col("df")).as("tfidf"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
        .orderBy("doc_id", "rk")
    },

    // ---- content fingerprints: exact + rolling (min-shingle) ----
    GraftQuery("q34_fingerprints",
      """WITH t AS (SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |r AS (SELECT doc_id, fp,
        |  CASE WHEN len(toks) < 4 THEN NULL
        |    ELSE list_min(list_transform(range(1, len(toks) - 2),
        |      i -> md5(array_to_string(toks[i:i+3], ' '))))
        |  END AS rolling_fp
        |  FROM t)
        |SELECT doc_id, fp, rolling_fp FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          fingerprint(col("text")).as("fp"),
          rollingFingerprintOf(col("toks")).as("rolling_fp"))
        .orderBy("doc_id")
    },

    // ---- repetition ratio (the Gopher-style quality signal): fraction
    //      of duplicated 3-gram shingles per doc — high values mark
    //      boilerplate/spam for corpus filtering. Pure per-row column
    //      math after the spread; NULL for docs too short to shingle. ----
    // Computed over HASHED 3-grams (the q41 md5 + integer-mix pipeline,
    // mirrored literal-for-literal in the oracle) rather than shingle
    // strings: the ratio only needs distinct COUNTS, and primitive-long
    // distinct beats building 100 shingle strings per doc ~10x (the
    // string form took 70 s at 500k docs; hash collisions are the same
    // deterministic md5 mix on both engines, so the check stays exact).
    GraftQuery("q38_repetition_ratio",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, ${DedupQueries.thSql} AS th FROM t),
         |g AS (SELECT doc_id, ${DedupQueries.hsSql} AS hs FROM h)
         |SELECT doc_id,
         |  CASE WHEN len(hs) = 0 THEN NULL
         |    ELSE round(CAST(len(hs) - len(list_distinct(hs)) AS DOUBLE)
         |      / len(hs), 6) END AS rep_ratio
         |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), tokenHashesOfText(col("text")).as("th"))
        .select(col("doc_id"), shingleHashesOf(col("th"), 3).as("hs"))
        .select(col("doc_id"),
          when(size(col("hs")) === 0, lit(null).cast("double"))
            .otherwise(round(
              (size(col("hs")) - size(array_distinct(col("hs"))))
                .cast("double") / size(col("hs")), 6)).as("rep_ratio"))
        .orderBy("doc_id")
    },

    // ---- PII-pattern redaction: the scrub pass a training corpus runs
    //      before release. The corpus has no PII, so id-bearing text is
    //      synthesized (the q53 pattern) and then emails + long digit
    //      runs are counted and masked. regexp_replace is global in
    //      Spark; the DuckDB mirror needs the explicit 'g' flag. ----
    GraftQuery("q39_pii_redaction",
      """WITH t AS (SELECT doc_id,
        |    printf('doc %d: contact u%d@mail%d.example.com or 555%07d anytime',
        |      doc_id, doc_id % 50, doc_id % 7, doc_id) AS body
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(body,
        |    '[a-z0-9.]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(body, '[a-z0-9.]+@[a-z0-9.-]+\.[a-z]{2,}',
        |      '<EMAIL>', 'g'), '\d{7,}')) AS BIGINT) AS n_numbers,
        |  regexp_replace(regexp_replace(body,
        |    '[a-z0-9.]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{7,}', '<NUM>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val emailPat = "[a-z0-9.]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val numPat = "\\d{7,}"
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), format_string(
          "doc %d: contact u%d@mail%d.example.com or 555%07d anytime",
          col("doc_id"), col("doc_id") % 50, col("doc_id") % 7,
          col("doc_id")).as("body"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("body"), lit(emailPat), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(
            regexp_replace(col("body"), emailPat, "<EMAIL>"),
            lit(numPat), lit(0))).cast("long").as("n_numbers"),
          regexp_replace(
            regexp_replace(col("body"), emailPat, "<EMAIL>"),
            numPat, "<NUM>").as("redacted"))
        .orderBy("doc_id")
    },

    // ---- deterministic stratified sampling: per-language keep rates
    //      via the same stable md5 bucketing as the q37 splits — a
    //      doc's fate is a pure function of its id, so the sample never
    //      reshuffles when the corpus grows (the mixture-weighting op
    //      an LLM data pipeline runs per domain/language). ----
    GraftQuery("q75_stratified_sample",
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5('strat#' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1000 AS b
        |  FROM documents)
        |SELECT doc_id, lang FROM t
        |WHERE b < (CASE WHEN lang = 'en' THEN 500 ELSE 800 END)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("b",
          conv(substring(md5(concat(lit("strat#"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 1000)
        .filter(col("b") <
          when(col("lang") === "en", 500).otherwise(800))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // ---- sequence packing: assign docs to fixed token-budget bins by
    //      running token count — the pre-training batch-assembly op.
    //      Packing is PER SHARD (source) so the running-sum window
    //      partitions by shard and no global order exists anywhere: at
    //      100 TB each shard packs independently in its own partition. ----
    GraftQuery("q76_sequence_packing",
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS UNBOUNDED PRECEDING) - n_tokens AS off
         |      FROM t)
         |SELECT doc_id, source, n_tokens,
         |  CAST(off // 512 AS BIGINT) AS bin,
         |  CAST(off % 512 AS BIGINT) AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), col("source"),
          tokenCountOf(tokens(col("text"))).as("n_tokens"))
        .withColumn("off", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor(col("off") / 512).cast("long").as("bin"),
          (col("off") % 512).cast("long").as("bin_offset"))
        .orderBy("doc_id")
    },

    // ---- token-length histogram: fixed-width bins over per-doc token
    //      counts — the length-distribution profile a pipeline checks
    //      before choosing packing/truncation budgets. Pure scan-side
    //      bucketing + one tiny agg shuffle. ----
    GraftQuery("q86_token_histogram",
      s"""WITH t AS (SELECT doc_id, len($toksSql) AS n FROM documents)
         |SELECT CAST(least(n // 16, 9) AS BIGINT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
         |  CAST(MIN(n) AS BIGINT) AS min_tokens,
         |  CAST(MAX(n) AS BIGINT) AS max_tokens
         |FROM t GROUP BY bin
         |ORDER BY bin""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(tokenCountOf(tokens(col("text"))).as("n"))
        .groupBy(least(expr("n div 16"), lit(9L)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).cast("long").as("sum_tokens"),
          min(col("n")).cast("long").as("min_tokens"),
          max(col("n")).cast("long").as("max_tokens"))
        .orderBy("bin")
    },

    // ---- domain-mix profile: host extraction + per-domain counts and
    //      language spread — the source-mixture report a web-corpus
    //      curation run keeps per crawl. The corpus has no URLs, so
    //      they're synthesized deterministically (the q39/q53 pattern);
    //      the host regex is the operator under test. ----
    GraftQuery("q90_domain_mix",
      """WITH t AS (SELECT doc_id, lang,
        |    printf('https://host%d.%s/p/%d', doc_id % 13,
        |      CASE WHEN doc_id % 3 = 0 THEN 'org' ELSE 'com' END,
        |      doc_id) AS url
        |  FROM documents),
        |e AS (SELECT doc_id, lang,
        |        regexp_extract(url, '^https?://([^/]+)/', 1) AS host
        |      FROM t)
        |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM e GROUP BY host
        |ORDER BY host""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("lang"), format_string("https://host%d.%s/p/%d",
          col("doc_id") % 13,
          when(col("doc_id") % 3 === 0, "org").otherwise("com"),
          col("doc_id")).as("url"))
        .select(col("lang"),
          regexp_extract(col("url"), "^https?://([^/]+)/", 1).as("host"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).cast("long").as("n_langs"))
        .orderBy("host")
    },

    // ---- sliding-window document chunking: split each doc into
    //      64-token chunks at stride 48 (16-token overlap) — the
    //      context-window preparation step for training/RAG ingestion.
    //      Pure per-row expressions (sequence -> explode -> slice):
    //      fan-out is ~n_tokens/stride rows per doc, no shuffle until
    //      the final (oracle-imposed) sort, so at 100 TB the chunk pass
    //      is scan-bound. The last chunk is naturally ragged (shorter
    //      than 64); every token lands in at least one chunk because
    //      stride < width. ----
    GraftQuery("q87_doc_chunks",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT doc_id, unnest(range(0, len(toks), 48)) AS start,
         |        toks FROM t WHERE len(toks) > 0)
         |SELECT doc_id, CAST(start // 48 AS INTEGER) AS chunk_id,
         |  CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(toks[start + 1 : start + 64], ' ')) AS chunk_fp
         |FROM c
         |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      val width = 64
      val stride = 48
      // explode_outer: keeps InferFiltersFromGenerate from pushing a
      // re-evaluated tokenize into the scan filter (see Boilerplate);
      // size(toks)>0 already guarantees a non-empty sequence
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"),
          explode_outer(
            sequence(lit(0), size(col("toks")) - 1, lit(stride)))
            .as("start"),
          col("toks"))
        .filter(col("start").isNotNull)
        .select(col("doc_id"),
          expr(s"start div $stride").cast("int").as("chunk_id"),
          slice(col("toks"), col("start") + 1, lit(width)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    },

    // ---- vocabulary token-id encoding: the tokenizer stand-in of a
    //      training pipeline — build a frequency-ranked vocab of the
    //      top-V tokens (ties broken by token text, so the ranking is
    //      deterministic), then encode every (doc, position) to its
    //      token id, 0 for out-of-vocabulary. The corpus-wide count is
    //      one uniform-key shuffle with map-side partial agg; top-V
    //      selection is a distributed TakeOrderedAndProject (never a
    //      single-partition window over the full distinct-token
    //      frame); the V-row vocab broadcasts to the encode join.
    //      Output is one row per token position — the id sequence a
    //      training job would pack (q76). ----
    GraftQuery("q97_vocab_encode",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |e AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos,
         |        toks FROM t WHERE len(toks) > 0),
         |x AS (SELECT doc_id, CAST(pos AS INTEGER) AS pos,
         |        toks[pos] AS tok FROM e),
         |vc AS (SELECT tok, COUNT(*) AS cnt FROM x GROUP BY tok),
         |vocab AS (SELECT tok, token_id FROM (
         |    SELECT tok, CAST(row_number() OVER
         |      (ORDER BY cnt DESC, tok) AS INTEGER) AS token_id FROM vc)
         |  WHERE token_id <= 32)
         |SELECT x.doc_id, x.pos,
         |  CAST(COALESCE(v.token_id, 0) AS INTEGER) AS token_id
         |FROM x LEFT JOIN vocab v ON x.tok = v.tok
         |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      val v = 32
      // posexplode_outer: see Boilerplate — a non-outer generate gets
      // size/notnull guards that re-evaluate the tokenize in the scan
      // filter; empty docs contribute one null row, dropped explicitly
      val toksDf = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode_outer(col("toks")).as(Seq("pos0", "tok")))
        .filter(col("tok").isNotNull)
        .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"),
          col("tok"))
      // top-V selection is DISTRIBUTED (TakeOrderedAndProject, not a
      // single-partition window over every distinct token — an open
      // vocabulary at scale would bottleneck one task); the id-
      // assigning window then runs over only the V survivors
      val vocab = toksDf.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(v)
        .withColumn("token_id", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))).cast("int"))
        .select(col("tok"), col("token_id"))
      toksDf.join(broadcast(vocab), Seq("tok"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(0)).cast("int").as("token_id"))
        .orderBy("doc_id", "pos")
    },

    // ---- unigram commonness score: the LM-quality-filter stand-in
    //      (CCNet-style pipelines score docs under a language model;
    //      the unigram corpus model is its engine-computable core).
    //      avg_tok_count = mean corpus frequency of the doc's tokens —
    //      low means the doc is built from rare tokens. Kept as a
    //      ratio of integer aggregates (no log), so the cross-engine
    //      hash compare never depends on libm: one BIGINT sum and one
    //      count divide once per doc, and IEEE-754 division of
    //      identical operands is bit-identical everywhere. Two
    //      uniform shuffles (token count, doc regroup); the count
    //      table broadcasts (it is vocab-sized). ----
    GraftQuery("q98_token_rarity",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |x AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |vc AS (SELECT tok, COUNT(*) AS cnt FROM x GROUP BY tok)
         |SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(vc.cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS avg_tok_count
         |FROM x JOIN vc ON x.tok = vc.tok
         |GROUP BY x.doc_id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // explode_outer: see Boilerplate — avoids the inferred-filter
      // double tokenize; null rows (empty docs) dropped explicitly
      val tok = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          explode_outer(tokens(col("text"))).as("tok"))
        .filter(col("tok").isNotNull)
      val counts = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      tok.join(broadcast(counts), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          (sum(col("cnt")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_tok_count"))
        .orderBy("doc_id")
    },
  )
}
