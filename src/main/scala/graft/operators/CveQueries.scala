package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** CVE-pipeline-shaped semantics (SURVEY.md §2.3-§2.5, §3.3): the
  * reference's core record processing — nested-path extraction with
  * default-on-missing (`consumer/consumer.py:76-106`), VARIANT
  * construct/re-extract (`processor.py:48-58`), doc-template projection
  * (`consumer/consumer.py:85-89`), CVE-id regex + dedup
  * (`llama-chatbot/main.py:290-294`), the two-source verification join
  * (`llama-chatbot/main.py:154-187`), field-completeness / confidence
  * scoring (`llama-chatbot/main.py:195-215`), TP/FP/FN phrase-set eval
  * (`llama-chatbot/eval.py:16-30`), and the scan→filter→count pipeline
  * (`scanner/scan.py:49-62` + `llama-chatbot/main.py:561`) — re-expressed
  * over the deterministic testdata tables.
  *
  * Scale notes (100 TB):
  *  - JSON construct/extract, regex, and template projections are pure
  *    per-row column expressions — codegen'd, shuffle-free scans;
  *  - the verification join is an equi shuffle join on the id, fully
  *    AQE-eligible; both derived sides are already projected down to
  *    (id) before the join so only keys move;
  *  - explode + distinct (CVE-id dedup) is one shuffle of the exploded
  *    ids with map-side partial distinct.
  */
object CveQueries {

  val all: Seq[GraftQuery] = Seq(

    // ---- P1/X7: nested-path extraction with default-on-missing ----
    // The reference's `.get(path, default)` chains: a present key ($.k)
    // and an absent one ($.missing) both extract; absent -> "" / 0, the
    // exact silent-default semantics of consumer/consumer.py:80-104.
    GraftQuery("q50_json_extract_defaults",
      """SELECT event_id,
        |  COALESCE(json_extract_string(props, '$.k'), '') AS k_str,
        |  COALESCE(CAST(json_extract_string(props, '$.missing') AS BIGINT), 0) AS missing_val,
        |  COALESCE(json_extract_string(props, '$.also.nested'), '') AS nested_str
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.events(s, d))
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.k"), lit(""))
            .as("k_str"),
          coalesce(get_json_object(col("props"), "$.missing").cast("bigint"),
            lit(0L)).as("missing_val"),
          coalesce(get_json_object(col("props"), "$.also.nested"), lit(""))
            .as("nested_str"))
        .orderBy("event_id")
    },

    // ---- P2/X7/K1: VARIANT round-trip — construct nested JSON, then
    //      re-extract scalars from it (PARSE_JSON insert + later query).
    //      Each engine builds its own JSON and extracts, so the check is
    //      on the extracted values, robust to key-formatting diffs. ----
    GraftQuery("q51_variant_roundtrip",
      """WITH v AS (SELECT event_id,
        |  to_json(struct_pack(etype := event_type,
        |    meta := struct_pack(uid := user_id, val := value))) AS doc
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(doc, '$.etype') AS etype,
        |  CAST(json_extract_string(doc, '$.meta.uid') AS BIGINT) AS uid,
        |  round(CAST(json_extract_string(doc, '$.meta.val') AS DOUBLE), 6) AS val
        |FROM v ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.events(s, d))
        .select(col("event_id"),
          to_json(struct(col("event_type").as("etype"),
            struct(col("user_id").as("uid"), col("value").as("val"))
              .as("meta"))).as("doc"))
        // parse the VARIANT doc ONCE into a struct (three
        // get_json_object calls would re-parse the document per field;
        // the parsed alias is multiply-referenced and non-cheap, so
        // CollapseProject keeps it staged)
        .withColumn("v", from_json(col("doc"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "etype STRING, meta STRUCT<uid: STRING, val: STRING>")))
        .select(col("event_id"),
          col("v.etype").as("etype"),
          col("v.meta.uid").cast("bigint").as("uid"),
          round(col("v.meta.val").cast("double"), 6).as("val"))
        .orderBy("event_id")
    },

    // ---- K1/P2 on Spark 4's native VARIANT type: parse_json -> a real
    //      VariantType value -> typed variant_get extraction. The
    //      binary variant encoding skips per-access JSON re-parsing
    //      (q50/q51's get_json_object path) — the semi-structured
    //      storage model the reference's VARIANT column maps to. The
    //      oracle extracts the same scalars from the equivalent JSON
    //      text; only the extracted values are compared, so the
    //      engines' internal encodings are free to differ. ----
    GraftQuery("q93_variant_type",
      """WITH v AS (SELECT event_id,
        |  to_json(struct_pack(etype := event_type,
        |    meta := struct_pack(uid := user_id,
        |      k := json_extract(props, '$.k')))) AS doc
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(doc, '$.etype') AS etype,
        |  CAST(json_extract_string(doc, '$.meta.uid') AS BIGINT) AS uid,
        |  CAST(json_extract_string(doc, '$.meta.k') AS BIGINT) AS k_val
        |FROM v ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.events(s, d))
        .select(col("event_id"),
          parse_json(to_json(struct(
            col("event_type").as("etype"),
            struct(col("user_id").as("uid"),
              get_json_object(col("props"), "$.k").cast("bigint").as("k"))
              .as("meta")))).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.etype", "string").as("etype"),
          variant_get(col("v"), "$.meta.uid", "bigint").as("uid"),
          variant_get(col("v"), "$.meta.k", "bigint").as("k_val"))
        .orderBy("event_id")
    },

    // ---- P3/X5: doc-template projection (the embedding-text block) ----
    GraftQuery("q52_doc_template",
      """SELECT p_partkey,
        |  printf('Title: %s
        |CVE ID: CVE-%d-%04d
        |Description: %s', p_name, 2020 + p_partkey % 5, 1000 + p_partkey, p_type) AS doc
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.spread(Tables.part(s, d))
        .select(col("p_partkey"),
          format_string("Title: %s\nCVE ID: CVE-%d-%04d\nDescription: %s",
            col("p_name"), lit(2020) + col("p_partkey") % 5,
            lit(1000) + col("p_partkey"), col("p_type")).as("doc"))
        .orderBy("p_partkey")
    },

    // ---- X1/A2: CVE-id regex extraction + explode + distinct ----
    // Synthesizes id-bearing text (the testdata corpus has none), then
    // runs the reference's extract-and-dedup: regexp_extract_all with
    // CVE-\d{4}-\d{4,7}, explode, distinct.
    GraftQuery("q53_cve_id_extract_dedup",
      """WITH t AS (SELECT doc_id,
        |    printf('see CVE-%d-%04d and CVE-2024-%d in text; ignore GHSA-%d',
        |      2020 + doc_id % 5, 1000 + doc_id, 100000 + doc_id % 7, doc_id) AS body
        |  FROM documents),
        |x AS (SELECT unnest(regexp_extract_all(body, 'CVE-\d{4}-\d{4,7}')) AS cve_id
        |      FROM t)
        |SELECT DISTINCT cve_id FROM x
        |ORDER BY cve_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(format_string(
          "see CVE-%d-%04d and CVE-2024-%d in text; ignore GHSA-%d",
          lit(2020) + col("doc_id") % 5, lit(1000) + col("doc_id"),
          lit(100000) + col("doc_id") % 7, col("doc_id")).as("body"))
        // explode_outer: a plain explode gets size/notnull guards
        // inferred below the Generate, re-running regexp_extract_all
        // in the scan filter (see Boilerplate for the rule mechanics)
        .select(explode_outer(regexp_extract_all(col("body"),
          lit("CVE-\\d{4}-\\d{4,7}"), lit(0))).as("cve_id"))
        .filter(col("cve_id").isNotNull)
        .distinct()
        .orderBy("cve_id")
    },

    // ---- J3: two-source verification full-outer join ----
    // "vector store" side = embeddings with label < 5; "NVD" side =
    // documents with n_chars >= 200. Both projected to the shared id
    // before the join; status = both -> verified, one -> partial-*.
    GraftQuery("q54_verify_full_outer",
      """WITH vs AS (SELECT vec_id AS id FROM embeddings WHERE label < 5),
        |nvd AS (SELECT doc_id AS id FROM documents WHERE n_chars >= 200)
        |SELECT COALESCE(vs.id, nvd.id) AS id,
        |  CASE WHEN vs.id IS NOT NULL AND nvd.id IS NOT NULL THEN 'verified'
        |       WHEN vs.id IS NOT NULL THEN 'partial-vector'
        |       ELSE 'partial-nvd' END AS status,
        |  round(0.7 * (CASE WHEN vs.id IS NOT NULL AND nvd.id IS NOT NULL
        |          THEN 1.0 WHEN vs.id IS NOT NULL THEN 0.6 ELSE 0.4 END)
        |    + 0.3 * 0.5, 6) AS confidence
        |FROM vs FULL OUTER JOIN nvd ON vs.id = nvd.id
        |ORDER BY id""".stripMargin) { (s, d) =>
      val vs = Tables.embeddings(s, d).filter(col("label") < 5)
        .select(col("vec_id").as("vs_id"))
      val nvd = Tables.spread(
        Tables.documents(s, d).filter(col("n_chars") >= 200))
        .select(col("doc_id").as("nvd_id"))
      val base = when(col("vs_id").isNotNull && col("nvd_id").isNotNull, 1.0)
        .when(col("vs_id").isNotNull, 0.6).otherwise(0.4)
      vs.join(nvd, col("vs_id") === col("nvd_id"), "full_outer")
        .select(coalesce(col("vs_id"), col("nvd_id")).as("id"),
          when(col("vs_id").isNotNull && col("nvd_id").isNotNull, "verified")
            .when(col("vs_id").isNotNull, "partial-vector")
            .otherwise("partial-nvd").as("status"),
          round(lit(0.7) * base + lit(0.3) * 0.5, 6).as("confidence"))
        .orderBy("id")
    },

    // ---- A3: field-completeness ratio over extracted paths ----
    // completeness = present key-fields / total key-fields, the
    // sum(field in data)/len(key_fields) pattern; here 3 probes into the
    // props VARIANT ($.k present, two absent).
    GraftQuery("q55_completeness_ratio",
      """SELECT round(comp, 6) AS completeness, COUNT(*) AS n FROM (
        |  SELECT ((CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN json_extract_string(props, '$.sev') IS NOT NULL
        |      THEN 1 ELSE 0 END)
        |    + (CASE WHEN json_extract_string(props, '$.cwe') IS NOT NULL
        |      THEN 1 ELSE 0 END)) / 3.0 AS comp
        |  FROM events) t
        |GROUP BY 1 ORDER BY completeness""".stripMargin) { (s, d) =>
      val present = (path: String) =>
        when(get_json_object(col("props"), path).isNotNull, 1).otherwise(0)
      Tables.spread(Tables.events(s, d))
        .select(((present("$.k") + present("$.sev") + present("$.cwe"))
          / lit(3.0)).as("comp"))
        .groupBy(round(col("comp"), 6).as("completeness"))
        .agg(count(lit(1)).as("n"))
        .orderBy("completeness")
    },

    // ---- U2/D4: TP/FP/FN phrase-set eval per (response, context) pair ----
    // response = doc i, context = doc i+1 (deterministic pairing): phrase
    // sets are distinct tokens; FP = in response not context, FN = the
    // reverse, TP = intersection — eval.py:16-30 at corpus scale.
    GraftQuery("q56_eval_tp_fp_fn",
      """WITH t AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS toks
        |  FROM documents),
        |p AS (SELECT a.doc_id AS pair_id, a.toks AS resp, b.toks AS ctx
        |      FROM t a JOIN t b ON b.doc_id = a.doc_id + 1)
        |SELECT pair_id,
        |  CAST(len(list_filter(resp, x -> list_contains(ctx, x))) AS BIGINT) AS tp,
        |  CAST(len(list_filter(resp, x -> NOT list_contains(ctx, x))) AS BIGINT) AS fp,
        |  CAST(len(list_filter(ctx, x -> NOT list_contains(resp, x))) AS BIGINT) AS fn
        |FROM p ORDER BY pair_id""".stripMargin) { (s, d) =>
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val t = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"), array_distinct(toks).as("toks"))
      t.as("a").join(t.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("pair_id"),
          size(array_intersect(col("a.toks"), col("b.toks"))).cast("long")
            .as("tp"),
          size(array_except(col("a.toks"), col("b.toks"))).cast("long")
            .as("fp"),
          size(array_except(col("b.toks"), col("a.toks"))).cast("long")
            .as("fn"))
        .orderBy("pair_id")
    },

    // ---- F1/A1/J4 (§3.3): scan pipeline — derive per-source vuln ids,
    //      prefix-filter to CVEs only, count per "image" (source) ----
    GraftQuery("q57_scan_count_pipeline",
      """WITH m AS (SELECT source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN printf('CVE-%d-%04d', 2020 + doc_id % 5, 1000 + doc_id)
        |      ELSE printf('GHSA-%d', doc_id) END AS vuln_id
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_cve
        |FROM m WHERE vuln_id LIKE 'CVE%'
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("source"),
          when(col("doc_id") % 3 === 0,
            format_string("CVE-%d-%04d", lit(2020) + col("doc_id") % 5,
              lit(1000) + col("doc_id")))
            .otherwise(format_string("GHSA-%d", col("doc_id")))
            .as("vuln_id"))
        .filter(col("vuln_id").startsWith("CVE"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_cve"))
        .orderBy("source")
    },

    // ---- P1 on real nested structs: build CVE-shaped records from
    //      orders (metrics ABSENT for low-value orders), run the
    //      model's extraction, and check the default-on-missing
    //      semantics end-to-end. The oracle computes the expected
    //      values directly. ----
    GraftQuery("q59_cve_extract_nested",
      """SELECT o_orderkey AS okey,
        |  printf('CVE-2024-%04d', CAST(o_orderkey % 10000 AS INTEGER)) AS cve_id,
        |  'Order ' || CAST(o_orderkey AS VARCHAR) AS title,
        |  o_orderpriority AS description,
        |  CASE WHEN o_totalprice > 200000 THEN o_orderstatus ELSE '' END AS severity,
        |  CASE WHEN o_totalprice > 200000 THEN o_totalprice / 100000.0
        |       ELSE 0.0 END AS score,
        |  'CWE-' || CAST(o_orderkey % 100 AS VARCHAR) AS cwe_id
        |FROM orders
        |ORDER BY okey""".stripMargin) { (s, d) =>
      val o = Tables.spread(Tables.orders(s, d))
      val metricsType = "array<struct<cvssV3_1:struct<baseScore:double,baseSeverity:string>>>"
      val nested = o.select(col("o_orderkey").as("okey"),
        struct(
          format_string("CVE-2024-%04d", col("o_orderkey") % 10000)
            .as("cveId"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
            .as("datePublished"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
            .as("dateUpdated")).as("cveMetadata"),
        struct(struct(
          concat(lit("Order "), col("o_orderkey")).as("title"),
          array(struct(col("o_orderpriority").as("value")))
            .as("descriptions"),
          when(col("o_totalprice") > 200000,
            array(struct(struct((col("o_totalprice") / 100000.0)
              .as("baseScore"), col("o_orderstatus").as("baseSeverity"))
              .as("cvssV3_1")))).otherwise(lit(null)).cast(metricsType)
            .as("metrics"),
          array(struct(array(struct(
            concat(lit("CWE-"), col("o_orderkey") % 100).as("cweId")))
            .as("descriptions"))).as("problemTypes")).as("cna"))
          .as("containers"))
      graft.model.Cve.extractMeta(nested, keep = Seq("okey"))
        .select(col("okey"), col("cve_id"), col("title"), col("description"),
          col("severity"), col("score"), col("cwe_id"))
        .orderBy("okey")
    },

    // ---- P5: higher-order array projection (transform r -> r.url),
    //      the `[ref.url for ref in cve.references]` pattern ----
    GraftQuery("q64_transform_projection",
      """WITH t AS (SELECT o_orderkey AS okey,
        |    [struct_pack(url := 'https://nvd.example/' || CAST(o_orderkey AS VARCHAR),
        |       source := 'nvd'),
        |     struct_pack(url := 'https://vendor.example/' || o_orderstatus,
        |       source := 'vendor')] AS refs
        |  FROM orders)
        |SELECT okey,
        |  array_to_string(list_transform(refs, r -> r.url), '|') AS urls,
        |  CAST(len(refs) AS INTEGER) AS n_refs
        |FROM t ORDER BY okey""".stripMargin) { (s, d) =>
      Tables.spread(Tables.orders(s, d))
        .select(col("o_orderkey").as("okey"),
          array(
            struct(concat(lit("https://nvd.example/"), col("o_orderkey"))
              .as("url"), lit("nvd").as("source")),
            struct(concat(lit("https://vendor.example/"),
              col("o_orderstatus")).as("url"), lit("vendor").as("source")))
            .as("refs"))
        .select(col("okey"),
          // P5 higher-order projection, then joined to one scalar so the
          // driver's hash-compare sees no raw array column
          concat_ws("|", transform(col("refs"), r => r.getField("url")))
            .as("urls"),
          size(col("refs")).as("n_refs"))
        .orderBy("okey")
    },

    // ---- D2: the "LLM call" as a deterministic black-box scalar fn —
    //      prompt-template synthesis from retrieved fields (the
    //      in-engine stand-in SURVEY.md §2.11 prescribes) ----
    GraftQuery("q65_answer_synthesis",
      """SELECT doc_id,
        |  CASE WHEN contains(lower(text), 'spark')
        |    THEN printf('Answer[%s]: %s based on %d sources (conf %d%%)',
        |      lang, substr(text, 1, 30), CAST(doc_id % 5 + 1 AS INTEGER),
        |      least(100, 50 + CAST(n_chars // 10 AS INTEGER)))
        |    ELSE 'No information available'
        |  END AS answer
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // confidence is integer math end-to-end: %.2f of a computed double
      // is NOT cross-engine stable (Java formats the shortest decimal
      // repr half-up; DuckDB rounds the exact binary value).
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          when(lower(col("text")).contains("spark"),
            format_string("Answer[%s]: %s based on %d sources (conf %d%%)",
              col("lang"), substring(col("text"), 1, 30),
              (col("doc_id") % 5 + 1).cast("int"),
              least(lit(100), lit(50) + (col("n_chars") / 10).cast("int"))))
            .otherwise("No information available").as("answer"))
        .orderBy("doc_id")
    },

    // ---- X8: ISO-8601 timestamp parsing + date-range filter (F5) ----
    GraftQuery("q58_timestamp_parse_range",
      """WITH t AS (SELECT event_id,
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') AS iso
        |  FROM events),
        |p AS (SELECT event_id, CAST(strptime(iso, '%Y-%m-%dT%H:%M:%S.%gZ')
        |        AS TIMESTAMP) AS pts FROM t)
        |SELECT event_id, strftime(pts, '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM p
        |WHERE pts BETWEEN TIMESTAMP '2024-01-02' AND TIMESTAMP '2024-01-05'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.spread(Tables.events(s, d))
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("iso"))
        .select(col("event_id"),
          to_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ss.SSSX").as("pts"))
        .filter(col("pts").between(
          lit("2024-01-02").cast("timestamp"),
          lit("2024-01-05").cast("timestamp")))
        .select(col("event_id"),
          date_format(col("pts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy("event_id")
    },
  )
}
