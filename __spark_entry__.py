"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship span-extraction pipeline on a
deterministic span-corpus synthesized from /root/testdata/sf0.001's
``documents`` table.  ``queries()``/``oracle_sql()`` map the operator
inventory of SURVEY.md §2 onto the driver tables (names carry the
operator ids so the inventory can be checked line by line); inline
VALUES queries check the reference's scalar semantics (DPD decode,
currency cleaning, month regexes, boost ladder) through the DuckDB
oracle as well.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship entry — span pipeline over a deterministic synthesized corpus
# ---------------------------------------------------------------------------

#: deterministic span-corpus from the driver's documents table: one
#: heading span, one text span per '.'-free 8-token sentence window,
#: a media span, and nav/ad boilerplate to strip.
_SPANIFY = """
array(
  named_struct('kind', 'heading', 'text', concat('Document ', cast(doc_id AS string)),
               'media_ref', '', 'offset', 0),
  named_struct('kind', 'nav', 'text', 'home | about | contact',
               'media_ref', '', 'offset', 1),
  named_struct('kind', 'text', 'text', substring(text, 1, 120),
               'media_ref', '', 'offset', 2),
  named_struct('kind', 'media', 'text', '',
               'media_ref', concat('img:', cast(doc_id % 100 AS string)), 'offset', 3),
  named_struct('kind', 'text', 'text', substring(text, 121, 120),
               'media_ref', '', 'offset', 4),
  named_struct('kind', 'ad', 'text', 'BUY NOW', 'media_ref', '', 'offset', 5)
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spanify sf0.001 documents → parse stage (boilerplate
    strip + chunk/table rebuild) → per-doc span/char profile."""
    from crego_document_extractor_spark.parse import parse_documents

    docs = (
        _t(spark, "/root/testdata/sf0.001", "documents")
        .select(F.concat(F.lit("html-"), F.col("doc_id").cast("string")).alias("doc_id"),
                F.expr(_SPANIFY).alias("spans"))
    )
    parsed = parse_documents(docs)
    return parsed.select(
        "doc_id",
        F.expr("size(clean_spans)").alias("n_clean_spans"),
        F.expr("size(chunks)").alias("n_chunks"),
        F.expr("aggregate(clean_spans, 0, (a, s) -> a + length(s.text))")
        .alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# queries — each with a DuckDB oracle unless stated
# ---------------------------------------------------------------------------

def _q_s1_scan_prune(spark, sf):
    """S1: scan + filter pushdown + column pruning."""
    return (_t(spark, sf, "documents")
            .where("lang = 'en' AND n_chars > 200")
            .select("doc_id", "source", "n_chars")
            .orderBy("doc_id"))


def _q_f1_field_extract(spark, sf):
    """F1: first-match regexp field projection over text."""
    return (_t(spark, sf, "documents")
            .select("doc_id",
                    F.regexp_extract("text", r"data (\w+)", 1).alias("after_data"),
                    F.regexp_extract("text", r"^(\w+)", 1).alias("first_tok")))


def _q_f3_clean_number_inline(spark, sf):
    """F3: currency cleaning semantics (crif_parser.py:207-216)."""
    return spark.sql("""
        SELECT raw,
               coalesce(try_cast(trim(regexp_replace(raw, ',|₹|Rs', '')) AS double), 0.0) AS cleaned
        FROM VALUES ('1,234.56'), ('₹5,00,000'), ('Rs 123'), ('  42 '),
                    (''), ('n/a'), ('-12.5'), ('1.2.3'), ('0') AS t(raw)
    """)


def _q_f10_month_extract_inline(spark, sf):
    """F10: GSTR month/year header regexes (gstr.py:39-65)."""
    return spark.sql("""
        SELECT id,
          CASE WHEN mm != '' AND ym != ''
               THEN concat(mm, ' ', element_at(split(ym, '-'), 1))
               WHEN dm != '' THEN dm
               ELSE 'Unknown Month' END AS month
        FROM (
          SELECT id,
            regexp_extract(h, '(?i)(?:Month|Period)\\\\s*[:\\\\-]?\\\\s*([A-Za-z]+)', 1) AS mm,
            regexp_extract(h, '(?i)(?:Year|Financial Year)\\\\s*[:\\\\-]?\\\\s*([0-9]{4}(?:-[0-9]{2,4})?)', 1) AS ym,
            regexp_extract(h, '\\\\b(?:January|February|March|April|May|June|July|August|September|October|November|December)\\\\s*20[0-9]{2}\\\\b', 0) AS dm
          FROM VALUES (1, 'Month : January\nYear : 2024-25'),
                      (2, 'Period - April\nFinancial Year: 2023-2024'),
                      (3, 'Filed for September 2025'),
                      (4, 'no period info'),
                      (5, 'month: may\nyear: 2022') AS t(id, h))
    """)


def _q_a1_dpd_decode_inline(spark, sf):
    """A1: DPD grade decode + worst-DPD fold (crif_models.py:11-50)."""
    return spark.sql("""
        SELECT acct, max(
          CASE WHEN s IN ('000','std','000/std') THEN 0
               WHEN s = '030' THEN 30 WHEN s = '060' THEN 60
               WHEN s IN ('090','sub','090/sub') THEN 90
               WHEN s IN ('120','dbt','120/dbt') THEN 120
               WHEN s IN ('150','lss','150/lss','180') THEN 180
               WHEN s = '-' THEN 0
               ELSE coalesce(try_cast(regexp_extract(s, '^([0-9]+)', 1) AS int), 0) END
        ) AS worst_dpd
        FROM (SELECT acct, lower(trim(status)) AS s FROM VALUES
              (1,'000'),(1,'STD'),(1,'030'), (2,'090'),(2,'SUB'),(2,'XXX'),
              (3,'-'),(3,'45x'), (4,'180'),(4,'LSS'), (5,'7/DPD')
              AS t(acct, status))
        GROUP BY acct
    """)


def _q_a2_threshold_counts(spark, sf):
    """A2: per-group threshold counts (count_dpd_accounts shape)."""
    e = _t(spark, sf, "events")
    return (e.groupBy("user_id")
            .agg(F.count(F.when(F.col("value") >= 50, 1)).alias("ge_50"),
                 F.count(F.when(F.col("value") >= 100, 1)).alias("ge_100"),
                 F.count(F.when(F.col("value") >= 150, 1)).alias("ge_150"),
                 F.count("*").alias("total")))


def _q_a3_flag_any(spark, sf):
    """A3: flag-any + matched count (has_flag_in_any_account shape)."""
    o = _t(spark, sf, "orders")
    return (o.groupBy("o_custkey")
            .agg(F.max(F.col("o_orderstatus") == "F").alias("has_f"),
                 F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("matched"),
                 F.count("*").alias("total")))


def _q_a8_positive_mean(spark, sf):
    """A8: formatter-variant overall confidence (mean of positives,
    round 3 — output_formatter.py:46-70)."""
    e = _t(spark, sf, "events")
    return (e.groupBy("event_type")
            .agg(F.round(F.avg(F.when(F.col("value") > 100, F.col("value"))), 3)
                 .alias("mean_positive"),
                 F.round(F.avg("value"), 2).alias("mean_all")))


def _q_a12_nullsafe_accuracy(spark, sf):
    """A12/J4: null-safe equality accuracy rate (test_accuracy.py:127-156)."""
    return spark.sql("""
        SELECT round(avg(CASE WHEN actual <=> expected THEN 1.0d ELSE 0.0d END), 3)
               AS accuracy, count(*) AS n
        FROM VALUES (1, 1), (2, 2), (3, 4), (NULL, NULL), (NULL, 5), (6, NULL)
             AS t(actual, expected)
    """)


def _q_a11_boost_ladder_inline(spark, sf):
    """A11: similarity-boost tier ladder (config.py:29-34 order)."""
    return spark.sql("""
        SELECT cast(s AS double) AS s,
               CASE WHEN s >= 0.85 THEN 1.0d WHEN s >= 0.70 THEN 0.9d
                    WHEN s >= 0.50 THEN 0.7d ELSE 0.5d END AS boost
        FROM VALUES (0.99),(0.85),(0.849),(0.7),(0.69),(0.5),(0.49),(0.0),(-0.3) AS t(s)
    """)


def _q_t1_topk_per_group(spark, sf):
    """T1/T2: top-k per group by score desc with deterministic
    tie-break (embeddings.py:73-87 stable sort)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rank", F.row_number().over(w))
            .where("rank <= 3")
            .select("o_custkey", "o_orderkey", "o_totalprice", "rank"))


def _q_j1_broadcast_dim_join(spark, sf):
    """J1: broadcast dimension joins (param→spec lookup shape)."""
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def _q_s3_anti_join_resume(spark, sf):
    """S3: cache/resume anti-join (only-misses-proceed semantics:
    customers not yet in the 'processed' set, here status-P orders)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").where("o_orderstatus = 'P'")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_customers_without_orders")))


def _q_j2_cosine_topk(spark, sf):
    """J2+T1+F13: similarity scoring cross-join, threshold, top-k."""
    e = _t(spark, sf, "embeddings")
    q = e.where("vec_id < 5").select(F.col("vec_id").alias("query_id"),
                                     F.col("embedding").alias("qv"))
    c = e.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("cv"))
    dot = ("aggregate(zip_with(qv, cv, (x, y) -> cast(x AS double) * cast(y AS double)), "
           "0.0d, (a, x) -> a + x)")
    nq = "sqrt(aggregate(qv, 0.0d, (a, x) -> a + cast(x AS double) * cast(x AS double)))"
    nc = "sqrt(aggregate(cv, 0.0d, (a, x) -> a + cast(x AS double) * cast(x AS double)))"
    scored = (q.crossJoin(c)
              .where("query_id != cand_id")
              .withColumn("sim", F.expr(f"round({dot} / ({nq} * {nc}), 6)")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where("rank <= 5 AND sim >= -1.0")
            .select("query_id", "cand_id", "rank", "sim"))


def _q_p3_segmentation(spark, sf):
    """P3: running-count header segmentation, SQL form (SURVEY §2.2):
    token 'the' opens a new segment; per doc: #segments, max length."""
    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    seg = toks.withColumn("seg", F.sum(F.when(F.col("tok") == "the", 1).otherwise(0)).over(w))
    per_seg = seg.groupBy("doc_id", "seg").agg(F.count("*").alias("seg_len"))
    return (per_seg.groupBy("doc_id")
            .agg(F.count("*").alias("n_segments"),
                 F.max("seg_len").alias("max_seg_len")))


def _q_u1_union_pool(spark, sf):
    """U1: candidate-pool union of two typed sources."""
    e = _t(spark, sf, "events")
    a = e.where("event_type = 'signup'").select("event_id", F.lit("signup_pool").alias("pool"))
    b = e.where("event_type = 'purchase'").select("event_id", F.lit("purchase_pool").alias("pool"))
    return a.unionByName(b).groupBy("pool").agg(F.count("*").alias("n"))


def _q_dedup_exact(spark, sf):
    """Dedup (exact): content-hash groups per source (sha2/md5 ==
    cache key semantics, cache.py:28-30)."""
    d = _t(spark, sf, "documents")
    return (d.groupBy("source")
            .agg(F.countDistinct(F.md5("text")).alias("n_unique"),
                 F.count("*").alias("n_docs")))


def _q_text_quality(spark, sf):
    """Text analysis: token count, avg token length, stopword ratio."""
    d = _t(spark, sf, "documents")
    toks = "split(text, ' ')"
    stop = ("size(filter(split(text, ' '), "
            "x -> x IN ('the', 'a', 'of', 'and', 'to')))")
    return d.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"round(length(replace(text, ' ', '')) / size({toks}), 4)")
        .alias("avg_tok_len"),
        F.expr(f"round({stop} / cast(size({toks}) AS double), 4)")
        .alias("stopword_ratio"),
    )


def _q_ngram_jaccard(spark, sf):
    """Dedup (n-gram Jaccard): token-set overlap between sampled doc
    pairs of the same source."""
    d = (_t(spark, sf, "documents").where("doc_id % 50 = 0")
         .select("doc_id", "source",
                 F.array_distinct(F.split("text", " ")).alias("toks")))
    t = d.select("doc_id", "source", F.explode("toks").alias("tok"))
    sizes = d.select("doc_id", F.expr("size(toks)").alias("n"))
    pairs = (t.alias("a").join(t.alias("b"),
                               (F.col("a.tok") == F.col("b.tok")) &
                               (F.col("a.source") == F.col("b.source")) &
                               (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
             .agg(F.count("*").alias("common")))
    ja = (pairs.join(sizes.withColumnRenamed("doc_id", "d1")
                     .withColumnRenamed("n", "n1"), "d1")
          .join(sizes.withColumnRenamed("doc_id", "d2")
                .withColumnRenamed("n", "n2"), "d2")
          .withColumn("jaccard", F.expr("round(common / (n1 + n2 - common), 4)")))
    return ja.where("jaccard >= 0.5").select("d1", "d2", "jaccard")


def _q_lang_profile(spark, sf):
    d = _t(spark, sf, "documents")
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("n_chars"), 2).alias("avg_chars")))


def _q_skew_salted_topk(spark, sf):
    """Skew-salted two-phase aggregation: corpus token top-20 via
    groupBy(token, salt) partial → groupBy(token) final (ops/skew.py);
    result equals a plain group-count (the oracle)."""
    d = _t(spark, sf, "documents")
    toks = (d.select(F.explode(F.split("text", " ")).alias("tok"))
            .where("tok != ''"))
    salted = toks.withColumn(
        "salt", F.pmod(F.abs(F.xxhash64(F.monotonically_increasing_id())), F.lit(16)))
    partial = salted.groupBy("tok", "salt").agg(F.count("*").alias("pc"))
    final = partial.groupBy("tok").agg(F.sum("pc").alias("n"))
    return final.orderBy(F.desc("n"), F.asc("tok")).limit(20)


def _q_a5_active_loans_by_type_inline(spark, sf):
    """A5: count_active_loans_by_type (crif_models.py:90-100) — count
    active accounts whose type contains any of a substring list."""
    return spark.sql("""
        SELECT count(CASE WHEN is_active AND
                 (contains(lower(acct_type), 'personal loan') OR
                  contains(lower(acct_type), 'gold loan')) THEN 1 END) AS n_matching,
               count(*) AS n_accounts
        FROM VALUES ('Personal Loan', true), ('Unsecured Personal Loan', true),
                    ('Personal Loan', false), ('Gold Loan', true),
                    ('Credit Card', true), ('Business Loan', true)
             AS t(acct_type, is_active)
    """)


_HTML_DEMO = ("<body><nav><a href='/'>home</a></nav><h1>Title %d</h1>"
              "<p>paragraph %d about data</p>"
              "<div class='ad'>buy</div><img src='img:%d'>"
              "<footer>legal</footer></body>")


def _q_s2_html_ingest(spark, sf):
    """S2 front-end: raw HTML bytes → spans → boilerplate strip —
    Spark-only (the tokenizer is the engine's own operator)."""
    from crego_document_extractor_spark import ingest, pipeline
    raw = spark.createDataFrame(
        [(f"html-{i:06d}", bytearray((_HTML_DEMO % (i, i, i)).encode()))
         for i in range(50)], "doc_id string, payload binary")
    docs = ingest.ingest_html(raw)
    spans_df, _ = pipeline.run(docs, repartition=False)
    return spans_df.select(
        "doc_id",
        F.expr("size(clean_spans)").alias("n_clean"),
        F.expr("size(filter(clean_spans, s -> s.kind = 'heading'))").alias("n_headings"),
        F.expr("size(filter(clean_spans, s -> s.kind = 'media'))").alias("n_media"))


def _q_minhash_bands(spark, sf):
    """Dedup (MinHash/LSH) — Spark-only (hash functions differ across
    engines); driver records the weaker rows-only check."""
    from crego_document_extractor_spark.ops.dedup import minhash_candidate_pairs
    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("string"), "text")
    return minhash_candidate_pairs(d, n_hashes=16, bands=4)


def _q_simhash(spark, sf):
    """Dedup (SimHash) — Spark-only rows check."""
    from crego_document_extractor_spark.ops.dedup import simhash
    d = _t(spark, sf, "documents").select(F.col("doc_id").cast("string"), "text")
    return simhash(d)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_s1_scan_prune": _q_s1_scan_prune,
        "q_f1_field_extract": _q_f1_field_extract,
        "q_f3_clean_number_inline": _q_f3_clean_number_inline,
        "q_f10_month_extract_inline": _q_f10_month_extract_inline,
        "q_a1_dpd_decode_inline": _q_a1_dpd_decode_inline,
        "q_a2_threshold_counts": _q_a2_threshold_counts,
        "q_a3_flag_any": _q_a3_flag_any,
        "q_a8_positive_mean": _q_a8_positive_mean,
        "q_a11_boost_ladder_inline": _q_a11_boost_ladder_inline,
        "q_a12_nullsafe_accuracy": _q_a12_nullsafe_accuracy,
        "q_t1_topk_per_group": _q_t1_topk_per_group,
        "q_j1_broadcast_dim_join": _q_j1_broadcast_dim_join,
        "q_s3_anti_join_resume": _q_s3_anti_join_resume,
        "q_j2_cosine_topk": _q_j2_cosine_topk,
        "q_p3_segmentation": _q_p3_segmentation,
        "q_u1_union_pool": _q_u1_union_pool,
        "q_dedup_exact": _q_dedup_exact,
        "q_text_quality": _q_text_quality,
        "q_ngram_jaccard": _q_ngram_jaccard,
        "q_lang_profile": _q_lang_profile,
        "q_skew_salted_topk": _q_skew_salted_topk,
        "q_a5_active_loans_by_type_inline": _q_a5_active_loans_by_type_inline,
        "q_minhash_bands": _q_minhash_bands,
        "q_simhash": _q_simhash,
        "q_s2_html_ingest": _q_s2_html_ingest,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_s1_scan_prune": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars > 200 ORDER BY doc_id
        """,
        "q_f1_field_extract": r"""
            SELECT doc_id,
                   coalesce(regexp_extract(text, 'data (\w+)', 1), '') AS after_data,
                   coalesce(regexp_extract(text, '^(\w+)', 1), '') AS first_tok
            FROM documents
        """,
        "q_f3_clean_number_inline": """
            SELECT raw,
                   coalesce(try_cast(trim(regexp_replace(raw, ',|₹|Rs', '', 'g')) AS double), 0.0) AS cleaned
            FROM (VALUES ('1,234.56'), ('₹5,00,000'), ('Rs 123'), ('  42 '),
                         (''), ('n/a'), ('-12.5'), ('1.2.3'), ('0')) AS t(raw)
        """,
        "q_f10_month_extract_inline": r"""
            SELECT id,
              CASE WHEN mm != '' AND ym != ''
                   THEN concat(mm, ' ', string_split(ym, '-')[1])
                   WHEN dm != '' THEN dm
                   ELSE 'Unknown Month' END AS month
            FROM (
              SELECT id,
                coalesce(regexp_extract(h, '(?i)(?:Month|Period)\s*[:\-]?\s*([A-Za-z]+)', 1), '') AS mm,
                coalesce(regexp_extract(h, '(?i)(?:Year|Financial Year)\s*[:\-]?\s*([0-9]{4}(?:-[0-9]{2,4})?)', 1), '') AS ym,
                coalesce(regexp_extract(h, '\b(?:January|February|March|April|May|June|July|August|September|October|November|December)\s*20[0-9]{2}\b', 0), '') AS dm
              FROM (VALUES (1, 'Month : January' || chr(10) || 'Year : 2024-25'),
                           (2, 'Period - April' || chr(10) || 'Financial Year: 2023-2024'),
                           (3, 'Filed for September 2025'),
                           (4, 'no period info'),
                           (5, 'month: may' || chr(10) || 'year: 2022')) AS t(id, h))
        """,
        "q_a1_dpd_decode_inline": r"""
            SELECT acct, max(
              CASE WHEN s IN ('000','std','000/std') THEN 0
                   WHEN s = '030' THEN 30 WHEN s = '060' THEN 60
                   WHEN s IN ('090','sub','090/sub') THEN 90
                   WHEN s IN ('120','dbt','120/dbt') THEN 120
                   WHEN s IN ('150','lss','150/lss','180') THEN 180
                   WHEN s = '-' THEN 0
                   ELSE coalesce(try_cast(regexp_extract(s, '^([0-9]+)', 1) AS int), 0) END
            ) AS worst_dpd
            FROM (SELECT acct, lower(trim(status)) AS s FROM (VALUES
                  (1,'000'),(1,'STD'),(1,'030'), (2,'090'),(2,'SUB'),(2,'XXX'),
                  (3,'-'),(3,'45x'), (4,'180'),(4,'LSS'), (5,'7/DPD'))
                  AS t(acct, status))
            GROUP BY acct
        """,
        "q_a2_threshold_counts": """
            SELECT user_id,
                   count(CASE WHEN value >= 50 THEN 1 END) AS ge_50,
                   count(CASE WHEN value >= 100 THEN 1 END) AS ge_100,
                   count(CASE WHEN value >= 150 THEN 1 END) AS ge_150,
                   count(*) AS total
            FROM events GROUP BY user_id
        """,
        "q_a3_flag_any": """
            SELECT o_custkey,
                   bool_or(o_orderstatus = 'F') AS has_f,
                   count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS matched,
                   count(*) AS total
            FROM orders GROUP BY o_custkey
        """,
        "q_a8_positive_mean": """
            SELECT event_type,
                   round(avg(CASE WHEN value > 100 THEN value END), 3) AS mean_positive,
                   round(avg(value), 2) AS mean_all
            FROM events GROUP BY event_type
        """,
        "q_a11_boost_ladder_inline": """
            SELECT CAST(s AS double) AS s,
                   CAST(CASE WHEN s >= 0.85 THEN 1.0 WHEN s >= 0.70 THEN 0.9
                             WHEN s >= 0.50 THEN 0.7 ELSE 0.5 END AS double) AS boost
            FROM (VALUES (0.99),(0.85),(0.849),(0.7),(0.69),(0.5),(0.49),(0.0),(-0.3)) AS t(s)
        """,
        "q_a12_nullsafe_accuracy": """
            SELECT CAST(round(avg(CASE WHEN actual IS NOT DISTINCT FROM expected
                                       THEN 1.0 ELSE 0.0 END), 3) AS double) AS accuracy,
                   count(*) AS n
            FROM (VALUES (1, 1), (2, 2), (3, 4), (NULL, NULL), (NULL, 5), (6, NULL))
                 AS t(actual, expected)
        """,
        "q_t1_topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders) WHERE rank <= 3
        """,
        "q_j1_broadcast_dim_join": """
            SELECT r_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q_s3_anti_join_resume": """
            SELECT c_nationkey, count(*) AS n_customers_without_orders
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderstatus = 'P')
            GROUP BY c_nationkey
        """,
        "q_j2_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
                 c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
                       FROM embeddings),
                 scored AS (
                   SELECT query_id, cand_id,
                          round(list_dot_product(qv, cv) /
                                (sqrt(list_dot_product(qv, qv)) *
                                 sqrt(list_dot_product(cv, cv))), 6) AS sim
                   FROM q CROSS JOIN c WHERE query_id != cand_id),
                 ranked AS (
                   SELECT query_id, cand_id, sim,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY sim DESC, cand_id ASC) AS rank
                   FROM scored)
            SELECT query_id, cand_id, rank, sim FROM ranked
            WHERE rank <= 5 AND sim >= -1.0
        """,
        "q_p3_segmentation": """
            WITH toks AS (
              SELECT doc_id, unnest(list_transform(string_split(text, ' '),
                             (x, i) -> struct_pack(tok := x, pos := i))) AS u
              FROM documents),
            seg AS (
              SELECT doc_id,
                     sum(CASE WHEN u.tok = 'the' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY u.pos
                             ROWS UNBOUNDED PRECEDING) AS seg
              FROM toks),
            per_seg AS (
              SELECT doc_id, seg, count(*) AS seg_len FROM seg
              GROUP BY doc_id, seg)
            SELECT doc_id, count(*) AS n_segments, max(seg_len) AS max_seg_len
            FROM per_seg GROUP BY doc_id
        """,
        "q_u1_union_pool": """
            SELECT pool, count(*) AS n FROM (
              SELECT event_id, 'signup_pool' AS pool FROM events WHERE event_type = 'signup'
              UNION ALL
              SELECT event_id, 'purchase_pool' AS pool FROM events WHERE event_type = 'purchase')
            GROUP BY pool
        """,
        "q_dedup_exact": """
            SELECT source, count(DISTINCT md5(text)) AS n_unique,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "q_text_quality": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(length(replace(text, ' ', '')) /
                         len(string_split(text, ' ')), 4) AS avg_tok_len,
                   round(len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a', 'of', 'and', 'to'))) /
                         CAST(len(string_split(text, ' ')) AS double), 4) AS stopword_ratio
            FROM documents
        """,
        "q_ngram_jaccard": """
            WITH d AS (SELECT doc_id, source,
                              list_distinct(string_split(text, ' ')) AS toks
                       FROM documents WHERE doc_id % 50 = 0),
                 t AS (SELECT doc_id, source, unnest(toks) AS tok FROM d),
                 sizes AS (SELECT doc_id, len(toks) AS n FROM d),
                 pairs AS (
                   SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
                   FROM t a JOIN t b ON a.tok = b.tok AND a.source = b.source
                                     AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
            SELECT d1, d2,
                   round(common / (s1.n + s2.n - common), 4) AS jaccard
            FROM pairs
            JOIN sizes s1 ON s1.doc_id = d1
            JOIN sizes s2 ON s2.doc_id = d2
            WHERE round(common / (s1.n + s2.n - common), 4) >= 0.5
        """,
        "q_lang_profile": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 2) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "q_skew_salted_topk": """
            SELECT tok, count(*) AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
            WHERE tok != ''
            GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
        """,
        "q_a5_active_loans_by_type_inline": """
            SELECT count(CASE WHEN is_active AND
                     (contains(lower(acct_type), 'personal loan') OR
                      contains(lower(acct_type), 'gold loan')) THEN 1 END) AS n_matching,
                   count(*) AS n_accounts
            FROM (VALUES ('Personal Loan', true), ('Unsecured Personal Loan', true),
                         ('Personal Loan', false), ('Gold Loan', true),
                         ('Credit Card', true), ('Business Loan', true))
                 AS t(acct_type, is_active)
        """,
        # q_minhash_bands / q_simhash: engine-specific hash functions —
        # intentionally no oracle (rows-only check).
    }
