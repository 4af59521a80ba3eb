"""Corpus-curation operators: deterministic sampling + PII scrubbing.

Two more staples of a web-scale training-data pipeline, built to the
same standard as ops/dedup and ops/textstats: pure JVM expressions,
scale-safe shuffle shapes, and semantics a DuckDB oracle can
reproduce bit-for-bit.

* ``stratified_sample`` — per-stratum top-k by a content-independent
  deterministic key (md5 of the id): every engine, every run, every
  cluster size selects the SAME sample — the property that makes
  sampled pipelines resumable and auditable.  The per-stratum rank is
  a windowed row_number, which Catalyst executes with map-side +
  reduce-side WindowGroupLimit (only k rows per stratum per partition
  shuffle — the same audited shape as q_t1_topk_per_group).
* ``redact_pii`` — email / long-digit-run scrubbing with patterns
  chosen to mean the same thing in Java regex (Spark) and RE2
  (DuckDB), so redaction is oracle-checkable.  At corpus scale this
  is a narrow projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

#: patterns valid AND equivalent in Java regex and RE2 — no
#: backreferences, no lookaround, ASCII \b
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b\d{10,12}\b"


def stratified_sample(df: DataFrame, n_per_stratum: int,
                      key_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sample: rank rows inside each
    `key_col` group by (md5(id), id) and keep the first
    `n_per_stratum`.  md5 of the stringified id is uniform,
    content-independent, and computes identically everywhere."""
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= n_per_stratum))


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_pii`` (matches found) and ``redacted`` (text with
    emails → [EMAIL], 10-12 digit runs → [PHONE]).  Counting uses the
    same patterns as the rewrite, so n_pii == 0 ⇒ redacted == text."""
    # Spark SQL string literals process backslash escapes, so regex
    # backslashes must be doubled when embedded in expr() text
    email_sql = EMAIL_PAT.replace("\\", "\\\\")
    phone_sql = PHONE_PAT.replace("\\", "\\\\")
    email_count = f"size(regexp_extract_all({text_col}, '{email_sql}', 0))"
    phone_count = f"size(regexp_extract_all({text_col}, '{phone_sql}', 0))"
    redacted = (f"regexp_replace(regexp_replace({text_col}, "
                f"'{email_sql}', '[EMAIL]'), '{phone_sql}', '[PHONE]')")
    return (df.withColumn("n_pii",
                          F.expr(f"{email_count} + {phone_count}"))
            .withColumn("redacted", F.expr(redacted)))
