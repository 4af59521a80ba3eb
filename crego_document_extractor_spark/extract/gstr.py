"""GSTR-3B extraction (reference gstr.py:11-155) — pure Spark SQL.

Emits two rows per document: ``gst_sales`` (Table-3.1 taxable value)
and ``gst_month`` (filing period), sharing source/confidence/status
like the reference's single sales record (gstr.py:31-37).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import sqlexpr as X
from .crif import RESULT_FIELDS


def extract_gstr(parsed: DataFrame) -> DataFrame:
    df = parsed.where(F.col("doc_kind") == "gstr")
    df = (
        df.withColumn("g_month", F.expr(X.gstr_month("text")))
        .withColumn("g_tbl", F.expr(X.gstr_first_table()))
        .withColumn("g_row", F.expr(f"CASE WHEN g_tbl IS NOT NULL THEN {X.gstr_sales_row('g_tbl')} END"))
        .withColumn("g_idx", F.expr(f"CASE WHEN g_tbl IS NOT NULL THEN {X.gstr_taxable_idx('g_tbl')} END"))
        .withColumn("g_found", F.expr("g_tbl IS NOT NULL AND g_row IS NOT NULL"))
        .withColumn(
            "g_sales",
            F.expr(f"CASE WHEN g_found THEN "
                   f"{X.clean_currency('try_element_at(g_row, cast(g_idx + 1 AS int))')} END"))
        .withColumn(
            "g_source",
            F.expr("CASE WHEN g_found THEN concat('GSTR-3B Table 3.1 (Page ', "
                   "cast(g_tbl.page AS string), ')') "
                   "ELSE 'GSTR-3B Table 3.1 not found' END"))
        .withColumn("g_conf", F.expr("CASE WHEN g_found THEN 1.0d ELSE 0.0d END"))
        .withColumn("g_status", F.expr("CASE WHEN g_found THEN 'extracted' ELSE 'not_found' END"))
    )
    rows = F.expr(
        "array("
        "named_struct("
        "  'param_id', 'gst_sales', "
        "  'value_num', g_sales, "
        "  'value_bool', CAST(NULL AS boolean), "
        "  'value_str', CAST(NULL AS string), "
        "  'value_type', CASE WHEN g_sales IS NULL THEN 'null' ELSE 'float' END, "
        "  'source', g_source, 'confidence', g_conf, 'status', g_status, "
        "  'similarity_score', CAST(NULL AS double)), "
        "named_struct("
        "  'param_id', 'gst_month', "
        "  'value_num', CAST(NULL AS double), "
        "  'value_bool', CAST(NULL AS boolean), "
        "  'value_str', g_month, "
        "  'value_type', 'string', "
        "  'source', g_source, 'confidence', g_conf, 'status', g_status, "
        "  'similarity_score', CAST(NULL AS double))"
        ")"
    )
    return (df.select("doc_id", F.explode(rows).alias("r"))
            .select("doc_id", *[f"r.{f}" for f in RESULT_FIELDS]))
