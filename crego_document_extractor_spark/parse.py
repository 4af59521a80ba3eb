"""PARSE stage — the flagship vectorized Arrow UDF (north_star).

``documents(doc_id, spans)`` → per-document parsed structure:

* ``clean_spans``  boilerplate-stripped ordered spans (the correctness
  invariant: span-sequence equality vs the oracle)
* ``text``         rendered markdown-ish full text (parser.py:87)
* ``tables``       ordered table structs, id=enumerate (parser.py:90-106)
* ``chunks``       header-segmented chunks (parser.py:107-124)

Implemented as ONE ``mapInPandas`` stage: Arrow-batched in and out, no
per-row Python UDFs, no shuffle.  The Python body delegates to the
shared pure-function core in :mod:`..semantics` so the parse semantics
have a single definition.  All downstream extraction is JVM-side SQL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import semantics as S

SPAN_TYPE = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

TABLE_TYPE = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("page", T.IntegerType()),
    T.StructField("columns", T.ArrayType(T.StringType())),
    T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
    T.StructField("raw", T.StringType()),
])

CHUNK_TYPE = T.StructType([
    T.StructField("chunk_idx", T.IntegerType()),
    T.StructField("header", T.StringType()),
    T.StructField("text", T.StringType()),
])

PARSED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("doc_kind", T.StringType()),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("clean_spans", T.ArrayType(SPAN_TYPE)),
    T.StructField("text", T.StringType()),
    T.StructField("tables", T.ArrayType(TABLE_TYPE)),
    T.StructField("chunks", T.ArrayType(CHUNK_TYPE)),
])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_TYPE)),
])

_KINDS = ("crif", "gstr", "html")


def _doc_kind(doc_id: str) -> str:
    head = doc_id.split("-", 1)[0]
    return head if head in _KINDS else "other"


#: SQL twin of ``_doc_kind`` — used by the parse cache to recompute the
#: kind from the *requesting* doc_id at serve time (the cache key is
#: content-only, so a byte-identical span payload may be shared across
#: kinds; the routing kind must come from the caller, not the cache)
DOC_KIND_SQL = (
    "CASE WHEN element_at(split(doc_id, '-'), 1) IN ('crif', 'gstr', 'html') "
    "THEN element_at(split(doc_id, '-'), 1) ELSE 'other' END"
)


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "doc_id": [], "doc_kind": [], "n_spans": [],
            "clean_spans": [], "text": [], "tables": [], "chunks": [],
        }
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            span_dicts = [
                {"kind": s["kind"], "text": s["text"],
                 "media_ref": s["media_ref"], "offset": int(s["offset"])}
                for s in spans
            ]
            cs = S.clean_spans(span_dicts)
            tables = [
                {"id": t["id"], "page": t["page"], "columns": t["columns"],
                 "rows": t["rows"], "raw": t["raw"]}
                for t in S.build_tables(cs)
            ]
            chunks = [
                {"chunk_idx": c["chunk_idx"], "header": c["header"],
                 "text": c["text"]}
                for c in S.build_chunks(cs)
            ]
            out["doc_id"].append(doc_id)
            out["doc_kind"].append(_doc_kind(doc_id))
            out["n_spans"].append(len(span_dicts))
            out["clean_spans"].append(cs)
            out["text"].append(S.render_text(cs))
            out["tables"].append(tables)
            out["chunks"].append(chunks)
        yield pd.DataFrame(out)


#: per-doc account-aggregate columns pre-flattened by the fused stage
#: (names/types mirror the _with_accounts SQL aggregation exactly)
_ACCT_AGG_COLS = ("n_accounts", "rep_dpd30", "rep_dpd60", "rep_dpd90",
                  "rep_live_plbl", "rep_m_bureau_suit_filed",
                  "rep_m_bureau_wilful_default",
                  "rep_m_bureau_settlement_writeoff")


def _parse_retr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fused parse + retrieval: one Python worker pass computes the
    parsed structure AND the per-parameter best-chunk column — stage
    profiling showed the flagship python-stage-bound with two Arrow
    round-trips (parse MapInPandas → JVM → retrieval pandas_udf);
    fusing removes one (r4 VERDICT #6).  Semantics are shared
    function-for-function with the unfused plan (retrieve_rows /
    candidate_pool), which stays as the second physical form."""
    from .extract.retrieval import candidate_pool, retrieve_rows

    for pdf in _parse_batches(batches):
        # pre-flatten the report-level table-signature values here —
        # measured ~4 s of interpreted-HOF JVM CPU per 160k docs when
        # computed by the SQL forms (X.doc_score/doc_summary/
        # doc_inquiries); the Python cost is ~µs/doc over the tiny
        # per-doc tables array.  The SQL forms remain the sql engine's
        # path, so the A9b agreement harness now cross-checks the two
        # implementations end-to-end.
        summaries = [S.account_summary(t) for t in pdf["tables"]]
        rep = {
            "rep_score": [S.bureau_score(t) for t in pdf["tables"]],
            "rep_inquiries": [S.credit_inquiries(t)
                              for t in pdf["tables"]],
        }
        for fld in ("total_accounts", "active_accounts",
                    "total_current_balance", "total_overdue_amount",
                    "total_writeoff_amount"):
            rep[f"rep_sum_{fld}"] = [s[fld] for s in summaries]
        # pre-flatten the ACCOUNT aggregates too (parse_crif_report,
        # crif_parser.py:7-25): one Account-Information chunk = one
        # account, parse_account returns None on empty Account Type —
        # the same validity the SQL path filters on.  Emitting the
        # eight per-doc aggregate scalars here lets the udf engine
        # skip the posexplode→HashAggregate entirely (its only
        # shuffle) and the per-account JVM regexp forest; the SQL
        # forms in _with_accounts stay the sql engine's path, so the
        # A9b agreement query cross-checks both implementations.
        for k in _ACCT_AGG_COLS:
            rep[k] = []
        for chunks in pdf["chunks"]:
            accts = [a for c in chunks
                     if c["header"].startswith("Account Information")
                     for a in (S.parse_account(c["text"]),) if a]
            rep["n_accounts"].append(len(accts))
            rep["rep_dpd30"].append(
                sum(a["worst_dpd"] >= 30 for a in accts))
            rep["rep_dpd60"].append(
                sum(a["worst_dpd"] >= 60 for a in accts))
            rep["rep_dpd90"].append(
                sum(a["worst_dpd"] >= 90 for a in accts))
            rep["rep_live_plbl"].append(
                any(S.is_live_pl_bl(a) for a in accts))
            rep["rep_m_bureau_suit_filed"].append(
                sum(S.has_suit_filed(a["remarks"]) for a in accts))
            rep["rep_m_bureau_wilful_default"].append(
                sum(S.has_wilful_default(a["remarks"]) for a in accts))
            rep["rep_m_bureau_settlement_writeoff"].append(
                sum(S.has_settlement_writeoff(a["remarks"]) for a in accts))
        # slim the fused payload: the extraction consumers never read
        # clean_spans / n_spans (crif uses tables+chunks+retr, gstr
        # adds text), and the per-element pandas→Arrow conversion of
        # the span structs is pure overhead on the flagship's only
        # Python stage — plain parses keep the full schema for the
        # span-equality deliverable
        yield pdf.drop(columns=["clean_spans", "n_spans"]).assign(retr=[
            retrieve_rows(candidate_pool(kind, tables, chunks))
            for kind, tables, chunks in zip(
                pdf["doc_kind"], pdf["tables"], pdf["chunks"])
        ], **rep)


def parse_documents(docs: DataFrame, fuse_retrieval: bool = False) -> DataFrame:
    """documents(doc_id, spans) → parsed-document DataFrame.

    Narrow (no shuffle); Arrow-batched; heavy-tailed docs bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.

    ``fuse_retrieval=True`` additionally emits the `retr` best-chunk
    column from the SAME Python stage (downstream `with_retrieval`
    then no-ops) — use when the consumer is the udf-engine extraction;
    plain parses (clean_spans-only consumers) should keep the default
    so they don't pay for retrieval they will prune away.
    """
    if fuse_retrieval:
        from .extract.retrieval import RETR_TYPE
        schema = T.StructType(
            [f for f in PARSED_SCHEMA.fields
             if f.name not in ("clean_spans", "n_spans")]
            + [T.StructField("retr", RETR_TYPE),
               # pre-flattened report values (types mirror the SQL
               # forms: summary_struct casts accounts to int, money
               # cells stay double)
               T.StructField("rep_score", T.IntegerType()),
               T.StructField("rep_inquiries", T.IntegerType()),
               T.StructField("rep_sum_total_accounts", T.IntegerType()),
               T.StructField("rep_sum_active_accounts", T.IntegerType()),
               T.StructField("rep_sum_total_current_balance",
                             T.DoubleType()),
               T.StructField("rep_sum_total_overdue_amount",
                             T.DoubleType()),
               T.StructField("rep_sum_total_writeoff_amount",
                             T.DoubleType())]
            + [T.StructField(c, T.BooleanType() if c == "rep_live_plbl"
                             else T.IntegerType())
               for c in _ACCT_AGG_COLS])
        return docs.mapInPandas(_parse_retr_batches, schema=schema)
    return docs.mapInPandas(_parse_batches, schema=PARSED_SCHEMA)


def load_documents(spark, path: str) -> DataFrame:
    """Scan the documents table (parquet; Iceberg at production scale —
    SURVEY.md §2 S1)."""
    return spark.read.parquet(path)
