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
from pyspark.sql import DataFrame, functions as F
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

#: chunk-aware flag parameters (crif_models.py:52-60 predicates — the
#: same three the SQL engine's X.FLAG_PREDS encodes)
_FLAG_FNS = {
    "bureau_suit_filed": S.has_suit_filed,
    "bureau_wilful_default": S.has_wilful_default,
    "bureau_settlement_writeoff": S.has_settlement_writeoff,
}


def _direct_cv(pid: str, t: dict):
    """Chunk-aware direct value from the winning TABLE candidate
    (crif.py:311-359) — the Python twin of crif._direct_chunk_value's
    SQL forms, built from the same semantics extractors the oracle
    uses, so fused-vs-unfused parity is by shared definition."""
    if pid == "bureau_credit_score":
        return S.bureau_score_from_table(t)
    if pid == "bureau_written_off_debt_amount":
        s = S.account_summary_from_table(t)
        return s["total_writeoff_amount"] if s else None
    if pid == "bureau_max_loans":
        s = S.account_summary_from_table(t)
        return int(s["total_accounts"]) if s else None
    if pid == "bureau_max_active_loans":
        s = S.account_summary_from_table(t)
        return int(s["active_accounts"]) if s else None
    if pid == "bureau_credit_inquiries":
        return S.credit_inquiries_from_table(t)
    raise KeyError(pid)


def _flat_fields() -> list:
    """(name, sparktype) for every per-parameter scalar the fused
    stage pre-flattens — exactly the columns extract_all_udf's result
    builders consume (bscore_i, cv_i/bt_id_i, nc_i/mc_i) plus the four
    GSTR primitives."""
    from .specs import PARAMETER_SPECS
    fields = []
    for i, spec in enumerate(PARAMETER_SPECS):
        if spec["category"] == "policy":
            continue
        fields.append((f"bscore_{i}", T.DoubleType()))
        if spec["category"] == "direct":
            fields.append((f"cv_{i}", T.DoubleType()))
            fields.append((f"bt_id_{i}", T.IntegerType()))
        elif spec["category"] == "flag" and spec["param_id"] in _FLAG_FNS:
            fields.append((f"nc_{i}", T.IntegerType()))
            fields.append((f"mc_{i}", T.IntegerType()))
    fields += [("g_month", T.StringType()), ("g_found", T.BooleanType()),
               ("g_page", T.IntegerType()), ("g_sales", T.DoubleType())]
    return fields


def _gstr_primitives(text: str, tables: list[dict]) -> tuple:
    """Python twin of gstr.with_gstr_columns's four primitives
    (g_month, g_found, g_page, g_sales — gstr.py:39-155), built from
    the same semantics helpers the oracle's ``gstr_sales`` uses, so the
    fused plan and the SQL forms stay agreement-checked end-to-end."""
    g_month = S.gstr_month(text)
    tbl = next((t for t in tables if S.gstr_table_matches(t)), None)
    if tbl is None:
        return g_month, False, None, None
    row = next((r for r in tbl["rows"]
                if "(a)" in " ".join(str(x) for x in r).lower()
                or "outward taxable supplies"
                in " ".join(str(x) for x in r).lower()), None)
    if row is None:
        return g_month, False, tbl["page"], None
    cols = tbl["columns"]
    idx = next((i for i, c in enumerate(cols)
                if "taxable" in str(c).lower() and "value" in str(c).lower()),
               -1)
    if idx == -1 and len(cols) > 1:
        idx = 1  # idx stays -1 (last cell) for 0/1-column tables
    cell = row[idx] if -len(row) <= idx < len(row) else None
    return (g_month, True, tbl["page"],
            S.clean_currency("" if cell is None else str(cell)))


def _parse_retr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fused parse + retrieval + FULL per-parameter pre-flatten.

    One Python worker pass computes the parsed structure, the
    per-parameter best chunk, AND every scalar the extraction result
    builders consume — stage profiling showed the flagship
    python-stage-bound with the nested tables/chunks/retr arrays'
    pandas→Arrow conversion and the JVM-side interpreted-HOF lookups
    (19 filter(tables/chunks) calls) as the residual cost after the r5
    fusion, so the fused payload is now ~50 primitive columns and the
    JVM side is pure codegen CASE/concat over them.  Semantics are
    shared function-for-function with the unfused plan (retrieve_rows /
    candidate_pool / semantics extractors), which stays as the second
    physical form, cross-checked by the A9b agreement query and the
    fused==unfused parity test (tests/test_paths.py)."""
    from .extract.retrieval import candidate_pool, retrieve_rows
    from .specs import PARAMETER_SPECS

    for pdf in _parse_batches(batches):
        # report-level table-signature values (crif_parser.py:28-127)
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
        # ACCOUNT aggregates (parse_crif_report, crif_parser.py:7-25):
        # one Account-Information chunk = one account, parse_account
        # returns None on empty Account Type — the same validity the
        # SQL path filters on.  Pre-flattening these lets the udf
        # engine skip the posexplode→HashAggregate entirely (its only
        # shuffle); the SQL forms in _with_accounts stay the sql
        # engine's path.
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
        # per-parameter flat scalars (crif.py:311-426 chunk-aware paths)
        flat = {name: [] for name, _ in _flat_fields()}
        for kind, text, tables, chunks in zip(
                pdf["doc_kind"], pdf["text"], pdf["tables"], pdf["chunks"]):
            retr = retrieve_rows(candidate_pool(kind, tables, chunks))
            tab_by_id = {t["id"]: t for t in tables}
            chunk_by_idx = {c["chunk_idx"]: c for c in chunks}
            for i, spec in enumerate(PARAMETER_SPECS):
                if spec["category"] == "policy":
                    continue
                r = retr[i]
                score = r["score"]
                flat[f"bscore_{i}"].append(score)
                if spec["category"] == "direct":
                    cv = bt_id = None
                    if score is not None and r["ctype"] == "table":
                        t = tab_by_id.get(r["ref_idx"])
                        if t is not None:
                            bt_id = t["id"]
                            cv = _direct_cv(spec["param_id"], t)
                    flat[f"cv_{i}"].append(
                        None if cv is None else float(cv))
                    flat[f"bt_id_{i}"].append(bt_id)
                elif (spec["category"] == "flag"
                      and spec["param_id"] in _FLAG_FNS):
                    nc = mc = 0
                    if score is not None and r["ctype"] == "text":
                        c = chunk_by_idx.get(r["ref_idx"])
                        if c is not None:
                            # crif.py:395-401 sub-block split
                            blocks = c["text"].split("Account Number:")[1:]
                            accts = [
                                a for a in
                                (S.parse_account("Account Number:" + b)
                                 for b in blocks) if a]
                            nc = len(accts)
                            fn = _FLAG_FNS[spec["param_id"]]
                            mc = sum(1 for a in accts if fn(a["remarks"]))
                    flat[f"nc_{i}"].append(nc)
                    flat[f"mc_{i}"].append(mc)
            if kind == "gstr":
                gm, gf, gp, gs = _gstr_primitives(text, tables)
            else:  # consumed only under doc_kind='gstr' (crif.extract_all)
                gm, gf, gp, gs = None, False, None, None
            flat["g_month"].append(gm)
            flat["g_found"].append(gf)
            flat["g_page"].append(gp)
            flat["g_sales"].append(gs)
        # the fused payload is SLIM: the nested clean_spans/tables/
        # chunks/retr arrays and the full text — the bulk of the
        # pandas→Arrow conversion cost — never cross the boundary;
        # plain parses keep the full schema for the span-equality
        # deliverable
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"], "doc_kind": pdf["doc_kind"],
            **rep, **flat})


# ---------------------------------------------------------------------------
# JVM (pure-SQL) parse — r6 optimization
# ---------------------------------------------------------------------------
#
# The non-fused parse used to run `_parse_batches` in a mapInPandas
# stage: every consumer paid the full JVM→Arrow→pandas→Arrow→JVM round
# trip AND the Python compute for ALL output columns, because an opaque
# Python stage defeats Catalyst column pruning (guide §4.1/§4.2).  The
# same semantics are expressible as higher-order SQL over the spans
# array, which (a) removes the Python boundary entirely for this path
# and (b) lets Catalyst prune: a clean_spans-only consumer never
# computes text/tables/chunks at all.  Every expression below mirrors a
# `semantics.py` function line by line (named in comments); the parity
# suite (tests/test_spans, scripts/smoke.py span diff, A9b agreement)
# pins JVM-vs-Python equality, which the Python oracle now genuinely
# independently checks.

#: Java-regex char class of exactly CPython's str whitespace set
#: (Py_UNICODE_ISSPACE) — `str.split()` / `str.strip()` parity needs
#: the full set, not regex \s (which lacks \xa0 etc.)
_PY_WS_CLASS = "[" + "".join(
    f"\\\\u{o:04x}" for o in range(0x10000) if chr(o).isspace()) + "]"

#: python str.strip() as SQL: drop leading/trailing python-whitespace
def _pystrip(e: str) -> str:
    return (f"regexp_replace({e}, "
            f"'^{_PY_WS_CLASS}+|{_PY_WS_CLASS}+$', '')")


def _clean_spans_sql() -> str:
    """semantics.clean_spans: stable sort by offset, drop boilerplate
    (kind stoplist + link-density, semantics.is_boilerplate), re-densify
    offsets 0..n-1.  Stability on equal offsets is reproduced by
    tagging each span with its original index before the comparator
    sort (Python `sorted` is stable)."""
    links = "((length(s.text) - length(replace(s.text, ']('))) div 2)"
    words = (f"size(filter(split(s.text, '{_PY_WS_CLASS}+'), "
             f"w -> w != ''))")
    boiler = (f"(s.kind IN ('nav', 'footer', 'ad') OR "
              f"(s.kind = 'text' AND {links} >= 2 AND "
              f"{words} < {links} * 6))")
    ordered = ("transform(array_sort("
               "transform(spans, (s, i) -> struct(s AS s, i AS i)), "
               "(a, b) -> CASE WHEN a.s.offset < b.s.offset THEN -1 "
               "WHEN a.s.offset > b.s.offset THEN 1 "
               "WHEN a.i < b.i THEN -1 WHEN a.i > b.i THEN 1 "
               "ELSE 0 END), x -> x.s)")
    return (f"transform(filter({ordered}, s -> NOT {boiler}), "
            f"(s, i) -> named_struct("
            f"'kind', s.kind, 'text', s.text, "
            f"'media_ref', s.media_ref, 'offset', cast(i AS int)))")


#: semantics.render_line for a table span: '| <line> |' per grid line
def _table_md(raw: str) -> str:
    return (f"array_join(transform(split({raw}, '\\\\n'), "
            f"ln -> concat('| ', ln, ' |')), '\\n')")


def _render_text_sql(clean: str) -> str:
    """semantics.render_text over the clean spans: heading → '# ' +
    text, text → raw, table → markdown pipe rows, others skipped."""
    return (f"array_join(transform("
            f"filter({clean}, s -> s.kind IN ('heading', 'text', 'table')), "
            f"s -> CASE WHEN s.kind = 'heading' THEN concat('# ', s.text) "
            f"WHEN s.kind = 'text' THEN s.text "
            f"ELSE {_table_md('s.text')} END), '\\n')")


def _chunks_sql(clean: str) -> str:
    """semantics.build_chunks: the renderable spans stream into
    header-delimited chunks — a heading closes the current chunk (kept
    when its text is non-blank by python-strip) and opens
    header=line.strip('# '), text=line+'\\n'; text/table lines append;
    the final partial chunk is flushed; chunk_idx = enumerate.

    Formulated SEGMENT-wise, not as an aggregate() fold: segment k
    spans the rendered lines [bounds[k], bounds[k+1]) where bounds =
    1 ++ heading positions ++ n+1, its text is the '\\n'-join of those
    lines plus a trailing newline, and its header is 'Start' for the
    pre-heading prefix or the heading line stripped of '# '.  The
    obvious fold re-concats the accumulated text at every span —
    O(chunk_chars × spans) per document; it alone was 13.9 s of the
    16.7 s full-parse noop at 240k docs — while the segment form copies
    every line exactly once."""
    lines = (f"transform(filter({clean}, "
             f"s -> s.kind IN ('heading', 'text', 'table')), "
             f"s -> named_struct('h', s.kind = 'heading', "
             f"'line', CASE WHEN s.kind = 'heading' "
             f"THEN concat('# ', s.text) "
             f"WHEN s.kind = 'text' THEN s.text "
             f"ELSE {_table_md('s.text')} END))")
    # positions (1-based) of heading lines; segment bounds around them
    # (CASE guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so the
    # un-guarded form probes element_at(rl, 1) on an empty array)
    bounds = ("CASE WHEN size(rl) = 0 THEN array(1, 1) "
              "ELSE concat(array(1), "
              "filter(sequence(1, size(rl)), "
              "i -> element_at(rl, i).h), "
              "array(size(rl) + 1)) END")
    seg = ("transform(sequence(1, size(bs) - 1), k -> named_struct("
           "'header', CASE WHEN k = 1 THEN 'Start' "
           "ELSE trim(BOTH '# ' FROM "
           "element_at(rl, element_at(bs, k)).line) END, "
           "'text', CASE WHEN element_at(bs, k + 1) > element_at(bs, k) "
           "THEN concat(array_join(transform("
           "slice(rl, element_at(bs, k), "
           "element_at(bs, k + 1) - element_at(bs, k)), x -> x.line), "
           "'\\n'), '\\n') ELSE '' END))")
    nonblank = _pystrip("c.text") + " != ''"
    # bind rl then bs via single-element transform shells (a spliced
    # subexpression inside a lambda would re-evaluate per element)
    segs = (f"element_at(transform(array({lines}), rl -> "
            f"element_at(transform(array({bounds}), bs -> {seg}), 1)), 1)")
    return (f"transform(filter({segs}, c -> {nonblank}), "
            f"(c, i) -> named_struct("
            f"'chunk_idx', cast(i AS int), 'header', c.header, "
            f"'text', c.text))")


def _with_tables_cols(df: DataFrame) -> DataFrame:
    """semantics.build_tables + parse_table as staged array columns
    (each intermediate bound ONCE — a spliced subexpression inside a
    lambda is re-evaluated per element, the q_minhash_bands disease).

    parse_table semantics: line 0 = '|'-separated column names
    (python-stripped); blank line 0 → ([], []); following non-blank
    lines = rows, cells python-stripped then padded/truncated to the
    column count; page = 'page:(\\d+)$' match on media_ref else -1."""
    from .extract.sqlexpr import SLICE_REST
    df = df.withColumn("_tsp", F.expr(
        "filter(_clean, s -> s.kind = 'table')"))
    df = df.withColumn("_tlines", F.expr(
        "transform(_tsp, s -> split(s.text, '\\\\n'))"))
    df = df.withColumn("_tcols", F.expr(
        f"transform(_tlines, lines -> "
        f"CASE WHEN {_pystrip('element_at(lines, 1)')} = '' "
        f"THEN cast(array() AS ARRAY<STRING>) "
        f"ELSE transform(split(element_at(lines, 1), '\\\\|'), "
        f"c -> {_pystrip('c')}) END)"))
    cells = _pystrip("try_element_at(cs, j)")
    df = df.withColumn("_trows", F.expr(
        f"zip_with(_tlines, _tcols, (lines, cols) -> "
        f"CASE WHEN size(cols) = 0 "
        f"THEN cast(array() AS ARRAY<ARRAY<STRING>>) "
        f"ELSE transform("
        f"transform(filter(slice(lines, 2, {SLICE_REST}), "
        f"ln -> {_pystrip('ln')} != ''), ln -> split(ln, '\\\\|')), "
        f"cs -> transform(sequence(1, size(cols)), "
        f"j -> coalesce({cells}, ''))) END)"))
    return df.withColumn("_tables", F.expr(
        "transform(_tsp, (s, i) -> named_struct("
        "'id', cast(i AS int), "
        "'page', coalesce(try_cast(regexp_extract("
        "coalesce(s.media_ref, ''), '^page:([0-9]+)$', 1) AS int), -1), "
        "'columns', element_at(_tcols, i + 1), "
        "'rows', element_at(_trows, i + 1), "
        "'raw', s.text))"))


def parse_documents_jvm(docs: DataFrame) -> DataFrame:
    """Pure-JVM parse: documents(doc_id, spans) → PARSED_SCHEMA, no
    Python stage (see the section comment above)."""
    df = docs.withColumn("_clean", F.expr(_clean_spans_sql()))
    df = _with_tables_cols(df)
    return df.select(
        "doc_id",
        F.expr(DOC_KIND_SQL).alias("doc_kind"),
        F.expr("cast(size(spans) AS int)").alias("n_spans"),
        F.col("_clean").alias("clean_spans"),
        F.expr(_render_text_sql("_clean")).alias("text"),
        F.col("_tables").alias("tables"),
        F.expr(_chunks_sql("_clean")).alias("chunks"),
    )


def parse_documents(docs: DataFrame, fuse_retrieval: bool = False) -> DataFrame:
    """documents(doc_id, spans) → parsed-document DataFrame.

    Narrow (no shuffle); Arrow-batched; heavy-tailed docs bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.

    ``fuse_retrieval=True`` emits the FULLY PRE-FLATTENED extraction
    input from the SAME Python stage: per-parameter best-chunk scores
    and chunk-aware values (bscore/cv/bt_id/nc/mc), report + account
    aggregates, and the GSTR primitives — ~50 primitive columns, no
    nested arrays, no text.  Use when the consumer is the udf-engine
    extraction (extract_all_udf builds pure-codegen result structs over
    these columns); plain parses (clean_spans-only consumers, the sql
    engine) keep the default full parsed schema.
    """
    if fuse_retrieval:
        schema = T.StructType(
            [T.StructField("doc_id", T.StringType()),
             T.StructField("doc_kind", T.StringType()),
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
               for c in _ACCT_AGG_COLS]
            + [T.StructField(name, typ) for name, typ in _flat_fields()])
        return docs.mapInPandas(_parse_retr_batches, schema=schema)
    # r6: the full-schema parse is pure JVM SQL — no Python boundary,
    # and Catalyst prunes unused parse columns per consumer (the
    # mapInPandas form computed and Arrow-shipped every column for
    # every consumer; `_parse_batches` remains the Python twin used by
    # the fused stage above and the test oracle).  The raw input rides
    # along as a Python-side tag: a consumer that references the wide
    # parse columns MANY times (the relational engine) re-parses from
    # the source with the Arrow stage instead, where one opaque
    # materialization beats dozens of interpreted re-evaluations —
    # see extract.crif.extract_all.
    out = parse_documents_jvm(docs)
    out._plain_parse_docs = docs
    return out


def parse_documents_arrow(docs: DataFrame) -> DataFrame:
    """The Arrow/Python full-schema parse (the pre-r6 physical form):
    one opaque mapInPandas materializing every parse column.  Faster
    than the JVM expressions ONLY for consumers that re-reference the
    wide columns many times over (e.g. the relational extraction
    engine); every other consumer wants `parse_documents` (prunable,
    no Python boundary)."""
    return docs.mapInPandas(_parse_batches, schema=PARSED_SCHEMA)


def load_documents(spark, path: str) -> DataFrame:
    """Scan the documents table (parquet; Iceberg at production scale —
    SURVEY.md §2 S1)."""
    return spark.read.parquet(path)
