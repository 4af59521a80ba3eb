"""CRIF bureau-report parameter extraction — JVM-side Spark SQL.

Mirrors the reference control flow (crif.py:37-78, 123-221) for all 15
parameters.  The per-document pipeline is shuffle-free: accounts,
table signatures, flags, DPD aggregates and confidence ladders are all
higher-order array expressions over the parsed nested columns; the
only Python is the vectorized retrieval UDF (retrieval.py).

Reference-faithful quirks preserved (see oracle.py for the full list):

* 'chunk_aware' is missing from CONFIDENCE_METHOD_WEIGHTS → weight 0.5
  (crif.py:542 ``dict.get(..., 0.5)``)
* a direct parameter whose value is None after fallback still reports
  status 'extracted' (output_formatter.py:22 default)
* derived parameters always compute from the full report
  (crif.py:428-436)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import sqlexpr as X
from .retrieval import with_retrieval
from ..specs import PARAMETER_SPECS

_NULLS = ("CAST(NULL AS double)", "CAST(NULL AS boolean)",
          "CAST(NULL AS string)", "CAST(NULL AS double)")

RESULT_FIELDS = ("param_id", "value_num", "value_bool", "value_str",
                 "value_type", "source", "confidence", "status",
                 "similarity_score")


def _result(param_id: str, value_num: str, value_bool: str, value_str: str,
            value_type: str, source: str, confidence: str, status: str,
            sim: str) -> str:
    return ("named_struct("
            f"'param_id', '{param_id}', "
            f"'value_num', {value_num}, "
            f"'value_bool', {value_bool}, "
            f"'value_str', {value_str}, "
            f"'value_type', {value_type}, "
            f"'source', {source}, "
            f"'confidence', {confidence}, "
            f"'status', {status}, "
            f"'similarity_score', {sim})")


def _policy_result(pid: str) -> str:
    return _result(pid, *_NULLS[:3], "'null'",
                   "'Not applicable (policy parameter)'", "0.0d",
                   "'not_applicable'", _NULLS[3])


def _not_found_result(pid: str) -> str:
    return _result(pid, *_NULLS[:3], "'null'",
                   "'No relevant sections found'", "0.0d",
                   "'not_found'", _NULLS[3])


# per-spec chunk-aware DIRECT extraction (crif.py:311-359); bt = the
# best chunk's table (or NULL)
def _direct_chunk_value(pid: str, bt: str) -> str:
    if pid == "bureau_credit_score":
        return (f"(CASE WHEN {bt} IS NOT NULL AND {X.score_sig(bt)} "
                f"THEN {X.score_from_table(bt)} END)")
    if pid == "bureau_written_off_debt_amount":
        return (f"(CASE WHEN {bt} IS NOT NULL AND {X.summary_sig(bt)} "
                f"THEN {X.summary_cell(bt, 'Total Writeoff Amt')} END)")
    if pid == "bureau_max_loans":
        return (f"(CASE WHEN {bt} IS NOT NULL AND {X.summary_sig(bt)} "
                f"THEN cast({X.summary_cell(bt, 'Number of Accounts')} AS int) END)")
    if pid == "bureau_max_active_loans":
        return (f"(CASE WHEN {bt} IS NOT NULL AND {X.summary_sig(bt)} "
                f"THEN cast({X.summary_cell(bt, 'Active Accounts')} AS int) END)")
    if pid == "bureau_credit_inquiries":
        return f"(CASE WHEN {bt} IS NOT NULL THEN {X.inq_from_table(bt)} END)"
    raise KeyError(pid)


_DIRECT_LABEL = {
    "bureau_credit_score": "Verification Table",
    "bureau_written_off_debt_amount": "Account Summary Table",
    "bureau_max_loans": "Account Summary Table",
    "bureau_max_active_loans": "Account Summary Table",
    "bureau_credit_inquiries": "Inquiry Table",
}

_DIRECT_REPORT_VALUE = {
    "bureau_credit_score": "rep_score",
    "bureau_written_off_debt_amount": "rep_summary.total_writeoff_amount",
    "bureau_max_loans": "rep_summary.total_accounts",
    "bureau_max_active_loans": "rep_summary.active_accounts",
    "bureau_credit_inquiries": "rep_inquiries",
}


def _direct_param(i: int, spec: dict) -> str:
    pid = spec["param_id"]
    best = f"try_element_at(retr, {i + 1})"
    bt = f"bt_{i}"
    chunk_val = f"cv_{i}"
    rep_val = _DIRECT_REPORT_VALUE[pid]
    label = _DIRECT_LABEL[pid]
    value = f"coalesce({chunk_val}, {rep_val})"
    is_float = spec["expected_type"] == "float"
    valid = X.validity("vv", spec["validator"])
    # crif.py:540-554 + 556-561: weight 0.5 (chunk) / 0.9 (report),
    # zeroed by validator, × similarity boost when a value exists
    conf = (f"(CASE WHEN {value} IS NULL THEN 0.0d "
            f"ELSE (CASE WHEN NOT (SELECT_VALID) THEN 0.0d "
            f"WHEN {chunk_val} IS NOT NULL THEN 0.5d ELSE 0.9d END) "
            f"* {X.boost(f'{best}.score')} END)"
            ).replace("SELECT_VALID", valid.replace("vv", value))
    source = (f"(CASE WHEN {chunk_val} IS NOT NULL "
              f"THEN concat('{label} (from Table ', cast({bt}.id + 1 AS string), ')') "
              f"ELSE '{label}' END)")
    vtype = (f"(CASE WHEN {value} IS NULL THEN 'null' "
             f"ELSE '{'float' if is_float else 'int'}' END)")
    sim = f"(CASE WHEN {value} IS NOT NULL THEN {best}.score END)"
    return _result(pid, f"cast({value} AS double)", _NULLS[1], _NULLS[2],
                   vtype, source, conf, "'extracted'", sim)


def _flag_param(i: int, spec: dict) -> str:
    pid = spec["param_id"]
    best = f"try_element_at(retr, {i + 1})"
    if pid in X.FLAG_PREDS:
        bc = f"bc_{i}"
        pred = X.FLAG_PREDS[pid].format(r="ba.remarks")
        blocks = (f"slice(split({bc}.text, 'Account Number:'), 2, {X.SLICE_REST})")
        # parse_account_from_text over each sub-block (crif.py:395-401);
        # only account_type validity + remarks matter for flags
        ca = (f"filter(transform({blocks}, blk -> named_struct("
              f"'account_type', {X.extract_field('blk', 'Account Type')}, "
              f"'remarks', {X.extract_field('blk', 'Account Remarks')})), "
              f"ba -> ba.account_type != '')")
        n_chunk = f"nc_{i}"
        m_chunk = f"mc_{i}"
        inter = {
            n_chunk: f"(CASE WHEN {bc} IS NOT NULL THEN size({ca}) ELSE 0 END)",
            m_chunk: (f"(CASE WHEN {bc} IS NOT NULL THEN "
                      f"size(filter({ca}, ba -> {pred})) ELSE 0 END)"),
        }
        chunk_ok = f"({n_chunk} > 0 AND {m_chunk} > 0)"
        rep_m = f"rep_m_{pid}"
        value = f"(CASE WHEN {chunk_ok} THEN true ELSE {rep_m} > 0 END)"
        source = (f"(CASE WHEN {chunk_ok} THEN concat('Account Remarks (', "
                  f"cast({m_chunk} AS string), '/', cast({n_chunk} AS string), "
                  f"' accounts in chunk)') "
                  f"ELSE concat('Account Remarks (', cast({rep_m} AS string), "
                  f"'/', cast(n_accounts AS string), ' accounts)') END)")
        conf = (f"(CASE WHEN {chunk_ok} THEN 0.5d ELSE 0.9d END) "
                f"* {X.boost(f'{best}.score')}")
    else:  # bureau_ntc_accepted — no checker, report path (crif.py:263-266)
        inter = {}
        value = "false"
        source = "concat('Account Remarks (0/', cast(n_accounts AS string), ' accounts)')"
        conf = f"0.9d * {X.boost(f'{best}.score')}"
    struct = _result(pid, _NULLS[0], value, _NULLS[2], "'bool'",
                     source, conf, "'extracted'", f"{best}.score")
    return struct, inter


_DERIVED_VALUE = {
    "bureau_dpd_30": ("rep_dpd30", "int"),
    "bureau_dpd_60": ("rep_dpd60", "int"),
    "bureau_dpd_90": ("rep_dpd90", "int"),
    "bureau_no_live_pl_bl": ("NOT rep_live_plbl", "bool"),
}


def _derived_param(i: int, spec: dict) -> str:
    pid = spec["param_id"]
    best = f"try_element_at(retr, {i + 1})"
    value, vtype = _DERIVED_VALUE[pid]
    source = "concat('Computed from ', cast(n_accounts AS string), ' accounts')"
    conf = f"0.9d * {X.boost(f'{best}.score')}"
    if vtype == "bool":
        return _result(pid, _NULLS[0], f"({value})", _NULLS[2], "'bool'",
                       source, conf, "'extracted'", f"{best}.score")
    return _result(pid, f"cast({value} AS double)", _NULLS[1], _NULLS[2],
                   "'int'", source, conf, "'extracted'", f"{best}.score")


def _with_report(df: DataFrame) -> DataFrame:
    """Report-level aggregates (parse_crif_report, crif_parser.py:7-25)
    — all zero-shuffle higher-order exprs."""
    df = (
        df.withColumn("accounts", F.expr(X.ACCOUNTS))
        .withColumn("rep_score", F.expr(X.doc_score()))
        .withColumn("rep_summary", F.expr(X.doc_summary()))
        .withColumn("rep_inquiries", F.expr(X.doc_inquiries()))
        .withColumn("n_accounts", F.expr("size(accounts)"))
        .withColumn("rep_dpd30", F.expr(X.dpd_count("accounts", 30)))
        .withColumn("rep_dpd60", F.expr(X.dpd_count("accounts", 60)))
        .withColumn("rep_dpd90", F.expr(X.dpd_count("accounts", 90)))
        .withColumn("rep_live_plbl", F.expr(X.has_live_pl_bl("accounts")))
    )
    for pid in X.FLAG_PREDS:
        df = df.withColumn(f"rep_m_{pid}", F.expr(X.flag_matched("accounts", pid)))
    return df


_LEGACY_WEIGHTS = {"direct": "0.95d", "flag": "0.85d", "derived": "1.0d"}


def extract_crif_legacy(parsed: DataFrame) -> DataFrame:
    """Legacy direct-parsing mode (crif_legacy.py:22-159,
    USE_EMBEDDING_GUIDED_EXTRACTION=False): report-level values only,
    direct_table/flag_detection/computed weights, no similarity boost,
    formatter-default 'extracted' status everywhere (incl. policy)."""
    df = _with_report(parsed.where(F.col("doc_kind") == "crif"))
    results = []
    for spec in PARAMETER_SPECS:
        pid = spec["param_id"]
        cat = spec["category"]
        if cat == "policy":
            results.append(_result(pid, *_NULLS[:3], "'null'",
                                   "'Not applicable (policy parameter)'",
                                   "0.0d", "'extracted'", _NULLS[3]))
            continue
        w = _LEGACY_WEIGHTS[cat]
        if cat == "direct":
            value = _DIRECT_REPORT_VALUE[pid]
            valid = X.validity(value, spec["validator"])
            conf = (f"(CASE WHEN {value} IS NULL THEN 0.0d "
                    f"WHEN NOT {valid} THEN 0.0d ELSE {w} END)")
            vtype = (f"(CASE WHEN {value} IS NULL THEN 'null' ELSE "
                     f"'{'float' if spec['expected_type'] == 'float' else 'int'}' END)")
            results.append(_result(pid, f"cast({value} AS double)", _NULLS[1],
                                   _NULLS[2], vtype,
                                   f"'{_DIRECT_LABEL[pid]}'", conf,
                                   "'extracted'", _NULLS[3]))
        elif cat == "flag":
            m = f"rep_m_{pid}" if pid in X.FLAG_PREDS else "0"
            value = f"({m} > 0)"
            source = (f"concat('Account Remarks (', cast({m} AS string), '/', "
                      f"cast(n_accounts AS string), ' accounts)')")
            results.append(_result(pid, _NULLS[0], value, _NULLS[2], "'bool'",
                                   source, w, "'extracted'", _NULLS[3]))
        else:
            value, vtype = _DERIVED_VALUE[pid]
            source = "concat('Computed from ', cast(n_accounts AS string), ' accounts')"
            if vtype == "bool":
                results.append(_result(pid, _NULLS[0], f"({value})", _NULLS[2],
                                       "'bool'", source, w, "'extracted'", _NULLS[3]))
            else:
                results.append(_result(pid, f"cast({value} AS double)",
                                       _NULLS[1], _NULLS[2], "'int'", source,
                                       w, "'extracted'", _NULLS[3]))
    arr = "array(" + ", ".join(results) + ")"
    return (df.select("doc_id", F.explode(F.expr(arr)).alias("r"))
            .select("doc_id", *[f"r.{f}" for f in RESULT_FIELDS]))


def extract_crif(parsed: DataFrame) -> DataFrame:
    """parsed (doc_kind='crif') → long results table, one row per
    (doc_id, param_id) — embedding-guided mode (the reference default,
    config.py:58)."""
    df = parsed.where(F.col("doc_kind") == "crif")
    df = with_retrieval(df)
    df = _with_report(df)

    # per-parameter best-chunk lookups + result structs
    results = []
    for i, spec in enumerate(PARAMETER_SPECS):
        pid = spec["param_id"]
        best = f"try_element_at(retr, {i + 1})"
        if spec["category"] == "policy":
            results.append(_policy_result(pid))
            continue
        if spec["category"] == "direct":
            df = df.withColumn(
                f"bt_{i}",
                F.expr(f"CASE WHEN {best}.score IS NOT NULL AND {best}.ctype = 'table' "
                       f"THEN try_element_at(filter(tables, t -> t.id = {best}.ref_idx), 1) END"))
            df = df.withColumn(f"cv_{i}", F.expr(_direct_chunk_value(pid, f"bt_{i}")))
            struct = _direct_param(i, spec)
        elif spec["category"] == "flag":
            if pid in X.FLAG_PREDS:
                df = df.withColumn(
                    f"bc_{i}",
                    F.expr(f"CASE WHEN {best}.score IS NOT NULL AND {best}.ctype = 'text' "
                           f"THEN try_element_at(filter(chunks, c -> c.chunk_idx = {best}.ref_idx), 1) END"))
            struct, inter = _flag_param(i, spec)
            for name, expr in inter.items():
                df = df.withColumn(name, F.expr(expr))
        else:
            struct = _derived_param(i, spec)
        # retrieval miss → NOT_FOUND (crif.py:154-162)
        results.append(f"(CASE WHEN {best}.score IS NULL "
                       f"THEN {_not_found_result(pid)} ELSE {struct} END)")

    arr = "array(" + ", ".join(results) + ")"
    return (df.select("doc_id", F.explode(F.expr(arr)).alias("r"))
            .select("doc_id", *[f"r.{f}" for f in RESULT_FIELDS]))
