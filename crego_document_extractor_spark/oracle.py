"""Pure-Python reference-semantics oracle (no Spark).

Given a raw document ``{doc_id, spans}`` this computes the expected
clean span sequence and the expected parameter rows by mirroring the
reference's extraction control flow exactly:

* routing crif/gstr/html  — main.py:66-69
* embedding-guided flow   — crif.py:123-221
* chunk-aware direct      — crif.py:311-375
* chunk-aware flags       — crif.py:377-426
* derived (always global) — crif.py:428-436
* policy                  — crif.py:302-309
* GSTR month + Table 3.1  — gstr.py:11-142
* confidence formula      — crif.py:540-561 (note: 'chunk_aware' is
  absent from CONFIDENCE_METHOD_WEIGHTS, so it weighs 0.5)
* output shape + overall  — output_formatter.py:12-70 and the API
  variant at main.py:70-78

The Spark engine's JVM-side SQL is implemented independently and must
match this oracle row-for-row (tests/).
"""

from __future__ import annotations

from typing import Any, Optional

from . import semantics as S
from .specs import PARAMETER_SPECS, query_text

# Precomputed query embeddings, one per spec (crif.py:136)
import numpy as _np

_QUERY_MAT = _np.stack([S.embed(query_text(spec)) for spec in PARAMETER_SPECS])


def _validate(spec: dict, value: Any) -> bool:
    """parameter_specs.py:31-41."""
    if value is None:
        return spec["category"] == "policy"
    t = spec["expected_type"]
    if t == "int" and not isinstance(value, int):
        return False
    if t == "float" and not isinstance(value, float):
        return False
    if t == "bool" and not isinstance(value, bool):
        return False
    if spec["validator"] == "score_range" and not (300 <= value <= 900):
        return False
    if spec["validator"] == "non_negative" and not (value >= 0):
        return False
    return True


def _confidence(spec: dict, value: Any, method: str) -> float:
    """crif.py:540-554."""
    w = S.method_weight(method)
    if not _validate(spec, value):
        return 0.0
    if value is None:
        certainty = 0.0
    else:
        certainty = 1.0  # values are constructed with the right type
    return w * certainty


def _row(doc_id: str, param_id: str, value: Any, source: str,
         confidence: float, status: str,
         similarity: Optional[float]) -> dict:
    value_num = None
    value_bool = None
    value_str = None
    if isinstance(value, bool):
        value_bool = value
        vtype = "bool"
    elif isinstance(value, int):
        value_num = float(value)
        vtype = "int"
    elif isinstance(value, float):
        value_num = value
        vtype = "float"
    elif isinstance(value, str):
        value_str = value
        vtype = "string"
    else:
        vtype = "null"
    return {
        "doc_id": doc_id, "param_id": param_id,
        "value_num": value_num, "value_bool": value_bool,
        "value_str": value_str, "value_type": vtype,
        "source": source, "confidence": confidence, "status": status,
        "similarity_score": similarity,
    }


def parse_document(doc: dict) -> dict:
    """The parse stage: clean spans + rendered text + tables + chunks."""
    cs = S.clean_spans(doc["spans"])
    return {
        "doc_id": doc["doc_id"],
        "clean_spans": cs,
        "text": S.render_text(cs),
        "tables": S.build_tables(cs),
        "chunks": S.build_chunks(cs),
    }


def _report(parsed: dict) -> dict:
    """parse_crif_report (crif_parser.py:7-25) equivalents."""
    accounts = []
    for c in parsed["chunks"]:
        if not c["header"].startswith("Account Information"):
            continue
        a = S.parse_account(c["text"])
        if a:
            accounts.append(a)
    return {
        "accounts": accounts,
        "summary": S.account_summary(parsed["tables"]),
        "score": S.bureau_score(parsed["tables"]),
        "inquiries": S.credit_inquiries(parsed["tables"]),
    }


def _candidates(parsed: dict) -> list[dict]:
    """_prepare_document_chunks (crif.py:80-121): tables then chunks,
    contents truncated to 1500 chars."""
    cands = []
    for t in parsed["tables"]:
        cands.append({"type": "table", "ref": t, "idx": t["id"],
                      "content": t["raw"][: S.MAX_CHUNK_CHARS]})
    for c in parsed["chunks"]:
        cands.append({"type": "text", "ref": c, "idx": c["chunk_idx"],
                      "content": c["text"][: S.MAX_CHUNK_CHARS]})
    return cands


def _direct_report_value(spec_id: str, report: dict) -> tuple[Any, str]:
    """crif.py:223-250."""
    if spec_id == "bureau_credit_score":
        return report["score"], "Verification Table"
    if spec_id == "bureau_written_off_debt_amount":
        return report["summary"]["total_writeoff_amount"], "Account Summary Table"
    if spec_id == "bureau_max_loans":
        return int(report["summary"]["total_accounts"]), "Account Summary Table"
    if spec_id == "bureau_max_active_loans":
        return int(report["summary"]["active_accounts"]), "Account Summary Table"
    if spec_id == "bureau_credit_inquiries":
        return report["inquiries"], "Inquiry Table"
    return None, "Unknown direct parameter"


def _direct_chunk_value(spec_id: str, cand: dict) -> tuple[Any, Optional[str]]:
    """crif.py:311-359 — chunk-aware attempt (table candidates only)."""
    if cand["type"] != "table":
        return None, None
    t = cand["ref"]
    src_tail = f"(from Table {t['id'] + 1})"  # crif.py:99 source label
    if spec_id == "bureau_credit_score":
        v = S.bureau_score_from_table(t)
        return v, f"Verification Table {src_tail}" if v is not None else None
    if spec_id == "bureau_written_off_debt_amount":
        summ = S.account_summary_from_table(t)
        if summ:
            return summ["total_writeoff_amount"], f"Account Summary Table {src_tail}"
        return None, None
    if spec_id == "bureau_max_loans":
        summ = S.account_summary_from_table(t)
        if summ:
            return int(summ["total_accounts"]), f"Account Summary Table {src_tail}"
        return None, None
    if spec_id == "bureau_max_active_loans":
        summ = S.account_summary_from_table(t)
        if summ:
            return int(summ["active_accounts"]), f"Account Summary Table {src_tail}"
        return None, None
    if spec_id == "bureau_credit_inquiries":
        v = S.credit_inquiries_from_table(t)
        return v, f"Inquiry Table {src_tail}" if v is not None else None
    return None, None


_FLAG_FNS = {
    "bureau_suit_filed": S.has_suit_filed,
    "bureau_wilful_default": S.has_wilful_default,
    "bureau_settlement_writeoff": S.has_settlement_writeoff,
}


def extract_crif(parsed: dict) -> list[dict]:
    doc_id = parsed["doc_id"]
    report = _report(parsed)
    cands = _candidates(parsed)
    cand_vecs = [S.embed(c["content"]) for c in cands]
    retrieved = S.retrieve_best(_QUERY_MAT, cand_vecs)
    accounts = report["accounts"]
    rows = []

    for spec_i, spec in enumerate(PARAMETER_SPECS):
        pid = spec["param_id"]
        if spec["category"] == "policy":
            rows.append(_row(doc_id, pid, None, "Not applicable (policy parameter)",
                             0.0, "not_applicable", None))
            continue

        best_i, score = retrieved[spec_i]
        if best_i is None:
            rows.append(_row(doc_id, pid, None, "No relevant sections found",
                             0.0, "not_found", None))
            continue
        best = cands[best_i]

        if spec["category"] == "direct":
            value, source = _direct_chunk_value(pid, best)
            if value is not None:
                conf = _confidence(spec, value, "chunk_aware")
            else:
                value, source = _direct_report_value(pid, report)
                conf = _confidence(spec, value, "embedding_guided")
        elif spec["category"] == "flag":
            value = None
            # chunk-aware flags (crif.py:388-422)
            if best["type"] == "text" and pid in _FLAG_FNS:
                blocks = best["ref"]["text"].split("Account Number:")[1:]
                chunk_accounts = [
                    a for a in
                    (S.parse_account("Account Number:" + b) for b in blocks)
                    if a
                ]
                if chunk_accounts:
                    fn = _FLAG_FNS[pid]
                    matched = sum(1 for a in chunk_accounts if fn(a["remarks"]))
                    if matched > 0:
                        value = True
                        source = (f"Account Remarks ({matched}/"
                                  f"{len(chunk_accounts)} accounts in chunk)")
                        conf = _confidence(spec, value, "chunk_aware")
            if value is None:
                # report-level (crif.py:252-277); ntc/unknown → (False, 0)
                if pid in _FLAG_FNS:
                    fn = _FLAG_FNS[pid]
                    matched = sum(1 for a in accounts if fn(a["remarks"]))
                else:
                    matched = 0
                value = matched > 0
                source = f"Account Remarks ({matched}/{len(accounts)} accounts)"
                conf = _confidence(spec, value, "embedding_guided")
        else:  # derived (crif.py:279-300; always report-level per :428-436)
            if pid == "bureau_dpd_30":
                value = sum(1 for a in accounts if a["worst_dpd"] >= 30)
            elif pid == "bureau_dpd_60":
                value = sum(1 for a in accounts if a["worst_dpd"] >= 60)
            elif pid == "bureau_dpd_90":
                value = sum(1 for a in accounts if a["worst_dpd"] >= 90)
            elif pid == "bureau_no_live_pl_bl":
                value = not any(S.is_live_pl_bl(a) for a in accounts)
            else:
                value = None
            source = f"Computed from {len(accounts)} accounts"
            conf = _confidence(spec, value, "embedding_guided")

        # crif.py:208-215: boost + status only when a value was extracted
        if value is not None:
            rows.append(_row(doc_id, pid, value, source,
                             conf * S.similarity_boost(score), "extracted", score))
        else:
            # formatter default status (output_formatter.py:22)
            rows.append(_row(doc_id, pid, value, source, conf, "extracted", None))
    return rows


_LEGACY_WEIGHTS = {"direct": 0.95, "flag": 0.85, "derived": 1.0}


def extract_crif_legacy(parsed: dict) -> list[dict]:
    """Legacy direct-parsing mode (crif_legacy.py:22-159,
    USE_EMBEDDING_GUIDED_EXTRACTION=False): report-level only, method
    weights direct_table=0.95 / flag_detection=0.85 / computed=1.0, no
    similarity boost, no status keys (formatter default 'extracted' —
    including policy parameters, crif_legacy.py:134-139)."""
    doc_id = parsed["doc_id"]
    report = _report(parsed)
    accounts = report["accounts"]
    rows = []
    for spec in PARAMETER_SPECS:
        pid = spec["param_id"]
        if spec["category"] == "policy":
            rows.append(_row(doc_id, pid, None,
                             "Not applicable (policy parameter)", 0.0,
                             "extracted", None))
            continue
        if spec["category"] == "direct":
            value, source = _direct_report_value(pid, report)
        elif spec["category"] == "flag":
            if pid in _FLAG_FNS:
                fn = _FLAG_FNS[pid]
                matched = sum(1 for a in accounts if fn(a["remarks"]))
            else:
                matched = 0
            value = matched > 0
            source = f"Account Remarks ({matched}/{len(accounts)} accounts)"
        else:
            if pid == "bureau_dpd_30":
                value = sum(1 for a in accounts if a["worst_dpd"] >= 30)
            elif pid == "bureau_dpd_60":
                value = sum(1 for a in accounts if a["worst_dpd"] >= 60)
            elif pid == "bureau_dpd_90":
                value = sum(1 for a in accounts if a["worst_dpd"] >= 90)
            else:
                value = not any(S.is_live_pl_bl(a) for a in accounts)
            source = f"Computed from {len(accounts)} accounts"
        w = _LEGACY_WEIGHTS[spec["category"]]
        conf = w if (value is not None and _validate(spec, value)) else 0.0
        rows.append(_row(doc_id, pid, value, source, conf, "extracted", None))
    return rows


def extract_gstr(parsed: dict) -> list[dict]:
    doc_id = parsed["doc_id"]
    month = S.gstr_month(parsed["text"])
    sales = S.gstr_sales(parsed["tables"])
    if sales is None:
        src, conf, status, value = "GSTR-3B Table 3.1 not found", 0.0, "not_found", None
    else:
        src, conf, status, value = sales["source"], sales["confidence"], "extracted", sales["value"]
    return [
        _row(doc_id, "gst_sales", value, src, conf, status, None),
        _row(doc_id, "gst_month", month, src, conf, status, None),
    ]


def extract_document(doc: dict) -> dict:
    """Full per-document oracle: clean spans + parameter rows."""
    parsed = parse_document(doc)
    if doc["doc_id"].startswith("crif-"):
        results = extract_crif(parsed)
    elif doc["doc_id"].startswith("gstr-"):
        results = extract_gstr(parsed)
    else:
        results = []
    return {"doc_id": doc["doc_id"], "clean_spans": parsed["clean_spans"],
            "results": results}


def overall_confidence(rows: list[dict], variant: str = "formatter") -> float:
    """A8 — formatter variant (output_formatter.py:46-70, drops zeros,
    round 3) vs API variant (main.py:70-78, keeps zeros, round 2)."""
    confs = [r["confidence"] for r in rows]
    if variant == "formatter":
        confs = [c for c in confs if c > 0]
        if not confs:
            return 0.0
        return round(sum(confs) / len(confs), 3)
    if not confs:
        return 0.0
    return round(sum(confs) / len(confs), 2)
