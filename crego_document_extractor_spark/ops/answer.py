"""Deterministic extractive RAG fallback — no LLM, no external calls.

The reference's last-resort path (crif.py:448-538
``_extract_with_llm_and_rag``): when the embedding-guided programmatic
extraction finds a best chunk but no value, and RAG is enabled
(``ENABLE_RAG``, config.py:67 — default False), it prompts an LLM with
the RAG context + the chunk's first 2000 chars and type-coerces the
reply (confidence 0.6 × the similarity-boost ladder, status
extracted / not_found).

This module replaces the ``llm.generate`` free-text step with a
DETERMINISTIC extractive answerer built from the engine's own
retrieval ops: the chunk is sentence-split, each sentence scored with
the shared hash-embedding cosine against the parameter query
(semantics.embed — the same scorer the chunk retrieval uses), and the
best sentence yields the first token coercible to the spec's expected
type.  Everything downstream of the answer string — the NOT_FOUND
sentinel, the int/float/bool coercion rules (crif.py:503-530), the
0.6 confidence and boost multiply — mirrors the reference exactly.

Flag-gated like the reference: ``SPARK_GRAFT_ENABLE_RAG=1`` (or
``enabled=True``) activates it; the default engine ships with it off,
matching ``ENABLE_RAG=False``.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import semantics as S
from ..specs import PARAMETER_SPECS, query_text

NOT_FOUND = "NOT_FOUND"

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+|\n+| \| ")
_NUM = re.compile(r"-?\d[\d,]*(?:\.\d+)?")
_BOOL_TRUE = re.compile(r"\b(yes|true|present|exists)\b", re.I)
_BOOL_FALSE = re.compile(r"\b(no|false|none|absent)\b", re.I)

_SPEC_BY_ID = {s["param_id"]: s for s in PARAMETER_SPECS}
_QUERY_VECS = {s["param_id"]: S.embed(query_text(s)) for s in PARAMETER_SPECS}


def rag_fallback_enabled() -> bool:
    """Reference default: ENABLE_RAG=False (config.py:67)."""
    return os.environ.get("SPARK_GRAFT_ENABLE_RAG", "0") == "1"


def best_sentence(query_vec: np.ndarray, text: str,
                  etype: str | None = None) -> str | None:
    """Highest-cosine sentence of `text` vs the parameter query — the
    extractive stand-in for the LLM's reading of the document section.
    Only TYPE-COMPATIBLE sentences compete (one containing a number
    for int/float, a yes/no marker for bool — a sentence that cannot
    yield the expected type cannot be the answer).  Ties break to the
    earliest sentence (document order)."""
    sentences = [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]
    if etype in ("int", "float"):
        sentences = [s for s in sentences if _NUM.search(s)]
    elif etype == "bool":
        sentences = [s for s in sentences
                     if _BOOL_TRUE.search(s) or _BOOL_FALSE.search(s)]
    if not sentences:
        return None
    best, best_score = None, -2.0
    for s in sentences:
        v = S.embed(s)
        denom = float(np.linalg.norm(v) * np.linalg.norm(query_vec))
        score = float(np.dot(v, query_vec) / denom) if denom else 0.0
        if score > best_score:
            best, best_score = s, score
    return best


def extractive_answer(param_id: str, chunk_text: str) -> str:
    """Deterministic twin of llm.generate for the extraction prompt
    (crif.py:459-476): returns the value string, or NOT_FOUND.  The
    prompt truncates the section to 2000 chars — so do we."""
    spec = _SPEC_BY_ID[param_id]
    etype = spec.get("expected_type")
    sent = best_sentence(_QUERY_VECS[param_id], (chunk_text or "")[:2000],
                         etype)
    if sent is None:
        return NOT_FOUND
    if etype in ("int", "float"):
        m = _NUM.search(sent)
        return m.group() if m else NOT_FOUND
    if etype == "bool":
        if _BOOL_TRUE.search(sent):
            return "true"
        if _BOOL_FALSE.search(sent):
            return "false"
        return NOT_FOUND
    return sent


def coerce(value: str, etype: str):
    """crif.py:503-530 — the reference's type-coercion of the LLM
    reply: int via int(float(x)) after stripping ',' and ' ', float
    likewise, bool via the lowercase truthy set; coercion failure
    keeps the string (reference logs and keeps it)."""
    try:
        if etype == "int":
            return int(float(value.replace(",", "").replace(" ", ""))), None, None
        if etype == "float":
            return float(value.replace(",", "").replace(" ", "")), None, None
        if etype == "bool":
            return None, value.lower() in ("true", "yes", "1", "y"), None
    except (ValueError, AttributeError):
        pass
    return None, None, value


_FB_SCHEMA = ("doc_id string, param_id string, fb_num double, "
              "fb_bool boolean, fb_str string, fb_type string, "
              "fb_found boolean, score double")


def _answer_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "param_id", "fb_num", "fb_bool",
                               "fb_str", "fb_type", "fb_found")}
        # the retrieval score rides through the answer stage (r6): the
        # old plan joined the answers back to a SECOND evaluation of
        # the whole retr subtree just to reattach `score` — one more
        # shuffle join and a duplicate run of the retrieval UDF
        out["score"] = pdf["score"].tolist()
        for doc_id, pid, content in zip(pdf["doc_id"], pdf["param_id"],
                                        pdf["content"]):
            ans = extractive_answer(pid, content)
            etype = _SPEC_BY_ID[pid].get("expected_type")
            if ans == NOT_FOUND:
                num = b = s = None
                found = False
            else:
                num, b, s = coerce(ans, etype)
                num = float(num) if num is not None else None
                found = True
            out["doc_id"].append(doc_id)
            out["param_id"].append(pid)
            out["fb_num"].append(num)
            out["fb_bool"].append(b)
            out["fb_str"].append(s)
            out["fb_type"].append(
                "str" if s is not None else (etype or "str"))
            out["fb_found"].append(found)
        yield pd.DataFrame(out)


def with_rag_fallback(results: DataFrame, parsed: DataFrame,
                      enabled: bool | None = None) -> DataFrame:
    """Patch `results` rows whose programmatic extraction found a
    chunk but NO value (crif.py:190-206 eligibility: best chunk
    exists, value is None) with the deterministic extractive answer:
    value from the chunk's best sentence, confidence
    0.6 × similarity-boost(score), status 'extracted'.  Rows stay
    untouched when the answerer also fails (reference keeps the
    original failed result) or when the flag is off.

    Plan shape: the eligible slice is typically tiny (a handful of
    (doc, param) misses), so the answer stage is a narrow MapInPandas
    over an exploded retr join keyed (doc_id, param_id); the patch is
    a left join back to `results` — broadcastable whenever the miss
    set is small."""
    if enabled is None:
        enabled = rag_fallback_enabled()
    if not enabled:
        return results
    from ..extract.retrieval import with_retrieval
    from ..extract import sqlexpr as X

    retr = (with_retrieval(parsed)
            .select("doc_id", "tables", "chunks",
                    F.explode("retr").alias("r"))
            .select("doc_id", "r.param_id", "r.ctype", "r.ref_idx",
                    "r.score",
                    F.expr("CASE WHEN r.ctype = 'table' THEN "
                           "try_element_at(filter(tables, "
                           "t -> t.id = r.ref_idx), 1).raw "
                           "ELSE try_element_at(filter(chunks, "
                           "c -> c.chunk_idx = r.ref_idx), 1).text END")
                    .alias("content"))
            .where("score IS NOT NULL"))
    policy_ids = ", ".join(
        f"'{s['param_id']}'" for s in PARAMETER_SPECS
        if s["category"] == "policy")
    # reference eligibility (crif.py:190-206): value is None AND a
    # best chunk exists (the retr semi-join below); policy params
    # never reach the fallback (handled before _extract_with_embeddings)
    eligible = (results
                .where("value_num IS NULL AND value_bool IS NULL "
                       "AND value_str IS NULL")
                .where(f"param_id NOT IN ({policy_ids})")
                .select("doc_id", "param_id"))
    answers = (retr.join(eligible, ["doc_id", "param_id"], "left_semi")
               .mapInPandas(_answer_batches, schema=_FB_SCHEMA)
               .where("fb_found"))
    patch = (answers
             .select("doc_id", "param_id", "fb_num", "fb_bool", "fb_str",
                     "fb_type",
                     F.expr(f"round(0.6d * {X.boost('score')}, 6)")
                     .alias("fb_conf"),
                     F.col("score").alias("fb_sim")))
    joined = results.join(F.broadcast(patch), ["doc_id", "param_id"], "left")
    patched = ("(fb_num IS NOT NULL OR fb_bool IS NOT NULL OR "
               "fb_str IS NOT NULL)")
    return (joined.select(
        "doc_id", "param_id",
        F.expr(f"CASE WHEN {patched} THEN fb_num ELSE value_num END")
        .alias("value_num"),
        F.expr(f"CASE WHEN {patched} THEN fb_bool ELSE value_bool END")
        .alias("value_bool"),
        F.expr(f"CASE WHEN {patched} THEN fb_str ELSE value_str END")
        .alias("value_str"),
        F.expr(f"CASE WHEN {patched} THEN fb_type ELSE value_type END")
        .alias("value_type"),
        "source",
        F.expr(f"CASE WHEN {patched} THEN fb_conf ELSE confidence END")
        .alias("confidence"),
        F.expr(f"CASE WHEN {patched} THEN 'extracted' ELSE status END")
        .alias("status"),
        F.expr(f"CASE WHEN {patched} THEN fb_sim ELSE similarity_score END")
        .alias("similarity_score")))
