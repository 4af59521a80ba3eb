"""Targeted coverage of the chunk-aware extraction paths
(crif.py:311-426): crafted documents where retrieval's best chunk is a
table (chunk-aware DIRECT) or the account text chunk (chunk-aware
FLAG), checked Spark-vs-oracle."""

import math

from crego_document_extractor_spark import oracle
from crego_document_extractor_spark.parse import DOCUMENTS_SCHEMA
from crego_document_extractor_spark import pipeline

FIELDS = ("value_num", "value_bool", "value_str", "value_type",
          "source", "confidence", "status", "similarity_score")


def _doc(doc_id, spans):
    return {"doc_id": doc_id,
            "spans": [dict(s, media_ref=s.get("media_ref", ""), offset=i)
                      for i, s in enumerate(spans)]}


DOC_TABLES_ONLY = _doc("crif-900001", [
    {"kind": "table", "text": ("Requested Service | Score\n"
                               "CIBIL credit bureau score range | \n"
                               "CB SCORE | 651"), "media_ref": "page:1"},
    {"kind": "table", "text": ("Number of Accounts | Active Accounts | "
                               "Total Current Balance | Total Amount Overdue | "
                               "Total Writeoff Amt | max loans written off debt amount\n"
                               "7 | 3 | 1000 | 50 | 0 | "), "media_ref": "page:2"},
])

DOC_FLAG_CHUNK = _doc("crif-900002", [
    {"kind": "heading", "text": "Account Information 1"},
    {"kind": "text", "text": ("Account Number: 77\n"
                              "Account Type: Personal Loan suit filed status "
                              "exists indicates whether any\n"
                              "Status: Active\n"
                              "Account Remarks: Suit Filed")},
])


def _run(spark, docs):
    import os
    df = spark.createDataFrame([(d["doc_id"], [tuple(s.values()) for s in
                                               [{"kind": x["kind"], "text": x["text"],
                                                 "media_ref": x["media_ref"],
                                                 "offset": x["offset"]}
                                                for x in d["spans"]]])
                                for d in docs], schema=DOCUMENTS_SCHEMA)
    # pin the RELATIONAL engine: these path tests target the
    # independent SQL implementations (the UDF engine shares the
    # oracle's python semantics by construction and is covered by the
    # engine-parametrized conftest fixture)
    os.environ["SPARK_GRAFT_ENGINE"] = "sql"
    try:
        _, results = pipeline.run(df, repartition=False)
        return {(r["doc_id"], r["param_id"]): r.asDict()
                for r in results.collect()}
    finally:
        os.environ.pop("SPARK_GRAFT_ENGINE", None)


def _expected(docs):
    out = {}
    for d in docs:
        for r in oracle.extract_document(d)["results"]:
            out[(r["doc_id"], r["param_id"])] = r
    return out


def test_chunk_aware_paths_match_oracle(spark):
    docs = [DOC_TABLES_ONLY, DOC_FLAG_CHUNK]
    got, exp = _run(spark, docs), _expected(docs)
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        for f in FIELDS:
            ev, gv = e[f], g[f]
            ok = (math.isclose(ev, gv, abs_tol=1e-12)
                  if isinstance(ev, float) and isinstance(gv, float) else ev == gv)
            assert ok, (k, f, ev, gv)

    # the distinctive paths actually fired (guard against silently
    # regressing into report-level fallbacks)
    score = exp[("crif-900001", "bureau_credit_score")]
    assert score["source"] == "Verification Table (from Table 1)"
    assert math.isclose(score["confidence"], 0.5 * 0.9, abs_tol=1e-12)  # chunk_aware × boost(0.745)
    assert 0.70 <= score["similarity_score"] < 0.85  # the 0.9 tier
    suit = exp[("crif-900002", "bureau_suit_filed")]
    assert suit["source"] == "Account Remarks (1/1 accounts in chunk)"
    assert math.isclose(suit["confidence"], 0.5 * 0.9, abs_tol=1e-12)  # chunk_aware × boost(0.701)
    assert 0.70 <= suit["similarity_score"] < 0.85


def test_duplicate_doc_ids_stay_independent(spark, tmp_path):
    """Two input rows sharing a doc_id are two documents (the reference
    processes one request = one document): extraction must preserve the
    row count and per-row values — no cross-row merging on doc_id
    (regression: the relational account aggregation once keyed on
    doc_id and collapsed colliding rows)."""
    from crego_document_extractor_spark import corpus

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    corpus.write_corpus(p1, 10, seed=7, big_doc_every=0)
    corpus.write_corpus(p2, 10, seed=9, big_doc_every=0)  # same doc_ids
    d1 = pipeline.load_documents(spark, p1)
    d2 = pipeline.load_documents(spark, p2)

    def rows(df):
        return sorted(
            tuple(repr(v) for v in r)
            for r in pipeline.extract_parameters(
                pipeline.parse_documents(df)).collect())

    combined = rows(d1.unionByName(d2))
    separate = sorted(rows(d1) + rows(d2))
    assert combined == separate


def test_fused_extract_equals_unfused(spark):
    """pipeline.extract_from_raw (fused parse+retrieval MapInPandas)
    must be row-for-row identical to the two-stage plan — the r5
    fusion is a physical rewrite only."""
    from crego_document_extractor_spark import corpus, pipeline
    from crego_document_extractor_spark.parse import parse_documents
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "fuse.parquet")
    corpus.write_corpus(path, 120, seed=13, big_doc_every=17)
    docs = spark.read.parquet(path)
    unfused = sorted(map(tuple, pipeline.extract_parameters(
        parse_documents(docs)).collect()))
    fused = sorted(map(tuple, pipeline.extract_from_raw(docs).collect()))
    assert fused == unfused
