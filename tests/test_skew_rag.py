"""Salted aggregation correctness + RAG knowledge-base retrieval."""

import numpy as np

from crego_document_extractor_spark import semantics as S
from crego_document_extractor_spark import pipeline
from crego_document_extractor_spark.ops import rag, skew


def test_salted_equals_unsalted(spark, docs_path):
    docs = pipeline.load_documents(spark, docs_path)
    a = {r["doc_id"]: (r["n_spans"], r["n_chars"], r["n_media"])
         for r in skew.salted_span_stats(docs, n_salts=8).collect()}
    b = {r["doc_id"]: (r["n_spans"], r["n_chars"], r["n_media"])
         for r in skew.unsalted_span_stats(docs).collect()}
    assert a == b


def test_salted_topk_tokens(spark, docs_path):
    docs = pipeline.load_documents(spark, docs_path)
    top = skew.salted_topk_tokens(docs, k=5).collect()
    assert len(top) == 5
    assert top[0]["n"] >= top[-1]["n"]


KB = """# Title
intro text ignored? no — it lands in the '' section

## Credit Scores
### Ranges
Scores run 300-900; CB SCORE rows carry the bureau score value.

### Usage
Use the Verification table's Score column.

## Payment History
DPD grades: 000/STD current, 030/060/090 deltas, 150/LSS/180 worst.
"""


def test_kb_chunker_reference_semantics():
    chunks = rag.parse_knowledge_base(KB)
    titles = [c["title"] for c in chunks]
    assert titles[0] == ""  # preamble chunk: empty section (rag_service.py:66)
    assert "Credit Scores - Ranges" in titles
    assert "Credit Scores - Usage" in titles
    assert "Payment History" in titles
    by_title = {c["title"]: c for c in chunks}
    assert "300-900" in by_title["Credit Scores - Ranges"]["text"]


def test_kb_retrieval_context(spark):
    kb = rag.kb_dataframe(spark, KB)
    qtext = "CIBIL Score: Credit bureau score (300–900 range)"
    queries = spark.createDataFrame(
        [{"query_id": "bureau_credit_score", "query_text": qtext,
          "query_vec": [float(x) for x in S.embed(qtext)]}])
    out = rag.retrieve_context(queries, kb, top_k=2, threshold=0.0).collect()
    assert len(out) == 1
    ctx = out[0]["context"]
    assert ctx.startswith("Domain Knowledge Context:")
    assert "(similarity: " in ctx
    assert out[0]["n_chunks"] <= 2

    # threshold filters everything → no context row (rag_service.py:197-198)
    out2 = rag.retrieve_context(queries, kb, top_k=2, threshold=0.99).collect()
    assert out2 == []
