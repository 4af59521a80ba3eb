"""Focused differential tests for the r6 pure-SQL parse
(`parse_documents_jvm`): every output column must equal the Python
twin (`_parse_batches`, the mapInPandas body the fused stage and the
test oracle still run) value-for-value — including the edge cases the
SQL formulation had to reproduce deliberately (stable offset sort,
CPython whitespace semantics, `strip('# ')` headers, blank table
header lines, empty spans)."""

import pandas as pd
import pytest

from crego_document_extractor_spark import corpus, parse


def _py_rows(docs):
    pdf = pd.DataFrame({"doc_id": [d["doc_id"] for d in docs],
                        "spans": [d["spans"] for d in docs]})
    rows = []
    for out in parse._parse_batches(iter([pdf])):
        rows.extend(out.to_dict("records"))
    return {r["doc_id"]: r for r in rows}


def _jvm_rows(spark, docs):
    sdf = spark.createDataFrame([(d["doc_id"], d["spans"]) for d in docs],
                                parse.DOCUMENTS_SCHEMA)
    return {r["doc_id"]: r for r in parse.parse_documents_jvm(sdf).collect()}


def _assert_equal(got, exp):
    assert set(got) == set(exp)
    for did, e in exp.items():
        g = got[did]
        assert g["doc_kind"] == e["doc_kind"], did
        assert g["n_spans"] == e["n_spans"], did
        g_clean = [{"kind": s["kind"], "text": s["text"],
                    "media_ref": s["media_ref"], "offset": s["offset"]}
                   for s in g["clean_spans"]]
        assert g_clean == e["clean_spans"], did
        assert g["text"] == e["text"], did
        g_tables = [{"id": t["id"], "page": t["page"],
                     "columns": list(t["columns"]),
                     "rows": [list(r) for r in t["rows"]],
                     "raw": t["raw"]} for t in g["tables"]]
        assert g_tables == e["tables"], did
        g_chunks = [{"chunk_idx": c["chunk_idx"], "header": c["header"],
                     "text": c["text"]} for c in g["chunks"]]
        assert g_chunks == e["chunks"], did


def test_jvm_parse_matches_python_on_generated_corpus(spark):
    """300 generator docs incl. the heavy-tail class (big_doc_every)."""
    docs = list(corpus.gen_documents(300, seed=23, big_doc_every=29))
    _assert_equal(_jvm_rows(spark, docs), _py_rows(docs))


def _sp(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": offset}


EDGE_DOCS = [
    # empty spans array
    {"doc_id": "html-e0", "spans": []},
    # duplicate offsets: Python sorted() is stable — the SQL comparator
    # sort must reproduce input order on ties (index tag)
    {"doc_id": "html-e1", "spans": [
        _sp("text", "b-second", offset=1), _sp("text", "a-first", offset=1),
        _sp("heading", "H", offset=0)]},
    # link-density boilerplate with a unicode NBSP separating words:
    # CPython str.split() treats \xa0 as whitespace, regex \s does not
    # — 2 links, 3 words -> words < links*6 -> stripped (both engines)
    {"doc_id": "html-e2", "spans": [
        _sp("text", "[a](x)\xa0[b](y)\xa0c", offset=0),
        _sp("text", "keep me", offset=1)]},
    # heading made only of '#' and spaces: header strip('# ') -> ''
    {"doc_id": "crif-e3", "spans": [
        _sp("heading", "# #", offset=0), _sp("text", "body", offset=1)]},
    # table whose first line is blank -> ([], []) but the table row
    # itself survives with empty columns/rows
    {"doc_id": "crif-e4", "spans": [
        _sp("table", "\nA | B\n1 | 2", media_ref="page:7", offset=0)]},
    # ragged rows: pad and truncate to the column count; cells with
    # surrounding unicode whitespace are python-stripped
    {"doc_id": "crif-e5", "spans": [
        _sp("table", "C1 | C2 | C3\n x  | y\na|b|c|d|e",
            media_ref="not-a-page", offset=0)]},
    # text before any heading -> 'Start' chunk; heading then nothing
    # -> heading-only chunk ('# H\n'.strip() is '#', non-blank)
    {"doc_id": "gstr-e6", "spans": [
        _sp("text", "preamble", offset=0), _sp("heading", "H", offset=1)]},
    # consecutive headings; empty heading text
    {"doc_id": "crif-e7", "spans": [
        _sp("heading", "A", offset=0), _sp("heading", "", offset=1),
        _sp("text", "tail", offset=2)]},
    # whitespace-only text spans: chunk flushing keys on python-strip
    {"doc_id": "html-e8", "spans": [
        _sp("heading", "W", offset=0), _sp("text", " 　 ", offset=1)]},
    # unknown span kind: dropped by render/chunks, kept by clean_spans
    {"doc_id": "other-e9", "spans": [
        _sp("blob", "xx", offset=0), _sp("text", "yy", offset=1)]},
    # media ref page parse: anchored match only
    {"doc_id": "crif-e10", "spans": [
        _sp("table", "A\n1", media_ref="xpage:3", offset=0),
        _sp("table", "A\n1", media_ref="page:12", offset=1)]},
]


def test_jvm_parse_matches_python_on_edge_docs(spark):
    _assert_equal(_jvm_rows(spark, EDGE_DOCS), _py_rows(EDGE_DOCS))


def test_sql_engine_rebuilds_arrow_parse_from_tagged_source(spark):
    """extract_all(engine='sql') swaps an unmodified parse_documents()
    output for the opaque Arrow parse (one materialization instead of
    repeated interpreted evaluation) — and both inputs produce the
    identical result rows."""
    from crego_document_extractor_spark.extract.crif import extract_all

    docs = list(corpus.gen_documents(40, seed=5))
    sdf = spark.createDataFrame([(d["doc_id"], d["spans"]) for d in docs],
                                parse.DOCUMENTS_SCHEMA)
    tagged = parse.parse_documents(sdf)
    assert getattr(tagged, "_plain_parse_docs", None) is sdf
    via_tag = extract_all(tagged, engine="sql")
    assert "MapInPandas" in via_tag._jdf.queryExecution() \
        .executedPlan().toString()
    via_jvm = extract_all(parse.parse_documents_jvm(sdf), engine="sql")
    assert sorted(map(tuple, via_tag.collect())) == \
        sorted(map(tuple, via_jvm.collect()))


@pytest.mark.parametrize("n_parts", [1, 7])
def test_jvm_parse_partition_invariant(spark, n_parts):
    docs = list(corpus.gen_documents(60, seed=9))
    sdf = spark.createDataFrame([(d["doc_id"], d["spans"]) for d in docs],
                                parse.DOCUMENTS_SCHEMA).repartition(n_parts)
    _assert_equal({r["doc_id"]: r
                   for r in parse.parse_documents_jvm(sdf).collect()},
                  _py_rows(docs))
