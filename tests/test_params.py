"""Per-parameter equality vs the oracle: value, source, confidence,
status, similarity_score (schemas.py:4-11 / output_formatter.py:17-25
shape)."""

import math

FIELDS = ("value_num", "value_bool", "value_str", "value_type",
          "source", "confidence", "status", "similarity_score")


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=0, abs_tol=1e-12)
    return a == b


def test_same_row_set(expected_rows, pipeline_outputs):
    _, got = pipeline_outputs
    assert set(got) == set(expected_rows)


def test_rows_equal(expected_rows, pipeline_outputs):
    _, got = pipeline_outputs
    bad = []
    for k, e in expected_rows.items():
        g = got[k]
        for f in FIELDS:
            if not _eq(e[f], g[f]):
                bad.append((k, f, e[f], g[f]))
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}"


def test_crif_docs_emit_all_params(expected_rows):
    from crego_document_extractor_spark.specs import PARAM_ORDER
    crif_docs = {d for d, _ in expected_rows if d.startswith("crif-")}
    for d in crif_docs:
        have = {p for dd, p in expected_rows if dd == d}
        assert have == set(PARAM_ORDER)


def test_status_vocabulary(pipeline_outputs):
    _, got = pipeline_outputs
    statuses = {r["status"] for r in got.values()}
    assert statuses <= {"extracted", "not_found", "not_applicable",
                        "extraction_failed"}


def test_overall_confidence_formatter_variant(spark, expected_rows,
                                              pipeline_outputs):
    """A8 — both variants (output_formatter.py:46-70 vs main.py:70-78)."""
    from crego_document_extractor_spark import oracle, pipeline
    from pyspark.sql import Row

    _, got = pipeline_outputs
    results_df = spark.createDataFrame([Row(doc_id=k[0], param_id=k[1], **{
        f: v[f] for f in ("value_num", "value_bool", "value_str", "value_type",
                          "source", "confidence", "status", "similarity_score")
    }) for k, v in got.items()])
    out = {r["doc_id"]: r for r in
           pipeline.formatted_output(results_df).collect()}

    by_doc = {}
    for (d, _), r in expected_rows.items():
        by_doc.setdefault(d, []).append(r)
    for d, rows in by_doc.items():
        assert math.isclose(out[d]["overall_confidence_score"],
                            oracle.overall_confidence(rows, "formatter"),
                            abs_tol=1e-9), d
        assert math.isclose(out[d]["overall_confidence_api"],
                            oracle.overall_confidence(rows, "api"),
                            abs_tol=1e-9), d
