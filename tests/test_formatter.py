"""S8 sink: reference-shaped nested JSON output."""

import json
import math

from crego_document_extractor_spark import oracle, pipeline


def test_reference_shaped_json(spark, docs_path, expected_rows):
    docs = pipeline.load_documents(spark, docs_path)
    _, results = pipeline.run(docs)
    out = {r["doc_id"]: json.loads(r["json"])
           for r in pipeline.reference_shaped_output(results).collect()}

    crif_doc = next(d for d in out if d.startswith("crif-"))
    gstr_doc = next(d for d in out if d.startswith("gstr-"))

    payload = out[crif_doc]
    # null branches are dropped by to_json: a crif doc has no gst_sales key
    assert set(payload) == {"bureau_parameters", "overall_confidence_score"}
    bp = payload["bureau_parameters"]
    assert len(bp) == 15
    for pid, entry in bp.items():
        assert {"source", "confidence", "status"} <= set(entry)
        exp = expected_rows[(crif_doc, pid)]
        assert math.isclose(entry["confidence"], exp["confidence"],
                            abs_tol=1e-9)
        assert entry["status"] == exp["status"]
        # similarity_score key present iff the oracle has one
        assert (("similarity_score" in entry)
                == (exp["similarity_score"] is not None))

    gp = out[gstr_doc]
    assert set(gp) == {"gst_sales", "overall_confidence_score"}
    sale = gp["gst_sales"][0]
    assert {"month", "source", "confidence", "status"} <= set(sale)
    exp_month = expected_rows[(gstr_doc, "gst_month")]
    assert sale["month"] == exp_month["value_str"]

    # overall = formatter-variant mean (round 3) per doc
    by_doc = {}
    for (d, _), r in expected_rows.items():
        by_doc.setdefault(d, []).append(r)
    for d in (crif_doc, gstr_doc):
        assert math.isclose(out[d]["overall_confidence_score"],
                            oracle.overall_confidence(by_doc[d], "formatter"),
                            abs_tol=1e-9)
