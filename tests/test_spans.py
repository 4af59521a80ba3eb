"""Span-sequence equality — the north_rule correctness invariant:
(kind, text, media_ref, order) per document vs the reference oracle."""


def test_span_sequences_equal(expected_spans, pipeline_outputs):
    got_spans, _ = pipeline_outputs
    assert set(got_spans) == set(expected_spans)
    for doc_id, exp in expected_spans.items():
        assert got_spans[doc_id] == exp, f"span mismatch in {doc_id}"


def test_all_doc_classes_covered(expected_spans):
    kinds = {d.split("-")[0] for d in expected_spans}
    assert kinds == {"crif", "gstr", "html"}


def test_skew_tail_present(expected_spans):
    """The corpus must include heavy-tailed documents (FIXTURES.md §1)."""
    sizes = sorted(len(s) for s in expected_spans.values())
    assert sizes[-1] > 20 * sizes[len(sizes) // 2]


def test_offsets_dense_and_ordered(pipeline_outputs):
    got_spans, _ = pipeline_outputs
    for doc_id, spans in got_spans.items():
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_boilerplate_stripped(pipeline_outputs):
    got_spans, _ = pipeline_outputs
    for spans in got_spans.values():
        for s in spans:
            assert s["kind"] not in ("nav", "footer", "ad")
