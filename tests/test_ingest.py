"""Raw byte-stream ingestion: HTML tokenizer + PDF text-run merging
(north_star S2 front-ends producing the canonical span model)."""

from pyspark.sql import Row

from crego_document_extractor_spark import ingest, pipeline
from crego_document_extractor_spark import semantics as S

HTML = b"""<html><head><title>t</title>
<script>var x = "<p>not content</p>";</script>
<style>.c { color: red }</style></head>
<body>
<nav><a href="/">home</a> <a href="/x">about</a></nav>
<h1>Main   Title</h1>
<p>First paragraph with <b>bold</b> text.</p>
<div class="ad-banner">Buy stuff now!</div>
<p>See <a href="http://e.com/d">the docs</a> for more.</p>
<img src="http://img/1.png">
<ul><li>alpha</li><li>beta</li></ul>
<footer>contact | legal</footer>
</body></html>"""


def test_tokenize_html_structure():
    spans = ingest.tokenize_html(HTML.decode())
    kinds = [(s["kind"], s["text"][:28], s["media_ref"]) for s in spans]
    # nav subtree → nav kind; script/style content dropped
    assert ("nav", "[home](/) [about](/x)", "") in kinds
    assert ("heading", "Main Title", "") in kinds
    assert ("text", "First paragraph with bold te", "") in kinds
    assert ("ad", "Buy stuff now!", "") in kinds
    assert ("media", "", "http://img/1.png") in kinds
    assert ("text", "alpha", "") in kinds and ("text", "beta", "") in kinds
    assert ("footer", "contact | legal", "") in kinds
    assert all("not content" not in s["text"] for s in spans)
    # anchors render as markdown links → link-density rule applies
    link_span = next(s for s in spans if "the docs" in s["text"])
    assert "[the docs](http://e.com/d)" in link_span["text"]
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_ingest_html_end_to_end(spark):
    raw = spark.createDataFrame([Row(doc_id="html-000001", payload=bytearray(HTML))])
    docs = ingest.ingest_html(raw)
    spans_df, _ = pipeline.run(docs, repartition=False)
    clean = [s.asDict() for s in spans_df.collect()[0]["clean_spans"]]
    kinds = {s["kind"] for s in clean}
    assert kinds <= {"heading", "text", "media"}  # boilerplate stripped
    assert any(s["kind"] == "heading" and s["text"] == "Main Title" for s in clean)
    # parity with the shared boilerplate rule
    exp = S.clean_spans(ingest.tokenize_html(HTML.decode()))
    assert clean == exp


def test_pdf_runs_reading_order(spark):
    rows = [
        # page 2 line (should come after all of page 1)
        Row(doc_id="d1", page=2, x=10.0, y=15.0, text="page2"),
        # page 1, band 1 (y≈14) — two runs out of x order
        Row(doc_id="d1", page=1, x=200.0, y=14.0, text="world"),
        Row(doc_id="d1", page=1, x=10.0, y=15.5, text="hello"),
        # page 1, band 0 (header line)
        Row(doc_id="d1", page=1, x=50.0, y=2.0, text="Title"),
    ]
    docs = ingest.pdf_runs_to_spans(spark.createDataFrame(rows), band_height=12.0)
    spans = [s.asDict() for s in docs.collect()[0]["spans"]]
    assert [s["text"] for s in spans] == ["Title", "hello world", "page2"]
    assert [s["media_ref"] for s in spans] == ["page:1", "page:1", "page:2"]
    assert [s["offset"] for s in spans] == [0, 1, 2]


def test_tokenize_html_anchor_block_and_unclosed():
    # block element inside <a> (legal HTML5): no placeholder leak
    spans = ingest.tokenize_html('<a href="/x"><p>click</p></a>')
    assert [s["text"] for s in spans] == ["[click](/x)"]
    # unclosed anchor at EOF still renders as a link
    spans = ingest.tokenize_html('<p>See <a href="/y">dangling')
    assert [s["text"] for s in spans] == ["See [dangling](/y)"]
    # anchor spanning a block break links both halves to the same href
    spans = ingest.tokenize_html('<a href="/z">one<p>two</p></a>')
    assert [s["text"] for s in spans] == ["[one](/z)", "[two](/z)"]
    # the internal sentinel of the pre-fix implementation never leaks
    assert all("__HREF__" not in s["text"] for s in spans)
