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


def _mini_pdf(pages):
    """Build a minimal PDF: pages = list of content-stream strings."""
    import zlib

    objs = []
    kids = ", ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode())
    for i, content in enumerate(pages):
        objs.append(f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R >>".encode())
        z = zlib.compress(content.encode("latin-1"))
        objs.append(b"<< /Filter /FlateDecode /Length " + str(len(z)).encode()
                    + b" >>\nstream\n" + z + b"\nendstream")
    out = [b"%PDF-1.4"]
    for n, body in enumerate(objs, start=1):
        out.append(f"{n} 0 obj".encode() + b"\n" + body + b"\nendobj")
    out.append(b"%%EOF")
    return b"\n".join(out)


def test_pdf_bytes_to_runs():
    pdf = _mini_pdf([
        "BT /F1 12 Tf 1 0 0 1 50 700 Tm (Title) Tj ET\n"
        "BT 1 0 0 1 10 650 Tm (hello) Tj 200 0 Td ( world) Tj ET\n"
        "BT 1 0 0 1 10 600 Tm [(kerned) -120 ( pair)] TJ ET",
        "BT 1 0 0 1 10 700 Tm (page2 line1) Tj 0 -14 Td (page2 line2) Tj ET",
    ])
    runs = ingest.pdf_text_runs(pdf)
    texts = [(r["page"], r["text"]) for r in runs]
    assert texts == [(1, "Title"), (1, "hello"), (1, " world"),
                     (1, "kerned pair"),
                     (2, "page2 line1"), (2, "page2 line2")]
    # y flipped: reading order = ascending y within a page
    p1 = [r for r in runs if r["page"] == 1]
    assert sorted(p1, key=lambda r: r["y"]) == p1


def test_ingest_pdf_end_to_end(spark):
    """S2 on raw PDF bytes: bytes → runs → y-band merge → spans."""
    pdf = _mini_pdf([
        "BT 1 0 0 1 50 700 Tm (Account Information) Tj ET\n"
        "BT 1 0 0 1 200 699 Tm (Section 1) Tj ET\n"
        "BT 1 0 0 1 10 650 Tm (Current Balance: 1,200) Tj ET",
    ])
    raw = spark.createDataFrame([Row(doc_id="crif-000001",
                                     payload=bytearray(pdf))])
    spans = [s.asDict() for s in
             ingest.ingest_pdf(raw).collect()[0]["spans"]]
    assert [s["text"] for s in spans] == [
        "Account Information Section 1", "Current Balance: 1,200"]
    assert [s["offset"] for s in spans] == [0, 1]


def test_reference_fixture_pdf_extracts_text():
    """Stretch: the from-scratch extractor pulls real text out of a
    shipped reference fixture PDF (FlateDecode, simple fonts)."""
    import glob
    import os

    paths = sorted(glob.glob("/root/reference/GSTR-3B_GST_Return/*.pdf"))
    if not paths:  # fixtures only exist in the sandbox
        return
    with open(paths[0], "rb") as f:
        runs = ingest.pdf_text_runs(f.read())
    blob = " ".join(r["text"] for r in runs)
    assert len(runs) > 20
    assert "GSTR" in blob or "3B" in blob or "tax" in blob.lower()
# will be appended to tests/test_ingest.py
def _objstm_pdf() -> bytes:
    """PDF 1.5-style fixture: catalog/pages/page DICTIONARIES packed in
    a compressed /ObjStm; the content stream stays a classic object."""
    import zlib
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    bodies = b""
    header = []
    for num, b in inner:
        header.append(f"{num} {len(bodies)}".encode())
        bodies += b + b"\n"
    head = b" ".join(header) + b"\n"
    payload = head + bodies
    z = zlib.compress(payload)
    objstm = (b"<< /Type /ObjStm /N 3 /First " + str(len(head)).encode()
              + b" /Filter /FlateDecode /Length " + str(len(z)).encode()
              + b" >>\nstream\n" + z + b"\nendstream")
    content = b"BT 1 0 0 1 50 700 Tm (packed objects work) Tj ET"
    zc = zlib.compress(content)
    cobj = (b"<< /Filter /FlateDecode /Length " + str(len(zc)).encode()
            + b" >>\nstream\n" + zc + b"\nendstream")
    out = [b"%PDF-1.5"]
    for n, body in ((4, objstm), (5, cobj)):
        out.append(f"{n} 0 obj".encode() + b"\n" + body + b"\nendobj")
    out.append(b"%%EOF")
    return b"\n".join(out)


def test_objstm_pdf_extracts_text():
    """PDF 1.5 object streams: page tree dictionaries packed in a
    compressed /ObjStm are expanded and their content extracts."""
    from crego_document_extractor_spark.ingest import pdf_text_runs
    runs = pdf_text_runs(_objstm_pdf())
    assert any("packed objects work" in r["text"] for r in runs)


def test_ingest_pdf_partitioning_invariance(spark):
    """The windowed single-pass reconstruction must give identical
    spans regardless of the input's physical partitioning."""
    raw = spark.createDataFrame(
        [(f"crif-{i:03d}", bytearray(_objstm_pdf() if i % 2 else _mini_pdf([f"BT 1 0 0 1 50 700 Tm (hello {i}) Tj ET"])))
         for i in range(6)], "doc_id string, payload binary")
    a = {r["doc_id"]: [tuple(s) for s in r["spans"]]
         for r in ingest.ingest_pdf(raw.coalesce(1)).collect()}
    b = {r["doc_id"]: [tuple(s) for s in r["spans"]]
         for r in ingest.ingest_pdf(raw.repartition(16)).collect()}
    assert a == b and len(a) == 6


def _image_pdf() -> bytes:
    """One page: a text line plus an Image XObject placed with cm+Do."""
    import zlib
    content = (b"BT 1 0 0 1 50 700 Tm (above the image) Tj ET\n"
               b"q 120 0 0 60 200 600 cm /Im1 Do Q\n"
               b"BT 1 0 0 1 50 500 Tm (below the image) Tj ET")
    z = zlib.compress(content)
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Im1 5 0 R >> >> >>",
            b"<< /Filter /FlateDecode /Length " + str(len(z)).encode()
            + b" >>\nstream\n" + z + b"\nendstream",
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 "
            b">>\nstream\n\x00\x01\x02\x03\nendstream"]
    out = [b"%PDF-1.4"]
    for n, body in enumerate(objs, start=1):
        out.append(f"{n} 0 obj".encode() + b"\n" + body + b"\nendobj")
    out.append(b"%%EOF")
    return b"\n".join(out)


def test_pdf_image_xobject_media_span(spark):
    """An Image XObject placed with cm+Do becomes an ordered 'media'
    span between the surrounding text (north_star: interleaved
    text + media from raw bytes)."""
    raw = spark.createDataFrame(
        [("crif-img", bytearray(_image_pdf()))],
        "doc_id string, payload binary")
    spans = [s.asDict() for s in
             ingest.ingest_pdf(raw).collect()[0]["spans"]]
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text"]
    assert spans[0]["text"] == "above the image"
    assert spans[1]["media_ref"] == "img:5" and spans[1]["text"] == ""
    assert spans[2]["text"] == "below the image"


def test_runs_reconstruction_fuzz(spark):
    """Random (x, y, size) run layouts must reconstruct without errors
    into densely-offset spans with the invariants of the span model
    (non-empty text except media, page-monotonic order)."""
    import random

    rows = []
    for seed in range(4):
        rng = random.Random(seed)
        for i in range(rng.randint(5, 120)):
            page = rng.randint(1, 3)
            sz = rng.choice([4.0, 5.0, 7.0, 9.0])
            txt = " ".join(
                rng.choice(["alpha", "42", "Total:", "9,99,999", "x"])
                for _ in range(rng.randint(1, 4)))
            rows.append((f"fz-{seed}", page, rng.uniform(0, 500),
                         rng.uniform(0, 800),
                         len(txt) * 0.5 * sz, sz, 5.0, txt, None))
    runs = spark.createDataFrame(rows, ingest._RUNS_SCHEMA)
    docs = {r["doc_id"]: [s.asDict() for s in r["spans"]]
            for r in ingest.pdf_runs_to_documents(runs).collect()}
    assert len(docs) == 4
    for spans in docs.values():
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        pages = [int(s["media_ref"].split(":")[1]) for s in spans]
        assert pages == sorted(pages)
        for s in spans:
            assert s["kind"] in ("text", "heading", "table", "media")
            if s["kind"] != "media":
                assert s["text"] != ""


def _length_variant_pdf(length_clause: bytes, extra_objs: list[bytes] = ()):
    """One-page PDF whose content stream declares `length_clause` as
    its /Length entry; extra_objs are appended verbatim (e.g. the
    indirect length object)."""
    import zlib

    content = b"BT 1 0 0 1 50 700 Tm (length probe works) Tj ET"
    z = zlib.compress(content)
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj",
        b"4 0 obj\n<< /Filter /FlateDecode /Length " + length_clause
        + b" >>\nstream\n" + z + b"\nendstream\nendobj",
        *extra_objs,
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF", len(z)


def test_indirect_length_nonzero_generation():
    """ADVICE r4 (medium): '/Length 5 1 R' must resolve the indirect
    ref (any generation), not misparse as direct length 5."""
    import zlib
    content = b"BT 1 0 0 1 50 700 Tm (length probe works) Tj ET"
    zlen = len(zlib.compress(content))
    pdf, _ = _length_variant_pdf(
        b"5 1 R", [b"5 1 obj\n" + str(zlen).encode() + b"\nendobj"])
    runs = ingest.pdf_text_runs(pdf)
    assert [r["text"] for r in runs] == ["length probe works"]


def test_wrong_direct_length_falls_back_to_regex_extent():
    """A corrupt direct /Length that slices un-inflatable bytes must
    fall back to the stream/endstream regex extent."""
    pdf, _ = _length_variant_pdf(b"5")  # 5 bytes of a deflate prefix
    runs = ingest.pdf_text_runs(pdf)
    assert [r["text"] for r in runs] == ["length probe works"]


def test_unresolvable_indirect_length_falls_back():
    """Indirect /Length pointing at a missing object → regex extent."""
    pdf, _ = _length_variant_pdf(b"99 0 R")
    runs = ingest.pdf_text_runs(pdf)
    assert [r["text"] for r in runs] == ["length probe works"]


def test_bt_resets_text_matrix_scale():
    """ADVICE r4 (low): BT resets the text matrix to identity, so a
    Tm vertical scale from one block must not inflate the device-space
    size of a later Td-only-positioned block."""
    pdf = _mini_pdf([
        "BT /F1 12 Tf 2 0 0 2 50 350 Tm (scaled heading) Tj ET\n"
        "BT 50 650 Td (plain body line) Tj ET"
    ])
    runs = {r["text"]: r for r in ingest.pdf_text_runs(pdf)}
    assert runs["scaled heading"]["size"] == 24.0
    assert runs["plain body line"]["size"] == 12.0


def test_split_pages_parity_and_fanout(spark):
    """r4 VERDICT #3: a giant PDF ingested via split_pages=True must
    fan out across many tasks AND produce byte-identical spans vs the
    single-task per-document path."""
    import pyspark.sql.functions as F

    pages = []
    for p in range(300):
        rows = "\n".join(
            f"BT 1 0 0 1 10 {700 - 14 * r} Tm "
            f"(cell{p}a{r})  Tj 120 0 Td (cell{p}b{r}) Tj 120 0 Td "
            f"(cell{p}c{r}) Tj ET"
            for r in range(3))
        pages.append(
            f"BT /F1 12 Tf 2 0 0 2 10 380 Tm (Heading {p}) Tj ET\n"
            f"BT 1 0 0 1 10 730 Tm (Body line on page {p}) Tj ET\n"
            + rows)
    pdf = _mini_pdf(pages)
    raw = spark.createDataFrame(
        [("crif-giant", bytearray(pdf)),
         ("crif-tiny", bytearray(_mini_pdf(["BT 1 0 0 1 10 700 Tm (small doc) Tj ET"])))],
        "doc_id string, payload binary")

    def spans_of(df):
        return {r["doc_id"]: [tuple(s) for s in r["spans"]]
                for r in df.collect()}

    base = spans_of(ingest.ingest_pdf(raw))
    split = spans_of(ingest.ingest_pdf(raw, split_pages=True))
    assert split == base
    assert len(base["crif-giant"]) > 300

    # fan-out: the 300 per-page rows spread across >= 8 tasks
    page_rows = raw.mapInPandas(ingest._pdf_split_batches,
                                schema=ingest._PAGES_SCHEMA)
    n_parts = (page_rows.repartition(64, "doc_id", "page")
               .select(F.spark_partition_id().alias("p"))
               .distinct().count())
    assert page_rows.count() == 301
    assert n_parts >= 8


def _scanned_pdf() -> bytes:
    """Two pages: page 1 has text, page 2 is image-only (scanned)."""
    import zlib
    c1 = zlib.compress(b"BT 1 0 0 1 50 700 Tm (real text page) Tj ET")
    c2 = zlib.compress(b"q 595 0 0 842 0 0 cm /Im1 Do Q")
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Filter /FlateDecode /Length " + str(len(c1)).encode()
            + b" >>\nstream\n" + c1 + b"\nendstream",
            b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
            b"/Resources << /XObject << /Im1 7 0 R >> >> >>",
            b"<< /Filter /FlateDecode /Length " + str(len(c2)).encode()
            + b" >>\nstream\n" + c2 + b"\nendstream",
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 "
            b">>\nstream\n\x00\x01\x02\x03\nendstream"]
    out = [b"%PDF-1.4"]
    for n, body in enumerate(objs, start=1):
        out.append(f"{n} 0 obj".encode() + b"\n" + body + b"\nendobj")
    out.append(b"%%EOF")
    return b"\n".join(out)


def test_scanned_page_needs_ocr_marker(spark):
    """r4 VERDICT #4: an image-only (scanned) page emits its media
    span marked needs_ocr instead of silently contributing nothing;
    pages WITH text keep plain media refs (test above)."""
    raw = spark.createDataFrame(
        [("crif-scan", bytearray(_scanned_pdf()))],
        "doc_id string, payload binary")
    spans = [s.asDict() for s in
             ingest.ingest_pdf(raw).collect()[0]["spans"]]
    assert [s["kind"] for s in spans] == ["text", "media"]
    assert spans[0]["text"] == "real text page"
    assert spans[1]["media_ref"] == "needs_ocr:img:7"
    # mixed page stays unmarked
    raw2 = spark.createDataFrame(
        [("crif-img", bytearray(_image_pdf()))],
        "doc_id string, payload binary")
    spans2 = [s.asDict() for s in
              ingest.ingest_pdf(raw2).collect()[0]["spans"]]
    assert [s["media_ref"] for s in spans2 if s["kind"] == "media"] == ["img:5"]


def test_split_pages_auto_routes_by_size(spark):
    """split_pages='auto': only oversized payloads take the per-page
    plan; the unioned output equals both pure paths."""
    big_pdf = _mini_pdf([f"BT 1 0 0 1 10 {700 - 10 * (r % 60)} Tm "
                         f"(auto page {p} row {r}) Tj ET"
                         for p in range(40) for r in range(1)])
    small_pdf = _mini_pdf(["BT 1 0 0 1 10 700 Tm (small auto doc) Tj ET"])
    raw = spark.createDataFrame(
        [("crif-big", bytearray(big_pdf)), ("crif-small", bytearray(small_pdf))],
        "doc_id string, payload binary")

    def spans_of(df):
        return {r["doc_id"]: [tuple(s) for s in r["spans"]]
                for r in df.collect()}

    base = spans_of(ingest.ingest_pdf(raw))
    # threshold between the two payload sizes -> big goes paged
    thresh = len(small_pdf) + 1
    assert len(big_pdf) > thresh
    auto = spans_of(ingest.ingest_pdf(raw, split_pages="auto",
                                      split_threshold_bytes=thresh))
    assert auto == base
    # threshold above both -> pure single-stage path, same output
    auto_none = spans_of(ingest.ingest_pdf(raw, split_pages="auto",
                                           split_threshold_bytes=10**9))
    assert auto_none == base
