"""Raw byte-stream ingestion → span model (north_star S2).

Two from-scratch ingestion fronts produce the engine's canonical
``documents(doc_id, spans)`` form:

* ``tokenize_html`` — a lightweight HTML tokenizer + block builder:
  tag-class stoplists map <nav>/<footer>/<aside>/ad-classed blocks to
  boilerplate kinds, <h1>-<h6> to heading spans, <img> to media spans,
  and anchors render as markdown links so the downstream link-density
  rule (semantics.is_boilerplate) sees them.  No external parser.
* ``pdf_runs_to_spans`` — PDF text-run merging: runs carrying
  (page, x, y) coordinates are grouped into y-coordinate bands and
  sorted into reading order (page, band, x) — pure relational Spark
  (groupBy + sort_array + window), no UDF.

Both run Arrow-batched / JVM-side; nothing is per-row Python.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .parse import DOCUMENTS_SCHEMA

# ---------------------------------------------------------------------------
# HTML tokenizer (pure function, shared with tests/oracle use)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"<[^>]+>|[^<]+", re.S)
_TAG = re.compile(r"<\s*(/?)\s*([a-zA-Z0-9]+)([^>]*)>", re.S)
_ATTR = re.compile(r"""([a-zA-Z-]+)\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""")
_WS_RUN = re.compile(r"\s+")

#: container tags whose subtree is boilerplate (tag stoplist)
_BOILER_TAGS = {"nav": "nav", "footer": "footer", "aside": "ad"}
#: class/id substrings marking ad/boilerplate containers
_AD_MARKERS = ("ad", "ads", "advert", "banner", "sponsor", "promo")
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_SKIP_CONTENT = {"script", "style", "noscript", "template", "title"}
_BLOCK_BREAK = {"p", "div", "li", "section", "article", "table", "tr",
                "br", "ul", "ol", "main", "body", "header"} | _HEADINGS


def _attrs(raw: str) -> dict:
    return {k.lower(): v.strip("\"'") for k, v in _ATTR.findall(raw)}


def _is_ad_class(attrs: dict) -> bool:
    blob = (attrs.get("class", "") + " " + attrs.get("id", "")).lower()
    toks = re.split(r"[\s_-]+", blob)
    return any(t in _AD_MARKERS for t in toks)


def tokenize_html(html: str) -> list[dict]:
    """HTML → ordered spans (kind, text, media_ref, offset)."""
    spans: list[dict] = []
    boiler_stack: list[tuple[str, str]] = []  # (opening tag, kind)
    anchor_stack: list[tuple[str, int]] = []  # (href, buf pos at <a>)
    skip_depth = 0                 # inside script/style/title
    buf: list[str] = []

    def cur_kind(default: str) -> str:
        return boiler_stack[-1][1] if boiler_stack else default

    def wrap_anchor(href: str, pos: int) -> None:
        # wrap buf[pos:] as a markdown link; empty inner text → no link
        if any(t.strip() for t in buf[pos:]):
            buf.insert(pos, "[")
            buf.append(f"]({href})")

    def flush() -> None:
        # anchors still open at a block boundary close here (their
        # remaining inner text re-links after the flush) — no sentinel
        # strings ever enter the emitted text
        for j in range(len(anchor_stack) - 1, -1, -1):
            href, pos = anchor_stack[j]
            wrap_anchor(href, pos)
            anchor_stack[j] = (href, 0)
        text = _WS_RUN.sub(" ", " ".join(buf)).strip()
        buf.clear()
        if not text:
            return
        spans.append({"kind": cur_kind("text"), "text": text,
                      "media_ref": "", "offset": len(spans)})

    def add(kind: str, text: str, media_ref: str = "") -> None:
        flush()
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    i = 0
    tokens = _TOKEN.findall(html)
    while i < len(tokens):
        tok = tokens[i]
        i += 1
        if not tok.startswith("<"):
            if skip_depth == 0:
                buf.append(tok)
            continue
        m = _TAG.match(tok)
        if not m:
            continue
        closing, tag, rawattrs = m.group(1) == "/", m.group(2).lower(), m.group(3)
        if tag in _SKIP_CONTENT:
            skip_depth = max(0, skip_depth - 1) if closing else skip_depth + 1
            continue
        if skip_depth:
            continue
        attrs = {} if closing else _attrs(rawattrs)
        if closing and boiler_stack and boiler_stack[-1][0] == tag:
            flush()
            boiler_stack.pop()
            continue
        if tag in _HEADINGS and not closing:
            # collect heading inner text up to the closing tag
            inner: list[str] = []
            while i < len(tokens):
                t2 = tokens[i]
                i += 1
                if t2.startswith("<"):
                    m2 = _TAG.match(t2)
                    if m2 and m2.group(1) == "/" and m2.group(2).lower() == tag:
                        break
                    continue
                inner.append(t2)
            add(cur_kind("heading"), _WS_RUN.sub(" ", " ".join(inner)).strip())
        elif tag == "img":
            add(cur_kind("media"), "", attrs.get("src", ""))
        elif tag == "a" and not closing:
            # record the href + current buffer position; the link is
            # rendered as markdown when the anchor closes (or at the
            # next block flush)
            anchor_stack.append((attrs.get("href", ""), len(buf)))
        elif tag == "a" and closing:
            if anchor_stack:
                href, pos = anchor_stack.pop()
                wrap_anchor(href, pos)
        elif not closing and (tag in _BOILER_TAGS or _is_ad_class(attrs)):
            flush()
            boiler_stack.append((tag, _BOILER_TAGS.get(tag, "ad")))
        elif tag in _BLOCK_BREAK:
            flush()
        # inline tags (span, b, i, ...) accumulate into the buffer
    flush()
    # markdown-link cleanup inside span text: "[ text ](url)" → "[text](url)"
    for s in spans:
        s["text"] = re.sub(r"\[\s+", "[", re.sub(r"\s+\]", "]", s["text"]))
    return spans


def _html_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"doc_id": [], "spans": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            html = bytes(payload).decode("utf-8", errors="replace")
            out["doc_id"].append(doc_id)
            out["spans"].append(tokenize_html(html))
        yield pd.DataFrame(out)


def ingest_html(raw: DataFrame) -> DataFrame:
    """raw(doc_id string, payload binary) → documents(doc_id, spans)."""
    return raw.select("doc_id", "payload").mapInPandas(
        _html_batches, schema=DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# PDF text runs → spans (pure relational, no UDF)
# ---------------------------------------------------------------------------

def pdf_runs_to_spans(runs: DataFrame, band_height: float = 12.0) -> DataFrame:
    """runs(doc_id, page int, x double, y double, text string) →
    documents(doc_id, spans): y-coordinate banding + reading-order sort
    (page asc, band asc, x asc), one text span per band, page
    provenance as the media_ref of a leading media span per page."""
    banded = runs.withColumn(
        "band", F.floor(F.col("y") / F.lit(band_height)).cast("int"))
    lines = (banded.groupBy("doc_id", "page", "band")
             .agg(F.array_join(
                 F.expr("transform(array_sort(collect_list("
                        "named_struct('x', x, 't', text))), r -> r.t)"),
                 " ").alias("line_text")))
    w = Window.partitionBy("doc_id").orderBy("page", "band")
    ordered = lines.withColumn("pos", F.row_number().over(w) - 1)
    return (ordered.groupBy("doc_id")
            .agg(F.expr(
                "transform(array_sort(collect_list(named_struct("
                "'pos', pos, 'page', page, 'line_text', line_text))), "
                "(r, i) -> named_struct("
                "'kind', 'text', 'text', r.line_text, "
                "'media_ref', concat('page:', cast(r.page AS string)), "
                "'offset', i))").alias("spans")))
