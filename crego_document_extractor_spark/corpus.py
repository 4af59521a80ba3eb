"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Emits documents in the BASELINE.json input_hint shape::

    (doc_id: string,
     spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Three document classes (mirroring the reference's fixture corpus —
CRIF bureau reports, GSTR-3B returns, generic pages):

* ``crif-``  (~40%): markdown structure that parser.py:107-124 would
  produce — Verification / Account Summary / Inquiry tables
  (crif_parser.py:35,73,107 signatures) + N '# Account Information i'
  sections with the field lines of crif_parser.py:149-154 and payment
  grades from the crif_models.py:11-32 DPD vocabulary.
* ``gstr-`` (~20%): Month/Year header lines (gstr.py:49-57) + a Table
  3.1 with strong or weak signature (gstr.py:80-90).
* ``html-`` (~40%): interleaved heading/text/media spans plus
  nav/footer/ad boilerplate and link-heavy text spans (the
  boilerplate-strip path).

Everything is seeded — same (seed, n_docs) → byte-identical corpus.
Span counts are heavy-tailed to exercise skew handling.
"""

from __future__ import annotations

import random
from typing import Iterator

ACCOUNT_TYPES = [
    "Personal Loan", "Business Loan", "Auto Loan", "Gold Loan",
    "Housing Loan", "Credit Card", "Secured Credit Card",
    "Unsecured Personal Loan", "Two-Wheeler Loan", "Consumer Loan",
]
REMARKS = [
    "", "", "", "Suit Filed", "Wilful Default", "Settled",
    "Written Off", "Suit Filed and Written Off", "Restructured",
]
STATUSES = ["Active", "Active", "Closed", "Inactive"]
GRADES = ["000", "STD", "030", "060", "090", "SUB", "120", "DBT",
          "150", "LSS", "180", "-", "XXX", "45"]
MONTHS_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
               "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
FULL_MONTHS = ["January", "February", "March", "April", "May", "June",
               "July", "August", "September", "October", "November", "December"]
WORDS = ("data span scan merge query filter credit loan report account value "
         "table row batch stream page block text media summary score amount "
         "balance history overdue active closed secured inquiry purpose").split()


def _amount(rng: random.Random) -> str:
    n = rng.randint(0, 5_000_000) + rng.choice([0.0, 0.5, 0.25])
    style = rng.randrange(4)
    if style == 0:
        return f"₹{n:,.2f}"
    if style == 1:
        return f"Rs {n:,.0f}"
    if style == 2:
        return f"{n:,.2f}"
    return str(int(n))


def _sentence(rng: random.Random, lo: int = 5, hi: int = 18) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


class _Doc:
    def __init__(self) -> None:
        self.spans: list[dict] = []

    def add(self, kind: str, text: str = "", media_ref: str = "") -> None:
        self.spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                           "offset": len(self.spans)})


def _add_boiler(d: _Doc, rng: random.Random) -> None:
    kind = rng.choice(["nav", "footer", "ad", "linky"])
    if kind == "linky":
        # link-dominated text span (stripped by the link-density rule)
        links = rng.randint(2, 6)
        d.add("text", " ".join(f"[{rng.choice(WORDS)}](http://x/{i})"
                               for i in range(links)))
    else:
        d.add(kind, _sentence(rng, 2, 6))


def _table_span(d: _Doc, rng: random.Random, columns: list[str],
                rows: list[list[str]]) -> None:
    lines = [" | ".join(columns)]
    lines += [" | ".join(r) for r in rows]
    d.add("table", "\n".join(lines), f"page:{rng.randint(1, 30)}")


def _gen_crif(rng: random.Random, big: bool) -> list[dict]:
    d = _Doc()
    # tables-only variant (~10%): no text chunks, so retrieval's best
    # candidate is necessarily a table → chunk-aware DIRECT path
    tables_only = not big and rng.random() < 0.1
    if not tables_only:
        if rng.random() < 0.5:
            _add_boiler(d, rng)
        d.add("heading", "CRIF Bureau Report")
        d.add("text", f"Report generated for applicant {rng.randrange(10**6)}")

    # Verification / score table (crif_parser.py:66-87)
    r = rng.random()
    if r < 0.8:
        d.add("heading", "Verification")
        if not tables_only:
            d.add("text", "CIBIL Score: credit bureau score for the consumer, "
                          "range 300 900, requested service CB SCORE")
        rows = []
        if rng.random() < 0.3:
            rows.append(["CONSUMER CHECK", ""])          # falsy score cell
        if rng.random() < 0.2:
            rows.append(["CB SCORE", str(rng.choice([150, 950, 0]))])  # out of range
        rows.append([rng.choice(["CB SCORE", "PERFORM SCORE", "Score Request"]),
                     str(rng.randint(300, 900))])
        cols = ["Requested Service", "Score"]
        if rng.random() < 0.1:
            cols = ["REQUESTED SERVICE", "SCORE"]  # exact-case lookup quirk
        _table_span(d, rng, cols, rows)
    elif r < 0.9:
        # signature matches but no valid score row → falls through to None
        d.add("heading", "Verification")
        _table_span(d, rng, ["Requested Service", "Score"],
                    [["IDENTITY CHECK", ""], ["ADDRESS CHECK", "n/a"]])

    # Account summary table (crif_parser.py:28-46)
    if rng.random() < 0.85:
        d.add("heading", "Account Summary")
        if not tables_only:
            d.add("text", "Max loans summary: number of accounts, max active "
                          "loans, total amount overdue, total written off debt "
                          "amount exposure")
        _table_span(
            d, rng,
            ["Number of Accounts", "Active Accounts", "Total Current Balance",
             "Total Amount Overdue", "Total Writeoff Amt"],
            [[str(rng.randint(0, 80)), str(rng.randint(0, 40)),
              _amount(rng), _amount(rng), _amount(rng)]],
        )

    # Inquiry table (crif_parser.py:100-116)
    ir = rng.random()
    if ir < 0.4:
        d.add("heading", "Inquiries in last 24 months")
        if not tables_only:
            d.add("text", "Credit Inquiries: number of bureau credit inquiries "
                          "(enquiries) recorded")
        n = rng.randint(1, 8)
        _table_span(d, rng, ["Enquiry Purpose", "Date"],
                    [[rng.choice(["Personal Loan", "Auto Loan", "Card"]),
                      f"2024-{rng.randint(1,12):02d}"] for _ in range(n)])
    elif ir < 0.6:
        d.add("heading", "Additional Summary")
        _table_span(d, rng, ["Number of Enquiries", "Window"],
                    [[str(rng.randint(0, 20)), "24m"]])

    # Account sections (crif_parser.py:130-174)
    n_acct = 0 if tables_only else rng.randint(0, 6)
    if big:
        n_acct = rng.randint(200, 800)

    def account_block() -> str:
        lines = [f"Account Number: ACCT{rng.randrange(10**8):08d}"]
        if rng.random() < 0.05:
            pass  # missing Account Type → invalid account (crif_parser.py:161)
        else:
            lines.append(f"Account Type: {rng.choice(ACCOUNT_TYPES)}")
        lines.append(f"Ownership: {rng.choice(['Individual', 'Joint', 'Guarantor'])}")
        lines.append(f"Status: {rng.choice(STATUSES)}")
        lines.append(f"Current Balance: {_amount(rng)}")
        if rng.random() < 0.9:
            lines.append(f"Overdue Amt: {_amount(rng)}")
        lines.append(f"Disbd Amt: {_amount(rng)}")
        months = sorted(rng.sample(range(12), rng.randint(0, 12)))
        if months:
            hist = " ".join(
                f"{MONTHS_ABBR[m]}{rng.choice([': ', ':', ' - ', ' '])}{rng.choice(GRADES)}"
                for m in months)
            lines.append(f"Payment History: {hist}")
        lines.append(f"Account Remarks: {rng.choice(REMARKS)}")
        return "\n".join(lines)

    if n_acct and not big and rng.random() < 0.25:
        # combined section: ONE chunk carrying several 'Account Number:'
        # sub-blocks — exercises the chunk-split flag path (P6,
        # crif.py:395-401) and the reference's first-match field quirk
        # (report-level parse sees one pseudo-account per chunk)
        d.add("heading", f"Account Information 1-{n_acct}")
        d.add("text", "\n".join(account_block() for _ in range(n_acct)))
    else:
        for i in range(n_acct):
            d.add("heading", f"Account Information {i + 1}")
            d.add("text", account_block())
            if rng.random() < 0.15:
                _add_boiler(d, rng)
            if rng.random() < 0.1:
                d.add("media", "", f"img:{rng.randrange(100)}")
    if rng.random() < 0.5:
        _add_boiler(d, rng)
    return d.spans


def _gen_gstr(rng: random.Random) -> list[dict]:
    d = _Doc()
    if rng.random() < 0.4:
        _add_boiler(d, rng)
    d.add("heading", "FORM GSTR-3B")
    hr = rng.random()
    if hr < 0.6:
        month = rng.choice(FULL_MONTHS)
        year = rng.choice([f"{rng.randint(2022, 2025)}",
                           f"{rng.randint(2022, 2025)}-{rng.randint(22, 26)}"])
        d.add("text", f"GSTIN: 06AAICK{rng.randrange(10**4):04d}H1Z8\n"
                      f"Month {rng.choice([': ', '- ', ' '])}{month}\n"
                      f"Year {rng.choice([': ', '- '])}{year}")
    elif hr < 0.85:
        d.add("text", f"GST Return filed for {rng.choice(FULL_MONTHS)} "
                      f"{rng.randint(2022, 2025)}")
    else:
        d.add("text", "GST Return for the registered taxpayer")  # Unknown Month

    d.add("text", _sentence(rng))
    tr = rng.random()
    if tr < 0.6:
        # strong signature (gstr.py:82-87)
        cols = ["Description", "Total Taxable Value", "Integrated Tax",
                "Central Tax", "State/UT Tax", "Cess"]
        rows = [
            ["(a) Outward taxable supplies (other than zero rated)",
             _amount(rng), _amount(rng), _amount(rng), _amount(rng), "0"],
            ["(b) Outward taxable supplies (zero rated)",
             _amount(rng), "0", "0", "0", "0"],
        ]
        if rng.random() < 0.3:
            rows.insert(0, ["Nature of supplies", "", "", "", "", ""])
        d.add("heading", "3.1 Details of Outward Supplies")
        _table_span(d, rng, cols, rows)
    elif tr < 0.8:
        # weak signature: '3.1' + 'outward' in the table text, no tax cols
        cols = ["Particulars", "Amount"]
        rows = [["3.1 Outward taxable supplies", _amount(rng)],
                ["3.2 Inter-state supplies", _amount(rng)]]
        _table_span(d, rng, cols, rows)
    # else: no table → NOT_FOUND path (gstr.py:22-29)
    if rng.random() < 0.4:
        _add_boiler(d, rng)
    return d.spans


def _gen_html(rng: random.Random, n_extra: int) -> list[dict]:
    d = _Doc()
    for _ in range(max(3, n_extra)):
        r = rng.random()
        if r < 0.18:
            d.add("heading", _sentence(rng, 2, 6).title())
        elif r < 0.60:
            d.add("text", _sentence(rng, 8, 40))
        elif r < 0.72:
            d.add("media", "", f"img:{rng.randrange(10**4)}")
        else:
            _add_boiler(d, rng)
    return d.spans


def gen_documents(n_docs: int, seed: int = 42,
                  big_doc_every: int = 97) -> Iterator[dict]:
    """Yield {doc_id, spans} rows; deterministic in (n_docs, seed)."""
    for i in range(n_docs):
        rng = random.Random(seed * 1_000_003 + i)
        cls = i % 10
        if cls < 4:
            big = big_doc_every > 0 and (i % big_doc_every == big_doc_every - 1)
            spans = _gen_crif(rng, big)
            doc_id = f"crif-{i:06d}"
        elif cls < 6:
            spans = _gen_gstr(rng)
            doc_id = f"gstr-{i:06d}"
        else:
            # heavy-tailed span counts for the boilerplate-strip path
            n = int(rng.lognormvariate(2.5, 1.0)) + 3
            if big_doc_every > 0 and i % big_doc_every == big_doc_every - 2:
                n = rng.randint(2_000, 5_000)
            spans = _gen_html(rng, n)
            doc_id = f"html-{i:06d}"
        # occasionally store the array out of offset order (engines must
        # order by `offset`, not by array position)
        if rng.random() < 0.1:
            spans = sorted(spans, key=lambda s: (s["offset"] * 7919) % 104729)
        yield {"doc_id": doc_id, "spans": spans}


def write_corpus(path: str, n_docs: int, seed: int = 42,
                 big_doc_every: int = 97) -> None:
    """Write the corpus as a single parquet file (pyarrow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    schema = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(span_t))])
    rows = list(gen_documents(n_docs, seed, big_doc_every))
    table = pa.Table.from_pylist(rows, schema=schema)
    # small row groups keep single-file corpora splittable across tasks
    pq.write_table(table, path, row_group_size=max(64, n_docs // 128))
