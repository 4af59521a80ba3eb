"""Auxiliary sources (SURVEY.md §2 S6/S7).

* parameter-sheet scan — CSV or .xlsx with normalized headers →
  broadcast dimension joined to the spec table (main.py:94-122 + the
  J1 spec lookup with its extraction_failed miss branch, crif.py:56-65)
* knowledge-base scan — see ops/rag.py
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO

from pyspark.sql import DataFrame, SparkSession, functions as F

from .specs import PARAMETER_SPECS

_SS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column from an A1 cell reference)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def read_xlsx_rows(data: bytes) -> list[list[str]]:
    """Minimal from-scratch .xlsx reader (zip + worksheet XML +
    sharedStrings), stdlib only — the subset ``pd.read_excel`` covers
    for the reference's parameter sheet (main.py:100-103).  Returns
    the FIRST worksheet as rows of strings; sparse cells come back as
    ''."""
    zf = zipfile.ZipFile(BytesIO(data))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    first = wb.find(f"{_SS}sheets/{_SS}sheet")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target = next(r.get("Target") for r in rels
                  if r.get("Id") == first.get(_RID))
    sheet_path = target if target.startswith("xl/") else "xl/" + target.lstrip("/")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = ["".join(t.text or "" for t in si.iter(f"{_SS}t"))
                  for si in ss.findall(f"{_SS}si")]

    rows: list[list[str]] = []
    for row in ET.fromstring(zf.read(sheet_path)).iter(f"{_SS}row"):
        cells: list[str] = []
        for c in row.findall(f"{_SS}c"):
            idx = _col_index(c.get("r", ""))
            if idx < 0:
                idx = len(cells)
            while len(cells) <= idx:
                cells.append("")
            ctype = c.get("t", "n")
            v = c.find(f"{_SS}v")
            if ctype == "s" and v is not None and v.text is not None:
                cells[idx] = shared[int(v.text)]
            elif ctype == "inlineStr":
                is_el = c.find(f"{_SS}is")
                if is_el is not None:
                    cells[idx] = "".join(t.text or ""
                                         for t in is_el.iter(f"{_SS}t"))
            elif v is not None and v.text is not None:
                cells[idx] = v.text
        rows.append(cells)
    return rows


def read_parameter_sheet(spark: SparkSession, path: str) -> DataFrame:
    """Parameter-sheet scan with the reference's header normalization
    (main.py:106: lower().strip()); expects columns 'Parameter ID',
    'Parameter Name', 'Description' in any casing.  Accepts both the
    CSV twin and the shipped .xlsx (from-scratch stdlib reader above).
    A parameter sheet is a tiny dimension (dozens of rows): the xlsx
    form is parsed driver-side and broadcast at join time — never a
    distributed scan."""
    if path.lower().endswith((".xlsx", ".xlsm")):
        with open(path, "rb") as f:
            rows = read_xlsx_rows(f.read())
        header = [h.lower().strip() for h in rows[0]] if rows else []
        recs = []
        for r in rows[1:]:
            rec = dict(zip(header, r))
            recs.append((rec.get("parameter id", "") or "",
                         rec.get("parameter name", "") or "",
                         rec.get("description", "") or ""))
        # spreadsheet exports pad the used range with empty rows; drop
        # fully-empty records so the xlsx and its CSV twin read alike
        recs = [r for r in recs if any(r)]
        return spark.createDataFrame(
            recs, "id string, name string, description string")
    df = spark.read.option("header", True).csv(path)
    renames = {c: c.lower().strip() for c in df.columns}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df.select(
        F.coalesce(F.col("`parameter id`"), F.lit("")).alias("id"),
        F.coalesce(F.col("`parameter name`"), F.lit("")).alias("name"),
        F.coalesce(F.col("`description`"), F.lit("")).alias("description"))


def specs_dataframe(spark: SparkSession) -> DataFrame:
    """The PARAMETER_SPECS dimension (parameter_specs.py:44-180) as a
    broadcastable DataFrame."""
    return spark.createDataFrame(
        PARAMETER_SPECS,
        schema=("param_id string, name string, description string, "
                "expected_type string, category string, validator string"))


def params_with_specs(params: DataFrame, specs: DataFrame) -> DataFrame:
    """J1 — broadcast LEFT join; a missing spec marks the parameter
    extraction_failed (crif.py:56-65)."""
    joined = params.join(F.broadcast(specs),
                         params["id"] == specs["param_id"], "left")
    return joined.select(
        params["id"].alias("param_id"),
        params["name"], params["description"],
        specs["category"], specs["expected_type"], specs["validator"],
        F.when(specs["param_id"].isNull(), F.lit("extraction_failed"))
        .otherwise(F.lit("ok")).alias("spec_status"))
