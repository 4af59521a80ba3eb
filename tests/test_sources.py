"""Parameter-sheet scan + spec lookup (S6/J1)."""

from crego_document_extractor_spark import sources


def test_parameter_sheet_and_spec_join(spark, tmp_path):
    p = tmp_path / "params.csv"
    p.write_text(
        "Parameter ID ,PARAMETER NAME,Description\n"
        "bureau_credit_score,CIBIL Score,Credit bureau score\n"
        "bureau_dpd_90,90+ DPD,Count of accounts 90+ days past due\n"
        "unknown_param,Mystery,Not in the spec table\n")
    params = sources.read_parameter_sheet(spark, str(p))
    assert params.columns == ["id", "name", "description"]
    assert params.count() == 3

    joined = {r["param_id"]: r for r in
              sources.params_with_specs(
                  params, sources.specs_dataframe(spark)).collect()}
    assert joined["bureau_credit_score"]["category"] == "direct"
    assert joined["bureau_credit_score"]["spec_status"] == "ok"
    assert joined["bureau_dpd_90"]["category"] == "derived"
    # spec miss → extraction_failed branch (crif.py:56-65)
    assert joined["unknown_param"]["spec_status"] == "extraction_failed"
    assert joined["unknown_param"]["category"] is None


def _write_min_xlsx(path, rows):
    """Hand-built minimal xlsx (inline strings) for the reader test."""
    import zipfile

    def cell(r, c, v):
        col = chr(ord("A") + c)
        return (f'<c r="{col}{r}" t="inlineStr"><is><t>{v}</t></is></c>'
                if v != "" else "")

    sheet_rows = "".join(
        f'<row r="{i + 1}">' +
        "".join(cell(i + 1, j, v) for j, v in enumerate(row)) +
        "</row>" for i, row in enumerate(rows))
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml",
                   f'<workbook {ns} {rns}><sheets>'
                   '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet {ns}><sheetData>{sheet_rows}</sheetData></worksheet>')


def test_parameter_sheet_xlsx_matches_csv(spark, tmp_path):
    """S6: the from-scratch xlsx reader and the CSV path read the same
    sheet identically (sparse cells, mixed header casing, empty pad)."""
    rows = [["Parameter ID", "Parameter Name", "Description"],
            ["bureau_credit_score", "CIBIL Score", "Credit bureau score"],
            ["bureau_dpd_90", "", "Count of accounts 90+ DPD"],
            ["", "", ""]]  # spreadsheet pad row — must be dropped
    xp = tmp_path / "params.xlsx"
    _write_min_xlsx(str(xp), rows)
    cp = tmp_path / "params.csv"
    cp.write_text("\n".join(",".join(r) for r in rows[:-1]) + "\n")

    from_xlsx = sorted(map(tuple, sources.read_parameter_sheet(
        spark, str(xp)).collect()))
    from_csv = sorted(map(tuple, sources.read_parameter_sheet(
        spark, str(cp)).collect()))
    assert from_xlsx == from_csv == [
        ("bureau_credit_score", "CIBIL Score", "Credit bureau score"),
        ("bureau_dpd_90", "", "Count of accounts 90+ DPD")]


def test_reference_fixture_xlsx_parses():
    """The shipped reference parameter workbook (shared strings,
    Google-Sheets padded range) round-trips through read_xlsx_rows and
    matches its own CSV twin row-for-row."""
    import csv
    import os

    path = "/root/reference/Parameter Definition/Bureau parameters - Report.xlsx"
    if not os.path.exists(path):  # fixture optional outside the sandbox
        return
    with open(path, "rb") as f:
        rows = [r[:3] for r in sources.read_xlsx_rows(f.read())
                if any(v != "" for v in r)]
    with open(path.replace(".xlsx", ".xlsx - Sheet1.csv")) as f:
        twin = [r + [""] * (3 - len(r)) for r in csv.reader(f)]
    assert rows == twin
