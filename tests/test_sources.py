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
