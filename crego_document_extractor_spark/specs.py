"""Parameter-spec dimension table (reference
app/models/parameter_specs.py:44-180) — 15 bureau parameters plus the
GSTR outputs.  This is pure dimension data; in Spark it becomes a
broadcast DataFrame (SURVEY.md §2 J1)."""

from __future__ import annotations

# category: direct | flag | derived | policy (parameter_specs.py:14-18)
# expected_type: int | float | bool | null
# validator: None | 'score_range' (300<=v<=900) | 'non_negative' (v>=0)
PARAMETER_SPECS: list[dict] = [
    dict(param_id="bureau_credit_score", name="CIBIL Score",
         description="Credit bureau score (300–900 range)",
         expected_type="int", category="direct", validator="score_range"),
    dict(param_id="bureau_ntc_accepted", name="NTC Accepted",
         description="Whether No-Track-Case (NTC) applicants are acceptable",
         expected_type="bool", category="flag", validator=None),
    dict(param_id="bureau_overdue_threshold", name="Overdue Threshold",
         description="Maximum allowable overdue amount",
         expected_type="null", category="policy", validator=None),
    dict(param_id="bureau_dpd_30", name="30+ DPD",
         description="Count of accounts with 30+ days past due",
         expected_type="int", category="derived", validator="non_negative"),
    dict(param_id="bureau_dpd_60", name="60+ DPD",
         description="Count of accounts with 60+ days past due",
         expected_type="int", category="derived", validator="non_negative"),
    dict(param_id="bureau_dpd_90", name="90+ DPD",
         description="Count of accounts with 90+ days past due",
         expected_type="int", category="derived", validator="non_negative"),
    dict(param_id="bureau_settlement_writeoff", name="Settlement / Write-off",
         description="Presence of settlement or write-off",
         expected_type="bool", category="flag", validator=None),
    dict(param_id="bureau_no_live_pl_bl", name="No Live PL/BL",
         description="Check for no live Personal Loan or Business Loan",
         expected_type="bool", category="derived", validator=None),
    dict(param_id="bureau_suit_filed", name="Suit Filed",
         description="Indicates whether any suit filed status exists",
         expected_type="bool", category="flag", validator=None),
    dict(param_id="bureau_wilful_default", name="Wilful Default",
         description="Indicates wilful default status",
         expected_type="bool", category="flag", validator=None),
    dict(param_id="bureau_written_off_debt_amount", name="Written-off Debt Amount",
         description="Total written-off debt exposure",
         expected_type="float", category="direct", validator="non_negative"),
    dict(param_id="bureau_max_loans", name="Max Loans",
         description="Maximum number of loans in selected months",
         expected_type="int", category="direct", validator="non_negative"),
    dict(param_id="bureau_loan_amount_threshold", name="Loan Amount Threshold",
         description="Maximum cumulative loan amount exposure",
         expected_type="null", category="policy", validator=None),
    dict(param_id="bureau_credit_inquiries", name="Credit Inquiries",
         description="Number of bureau credit inquiries",
         expected_type="int", category="direct", validator="non_negative"),
    dict(param_id="bureau_max_active_loans", name="Max Active Loans",
         description="Maximum active loans",
         expected_type="int", category="direct", validator="non_negative"),
]

PARAM_ORDER: list[str] = [s["param_id"] for s in PARAMETER_SPECS]

SPEC_BY_ID: dict[str, dict] = {s["param_id"]: s for s in PARAMETER_SPECS}


def query_text(spec: dict) -> str:
    """Retrieval query per parameter (crif.py:136)."""
    return f"{spec['name']}: {spec['description']}"
