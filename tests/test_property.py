"""Property-based tests (hypothesis): the JVM SQL operators agree with
the pure-Python semantics on adversarial inputs, not just the
generator's vocabulary."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from crego_document_extractor_spark import semantics as S
from crego_document_extractor_spark.extract import sqlexpr as X

# text without the characters the operators treat structurally
_cell = st.text(
    alphabet=st.characters(blacklist_characters="\n|", max_codepoint=0x2BFF),
    max_size=24)
_status = st.one_of(
    st.sampled_from(["000", "STD", "030", "060", "090", "SUB", "120", "DBT",
                     "150", "LSS", "180", "-", "000/STD", "090/sub"]),
    st.text(alphabet="0123456789ABCZxyz-/", max_size=6))
_amount = st.one_of(
    _cell,
    st.sampled_from(["₹1,23,456.78", "Rs 42", "  -3.5", "1e4", "nan?", "",
                     " 7 ", "1_2_3", "9__9"])).filter(
    # Python float() accepts 'inf'/'nan' spellings Spark's cast doesn't;
    # out of scope for currency cells (documented limitation)
    lambda s: s.strip().lower().lstrip("+-") not in
    ("inf", "infinity", "nan"))


def _batch_eval(spark, expr, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["v"] for r in df.select(F.expr(expr).alias("v")).collect()]


@settings(max_examples=6, deadline=None)
@given(st.lists(_status, min_size=1, max_size=40))
def test_dpd_property(spark, statuses):
    got = _batch_eval(spark, X.dpd("s"), statuses)
    assert got == [S.dpd_for_status(v) for v in statuses]


@settings(max_examples=6, deadline=None)
@given(st.lists(_amount, min_size=1, max_size=40))
def test_clean_number_property(spark, values):
    got = _batch_eval(spark, X.clean_number("s"), values)
    exp = [S.clean_number(v) for v in values]
    for g, e in zip(got, exp):
        if e != e:  # NaN
            assert g != g
        else:
            assert g == e


_line = st.text(
    alphabet=st.characters(blacklist_characters="\n", min_codepoint=32,
                           max_codepoint=0x2BFF),
    max_size=30)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(_line, max_size=8), min_size=1, max_size=20))
def test_extract_field_property(spark, docs):
    texts = ["\n".join(lines) for lines in docs]
    for field in ("Account Type", "Overdue Amt"):
        got = _batch_eval(spark, X.extract_field("s", field), texts)
        assert got == [S.extract_field(t, field) for t in texts]
