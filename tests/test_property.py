"""Property-based tests (the reference's randomized-generative test
strategy, ``tests/test_airflow_utils.py:104-151``, re-expressed for
the engine)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataengineering_spark.functions.templating import format_sql_query, render_sql
from dataengineering_spark.functions.utils import column_letter
from dataengineering_spark.operators.setops import union_all

_ident = st.text("abcdefghij", min_size=1, max_size=8)


@settings(deadline=None, max_examples=25, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(st.integers(-1000, 1000), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )
)
def test_union_all_contains_every_input(spark, batches):
    """The reference asserts every .sql file's query appears in the
    UNION ALL output; here: every input frame's rows appear, with
    multiplicity."""
    dfs = [
        spark.createDataFrame([(x,) for x in b], "v int") for b in batches
    ]
    got = sorted(r.v for r in union_all(*dfs).collect())
    want = sorted(x for b in batches for x in b)
    assert got == want


@settings(deadline=None, max_examples=50)
@given(st.dictionaries(_ident, st.integers(0, 10**6), min_size=1, max_size=5))
def test_render_sql_substitutes_all(params):
    template = " + ".join("{{ %s }}" % k for k in params)
    out = render_sql(template, params)
    assert out == " + ".join(str(v) for v in params.values())
    assert "{{" not in out


@settings(deadline=None, max_examples=50)
@given(st.dictionaries(_ident, st.integers(0, 10**6), min_size=1, max_size=5))
def test_format_sql_query_substitutes_all(params):
    template = ", ".join("[[ %s ]]" % k for k in params)
    out = format_sql_query(template, params)
    assert out == ", ".join(str(v) for v in params.values())
    assert "[[" not in out


@settings(deadline=None, max_examples=200)
@given(st.integers(1, 10**4))
def test_column_letter_bijective(i):
    """Round-trip: letters decode back to the index (base-26
    bijective numeration)."""
    s = column_letter(i)
    back = 0
    for ch in s:
        back = back * 26 + (ord(ch) - ord("A") + 1)
    assert back == i
