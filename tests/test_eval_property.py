"""Property tests for the eval tier: ztest_output's z_micro must
equal the IEEE-754 closed form computed in plain Python on any counts
— the engine-portability claim (every op correctly rounded) made
checkable. One 2-row frame per example; examples kept small."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from dataengineering_spark.plans.queries_eval import ztest_output


def _py_z_micro(n_a: int, c_a: int, n_b: int, c_b: int) -> int:
    # same association order as the SQL/Spark expression text
    p_a = c_a / n_a
    p_b = c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt((pooled * (1.0 - pooled)) * (1.0 / n_a + 1.0 / n_b))
    return math.floor((p_a - p_b) / se * 1000000 + 0.5)


@given(
    n_a=st.integers(1, 10_000),
    n_b=st.integers(1, 10_000),
    data=st.data(),
)
@settings(max_examples=15, deadline=None)
def test_z_micro_matches_ieee_closed_form(spark, n_a, n_b, data):
    c_a = data.draw(st.integers(0, n_a))
    c_b = data.draw(st.integers(0, n_b))
    # degenerate pooled rate (0 or 1) → se = 0 → NULL z; skip
    if c_a + c_b == 0 or c_a + c_b == n_a + n_b:
        return
    v = spark.createDataFrame(
        [(0, n_a, c_a), (1, n_b, c_b)], "variant long, n long, c long"
    )
    row = ztest_output(v).collect()[0]
    assert row.n_a == n_a and row.conv_a == c_a
    assert row.n_b == n_b and row.conv_b == c_b
    assert row.z_micro == _py_z_micro(n_a, c_a, n_b, c_b)
