"""Arrow escape-hatch registry: the grouped-agg pandas UDAF lane."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_grouped_agg_udaf_matches_native(spark):
    """The pandas grouped-agg escape hatch must agree with the native
    aggregate on a reduction both can express (interquartile range
    via pandas quantiles vs percentile_approx is NOT comparable, so
    use a deterministic midrange)."""
    import warnings

    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.functions.udf_registry import grouped_agg_udaf
    from tests.conftest import SF_SMOKE

    ev = read_table(spark, "events", SF_SMOKE).select("event_type", "value")

    def midrange(s):
        return (s.min() + s.max()) / 2.0

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = {
            (r.event_type, r.agg_value)
            for r in grouped_agg_udaf(
                ev, ["event_type"], "value", midrange
            ).collect()
        }
    want = {
        (r.event_type, (r.mn + r.mx) / 2.0)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want
