"""Unit tests for profiling (single-pass stats, mergeable histograms)
and corpus rarity operators (oracle parity of their registry queries
is covered by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_profile_columns_is_single_scan(spark):
    from dataengineering_spark.operators.profiling import profile_columns
    from dataengineering_spark.catalog import read_table
    from tests.conftest import SF_ORACLE

    df = read_table(spark, "lineitem", SF_ORACLE)
    prof = profile_columns(df, ["l_quantity", "l_discount", "l_tax"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    # N columns profiled in ONE scan — that is the operator's contract
    assert plan.count("Scan parquet") == 1, plan
    rows = {r["col_name"]: r for r in prof.collect()}
    assert set(rows) == {"l_quantity", "l_discount", "l_tax"}
    assert rows["l_quantity"]["n_rows"] == df.count()
    assert rows["l_quantity"]["n_null"] == 0
    assert rows["l_quantity"]["min_val"] >= 1.0


def test_histogram_merge_equals_direct_and_clamps(spark):
    from dataengineering_spark.operators.profiling import (
        histogram_by,
        merge_histograms,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("shard"),
        (F.col("id") % 130).cast("double").alias("x"),  # values 0..129, hi=100
    )
    direct = {
        r["bin_idx"]: r["n"]
        for r in histogram_by(df, "x", 0.0, 100.0, 10).collect()
    }
    shards = histogram_by(df, "x", 0.0, 100.0, 10, group_cols=["shard"])
    merged = {
        r["bin_idx"]: r["n"] for r in merge_histograms(shards).collect()
    }
    assert merged == direct
    assert sum(direct.values()) == 5000  # clamped, nothing dropped
    # values in [100, 130) all clamp into the top bin
    in_top = sum(1 for i in range(130) if i >= 90) * (5000 // 130) + sum(
        1 for i in range(5000 % 130) if i >= 90
    )
    assert direct[9] == in_top


def test_doc_rarity_blank_and_rare(spark):
    from dataengineering_spark.operators.corpus import doc_rarity

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat"),
            (3, "   "),
            (4, "zyzzyva"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_rarity(docs, rare_threshold=1).collect()}
    assert out[3]["n_tokens"] == 0 and out[3]["mean_token_freq"] is None
    # doc 4 is one hapax token: rare_ratio 1.0, freq 1
    assert out[4]["n_tokens"] == 1 and out[4]["rare_ratio"] == 1.0
    assert out[4]["mean_token_freq"] == 1.0
    # doc 2: "the" occurs 3x in corpus, "cat" 2x -> mean (3+2)/2
    assert out[2]["mean_token_freq"] == 2.5
    assert out[2]["rare_ratio"] == 0.0
    assert out[1]["n_tokens"] == 6 and out[1]["n_distinct"] == 5
