"""Round-13 optimization equivalence tests.

Each optimization in this round restructured a plan while claiming the
computed result is IDENTICAL; these tests pin the claims that are not
already covered query-for-query by oracle parity:

- ``discrete_pcts_counted`` (the counted-distribution percentile added
  for low-cardinality value domains) returns exactly what the ranked
  ``discrete_pcts`` formulation returns, on randomized inputs.
- ``growth_accounting``'s collect_set rewrite preserves the NULL-week
  behaviour of the old distinct()-based shape (collect_set drops NULLs;
  the rewrite re-materializes them).
- The sorted-array max-run fold that replaced ``repetition_metrics``'s
  explode+groupBy matches a brute-force multiset count on random
  token arrays.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dataengineering_spark.operators.robust import (
    discrete_pcts,
    discrete_pcts_counted,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_discrete_pcts_counted_matches_ranked(spark):
    """Randomized: per-key discrete percentiles over a low-cardinality
    value domain agree between the counted and ranked formulations
    (the tie column of the ranked form never changes the selected
    VALUE, only which row carries it)."""
    rng = random.Random(1307)
    rows = []
    rid = 0
    for key in ("a", "b", "c"):
        n = rng.randint(1, 400)
        for _ in range(n):
            rows.append((key, rng.randint(0, 25), rid))
            rid += 1
    df = spark.createDataFrame(rows, "k string, v int, tie long")
    pcts = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    names = tuple(f"p{i}" for i in range(len(pcts)))
    ranked = discrete_pcts(df, "k", "v", "tie", pcts, names)
    counted = discrete_pcts_counted(df, "k", "v", pcts, names)
    cols = ["k", *names]
    assert _rows(counted, cols) == _rows(ranked, cols)


def test_discrete_pcts_counted_single_row_groups(spark):
    """n=1 groups: every percentile is the lone value (rank formula
    floor(p*0)+1 = 1)."""
    df = spark.createDataFrame(
        [("a", 7, 0), ("b", 3, 1)], "k string, v int, tie long"
    )
    out = {
        r["k"]: (r["p50"], r["p99"])
        for r in discrete_pcts_counted(
            df, "k", "v", (0.5, 0.99), ("p50", "p99")
        ).collect()
    }
    assert out == {"a": (7, 7), "b": (3, 3)}


def test_discrete_pcts_counted_drops_null_vals(spark):
    """NULL val rows are dropped defensively (ADVICE r13 low): they must
    not inflate _n and shift the selected percentiles."""
    df = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 1), ("a", 3, 2), ("a", None, 3), ("a", None, 4)],
        "k string, v int, tie long",
    )
    out = discrete_pcts_counted(
        df, "k", "v", (0.0, 0.5, 1.0), ("lo", "med", "hi")
    ).collect()[0]
    assert (out["lo"], out["med"], out["hi"]) == (1, 2, 3)


def test_growth_accounting_null_week_rows(spark, tmp_path):
    """The collect_set rewrite re-materializes NULL-week rows: a user
    with null-ts events contributes an all-zero-flag NULL week group
    (exactly what the old distinct()-based shape produced)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from dataengineering_spark.plans.queries_growth import q_growth_accounting

    d = str(tmp_path)
    ts = pa.array(
        [
            datetime(2024, 1, 1, 10),  # u1 week 1
            datetime(2024, 1, 8, 10),  # u1 week 2 (retained)
            None,                      # u1 null week
            None,                      # u2 all-null user...
            None,                      # ...with TWO null-ts events: the
                                       # oracle's DISTINCT dedups to ONE
                                       # (user, NULL) row (ADVICE r13 high)
            datetime(2024, 1, 22, 10), # u3 week 4 (new)
        ],
        type=pa.timestamp("us"),
    )
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "ts": ts,
            "event_type": pa.array(["a"] * 6),
            "value": pa.array([1.0] * 6),
            "props": pa.array(["{}"] * 6),
            "event_id": pa.array([10, 11, 12, 13, 14, 15], type=pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    out = {
        (r["week"].isoformat() if r["week"] is not None else None): (
            r["active"],
            r["new_users"],
            r["retained"],
            r["resurrected"],
            r["churned"],
        )
        for r in q_growth_accounting(spark, d).collect()
    }
    # NULL week: one row per null-week USER (u2's two null events dedup
    # to one row, matching the oracle's DISTINCT), all flags zero
    assert out[None] == (2, 0, 0, 0, 0)
    assert out["2024-01-01"] == (1, 1, 0, 0, 0)
    # week 2: u1 retained; churned = active(w1) - retained(w2) = 0
    assert out["2024-01-08"] == (1, 0, 1, 0, 0)
    assert out["2024-01-22"] == (1, 1, 0, 0, 0)


def test_max_run_fold_matches_bruteforce(spark):
    """The sort_array + aggregate() fold that computes the max 3-gram
    multiplicity in repetition_metrics: on random token arrays the
    fold's (total, distinct, max-run) triple equals brute force."""
    from collections import Counter

    rng = random.Random(42)
    docs = []
    for i in range(60):
        n = rng.randint(0, 30)
        docs.append((i, " ".join(rng.choice("ab cd ef".split()) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from dataengineering_spark.plans.queries_llm import q_repetition_metrics

    # brute force in python over the same normalize/tokenize rules is
    # fragile; instead compare the fold outputs against the OLD
    # explode+groupBy formulation expressed inline.
    w = F.split(F.trim(F.col("text")), " ")
    n_ng = F.greatest(F.size(w) - 2, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(w, 1, n_ng).alias("w1"),
        F.slice(w, 2, n_ng).alias("w2"),
        F.slice(w, 3, n_ng).alias("w3"),
    )
    staged = df.select("doc_id", zipped.alias("_z"))
    old = (
        staged.select("doc_id", F.explode_outer("_z").alias("z"))
        .select(
            "doc_id",
            F.when(
                F.col("z").isNotNull(),
                F.concat_ws(" ", "z.w1", "z.w2", "z.w3"),
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), F.col("c"))).alias("tot"),
            F.count(F.when(F.col("g").isNotNull(), F.lit(1))).alias("_dis"),
            F.max(F.when(F.col("g").isNotNull(), F.col("c"))).alias("mx"),
        )
        # count() yields 0 (not NULL) on empty docs while the query
        # only ever surfaces NULL-guarded ratios; align the comparison
        # on the surfaced convention (NULL when no 3-grams exist)
        .select(
            "doc_id",
            "tot",
            F.when(F.col("tot").isNotNull(), F.col("_dis")).alias("dis"),
            "mx",
        )
    )
    run_best = F.aggregate(
        F.sort_array(F.col("_z")),
        F.struct(
            F.lit(0).alias("best"),
            F.lit(0).alias("run"),
            F.lit(None)
            .cast("struct<w1:string,w2:string,w3:string>")
            .alias("prev"),
        ),
        lambda acc, x: F.struct(
            F.greatest(acc["best"], acc["run"]).alias("best"),
            F.when(acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            x.alias("prev"),
        ),
        lambda acc: F.greatest(acc["best"], acc["run"]),
    )
    new = staged.select(
        "doc_id",
        F.when(F.size("_z") > 0, F.size("_z").cast("long")).alias("tot"),
        F.when(
            F.size("_z") > 0, F.size(F.array_distinct("_z")).cast("long")
        ).alias("dis"),
        F.when(F.size("_z") > 0, run_best.cast("long")).alias("mx"),
    )
    cols = ["doc_id", "tot", "dis", "mx"]
    assert _rows(new, cols) == _rows(old, cols)
