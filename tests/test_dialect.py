"""ClickHouse→Spark dialect shim: the reference's own query shapes
(``clickhouse/utils.py``, ``airflow/bitquery.py``,
``coinprice/*.py``) must execute unchanged through the translator."""

from __future__ import annotations

import pandas as pd
import pytest

from dataengineering_spark.functions.dialect import (
    run_clickhouse_sql,
    translate_clickhouse_sql,
)


@pytest.fixture(scope="module")
def master_view(spark):
    pdf = pd.DataFrame(
        {
            "block": ["17", "42", "9"],
            "block_num": [17, 42, 9],
            "block_date_time": pd.to_datetime(
                ["2024-01-03 05:00:00", "2024-01-05 23:59:00", "2024-01-01 00:00:00"]
            ),
            "symbol": ["eth", "btc", "eth"],
            "value": [10.0, 20.0, 30.0],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("ch_master")
    return pdf


def test_reference_head_probe_shape(spark, master_view):
    # clickhouse/utils.py: SELECT toDate(max(block_date_time)) as
    # block_date, max(block) as block from {chain}.master
    out = run_clickhouse_sql(
        spark,
        "SELECT toDate(max(block_date_time)) as block_date,"
        " max(block_num) as block from ch_master",
    ).collect()[0]
    assert str(out["block_date"]) == "2024-01-05"
    assert out["block"] == 42


def test_reference_ripple_uint_cast(spark, master_view):
    # clickhouse/utils.py: SELECT max(toUInt64(block)) as block ...
    out = run_clickhouse_sql(
        spark, "SELECT max(toUInt64(block)) as block from ch_master"
    ).collect()[0]
    assert out["block"] == 42


def test_format_clause_stripped():
    t = translate_clickhouse_sql(
        "select symbol,address from tokens_metadata FORMAT JSON"
    )
    assert t.format == "JSON"
    assert "FORMAT" not in t.sql
    t2 = translate_clickhouse_sql(
        "select distinct(symbol) as symbol from m FORMAT JSONCompactStrings"
    )
    assert t2.format == "JSONCompactStrings"


def test_conditional_aggregates(spark, master_view):
    out = run_clickhouse_sql(
        spark,
        "SELECT countIf(symbol = 'eth') AS c,"
        " sumIf(value, symbol = 'eth') AS s,"
        " uniqExact(symbol) AS u"
        " FROM ch_master",
    ).collect()[0]
    assert (out["c"], out["s"], out["u"]) == (2, 40.0, 2)


def test_multi_if_nesting(spark, master_view):
    rows = run_clickhouse_sql(
        spark,
        "SELECT block_num, multiIf(block_num > 40, 'big',"
        " block_num > 10, 'mid', 'small') AS bucket FROM ch_master",
    ).collect()
    got = {r["block_num"]: r["bucket"] for r in rows}
    assert got == {42: "big", 17: "mid", 9: "small"}


def test_trunc_and_clock_functions(spark, master_view):
    out = run_clickhouse_sql(
        spark,
        "SELECT toStartOfDay(max(block_date_time)) AS d,"
        " today() <= toDate(now()) AS ok FROM ch_master",
    ).collect()[0]
    assert str(out["d"]).startswith("2024-01-05 00:00:00")
    assert out["ok"] is True


def test_literals_are_left_alone():
    t = translate_clickhouse_sql(
        "SELECT * FROM t WHERE name = 'toDate(x)' AND d >= toDate('2024-01-01')"
    )
    assert "'toDate(x)'" in t.sql
    assert "to_date('2024-01-01')" in t.sql


def test_replace_regexp_one_first_occurrence(spark):
    """replaceRegexpOne must replace only the FIRST match — a bare
    regexp_replace rename would hit all of them."""
    got = run_clickhouse_sql(
        spark,
        r"SELECT replaceRegexpOne('a1b2c3', '\\d', 'X') AS one,"
        r" replaceRegexpOne('no digits', '\\d', 'X') AS none,"
        r" replaceRegexpOne('a1b2', 'q+', 'X') AS miss",
    ).collect()[0]
    assert got.one == "aXb2c3"
    assert got.none == "no digits"
    assert got.miss == "a1b2"


def test_replace_regexp_one_hedera_shape(spark, tmp_path):
    """The reference's Hedera block parse (clickhouse/utils.py:57-59):
    strip the shard.realm.num- prefix off transaction_id, then swap the
    remaining '-' for '.' — routed through run_sql_file's clickhouse
    dialect like a reference SQL file would be."""
    from dataengineering_spark.sources.io import run_sql_file

    spark.createDataFrame(
        [
            ("0.0.48-1700000000-123456789", "2024-01-02 03:04:05"),
            ("0.0.7-1699999999-000000001", "2024-01-01 00:00:00"),
        ],
        "transaction_id string, block_date_time string",
    ).createOrReplaceTempView("hedera_master")
    p = tmp_path / "hedera.sql"
    p.write_text(
        r"SELECT replace(replaceRegexpOne(transaction_id,"
        r" '\\d+\\.\\d+\\.\\d+-', ''), '-', '.') as block"
        r" FROM hedera_master WHERE block_date_time >= toDate('2024-01-01')"
        r" order by block desc limit 1 FORMAT JSON;"
    )
    [df] = run_sql_file(spark, str(p), dialect="clickhouse")
    assert df.collect()[0].block == "1700000000.123456789"


def test_replace_regexp_one_backref_raises():
    with pytest.raises(ValueError, match="replaceRegexpOne"):
        translate_clickhouse_sql(
            r"SELECT replaceRegexpOne(x, '(\d)-', '\\1') FROM t"
        )
    with pytest.raises(ValueError, match="replaceRegexpOne"):
        translate_clickhouse_sql(
            "SELECT replaceRegexpOne(x, 'a', other_col) FROM t"
        )


def test_unsupported_raises_with_pointer():
    # multiple arrayJoins = ClickHouse cartesian semantics: still raises
    with pytest.raises(ValueError, match="arrayJoin"):
        translate_clickhouse_sql("SELECT arrayJoin(xs), arrayJoin(ys) FROM t")
    with pytest.raises(ValueError, match="arrayJoin"):
        translate_clickhouse_sql(
            "SELECT * FROM (SELECT arrayJoin(xs) FROM t)"
        )


def test_sql_file_clickhouse_dialect(spark, master_view, tmp_path):
    p = tmp_path / "probe.sql"
    p.write_text(
        "SELECT toDate(max(block_date_time)) as block_date from ch_master;\n"
        "SELECT max(toUInt64(block)) as block from ch_master;\n"
    )
    from dataengineering_spark.sources.io import run_sql_file

    r = run_sql_file(spark, str(p), dialect="clickhouse")
    assert len(r) == 2
    assert str(r[0].collect()[0]["block_date"]) == "2024-01-05"
    assert r[1].collect()[0]["block"] == 42


# --- round-6 additions: ADVICE fixes + arrayJoin clause rewrite ------------


def test_to_start_of_week_is_sunday_start(spark):
    # ClickHouse toStartOfWeek mode 0: Sunday-first.  2024-01-07 is a
    # Sunday and must map to ITSELF, not to Monday 2024-01-01 or -08.
    out = run_clickhouse_sql(
        spark,
        "SELECT toStartOfWeek(toDate('2024-01-07')) AS sun,"
        " toStartOfWeek(toDate('2024-01-06')) AS sat,"
        " toStartOfWeek(toDate('2024-01-08')) AS mon",
    ).collect()[0]
    assert str(out["sun"]) == "2024-01-07"  # Sunday starts its own week
    assert str(out["sat"]) == "2023-12-31"  # Saturday belongs to prior Sunday
    assert str(out["mon"]) == "2024-01-07"  # Monday follows its Sunday


def test_to_start_of_week_mode_arg(spark):
    # explicit mode 0 is the same Sunday-start translation; any other
    # mode must raise (a blind 1-arg rewrite would fold the mode into
    # to_date()'s format argument → invalid Spark SQL, ADVICE r6)
    out = run_clickhouse_sql(
        spark,
        "SELECT toStartOfWeek(toDate('2024-01-07'), 0) AS sun",
    ).collect()[0]
    assert str(out["sun"]) == "2024-01-07"
    with pytest.raises(ValueError, match="toStartOfWeek mode"):
        translate_clickhouse_sql(
            "SELECT toStartOfWeek(toDate('2024-01-07'), 1) AS monday_mode"
        )


def test_nested_same_name_calls_converge(spark):
    # One-pass rewriters leave the inner call untranslated (undefined
    # function at spark.sql) — the fixpoint loop must convert both.
    t = translate_clickhouse_sql("SELECT toUInt64(coalesce(toUInt64(x), 0)) AS v FROM t")
    assert "toUInt64" not in t.sql
    assert t.sql.count("CAST") == 2
    t2 = translate_clickhouse_sql(
        "SELECT multiIf(a, multiIf(b, 1, 2), 3) AS v FROM t"
    )
    assert "multiIf" not in t2.sql


def test_uniq_multi_arg_counts_tuples(spark, master_view):
    # uniq(a, b) estimates distinct PAIRS; a blind rename would feed b
    # to approx_count_distinct as the rsd parameter.
    out = run_clickhouse_sql(
        spark, "SELECT uniq(symbol, block) AS u FROM ch_master"
    ).collect()[0]
    assert out["u"] == 3  # 3 distinct (symbol, block) pairs
    t = translate_clickhouse_sql("SELECT uniq(a, b) FROM t")
    assert "struct(a, b)" in t.sql


def test_array_join_lateral_view(spark):
    spark.sql(
        "SELECT * FROM VALUES (1, array(10, 20)), (2, array(30)) AS t(id, xs)"
    ).createOrReplaceTempView("aj_t")
    rows = run_clickhouse_sql(
        spark,
        "SELECT id, arrayJoin(xs) AS x FROM aj_t WHERE id >= 1 ORDER BY id, x",
    ).collect()
    assert [(r["id"], r["x"]) for r in rows] == [(1, 10), (1, 20), (2, 30)]
    # bare form gets a generated alias
    rows2 = run_clickhouse_sql(
        spark, "SELECT arrayJoin(xs) FROM aj_t ORDER BY aj"
    ).collect()
    assert [r["aj"] for r in rows2] == [10, 20, 30]


def test_array_join_through_sql_file_oracle(spark, duck, tmp_path):
    # oracle-checked route: same exploded aggregation in DuckDB UNNEST
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "toks": [["a", "b"], ["b"], ["a", "b", "c"]]}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("aj_docs")
    p = tmp_path / "aj.sql"
    p.write_text(
        "SELECT tok, count(*) AS n FROM aj_docs"
        " LATERAL VIEW explode(toks) _x AS tok GROUP BY tok;\n"
        "SELECT arrayJoin(toks) AS tok FROM aj_docs;\n"
    )
    from dataengineering_spark.sources.io import run_sql_file

    r = run_sql_file(spark, str(p), dialect="clickhouse")
    got = sorted((row["tok"], row["n"]) for row in r[0].collect())
    want = duck.sql(
        "SELECT tok, count(*) FROM (SELECT UNNEST(toks) AS tok FROM "
        "(VALUES (['a','b']), (['b']), (['a','b','c'])) d(toks)) "
        "GROUP BY tok ORDER BY tok"
    ).fetchall()
    assert got == [(t, n) for t, n in want]
    assert sorted(row["tok"] for row in r[1].collect()) == [
        "a", "a", "b", "b", "b", "c",
    ]


def test_translator_fuzz_no_clickhouse_names_survive(spark):
    """Property: for any nesting of supported ClickHouse constructs,
    translation leaves no ClickHouse function name behind and the
    result parses in Spark (round-6 fixpoint hardening)."""
    from hypothesis import given, settings, strategies as st

    leaves = st.sampled_from(["x", "y", "0", "1.5", "'lit'"])

    def wrap(inner):
        return st.sampled_from([
            "toUInt64({0})", "toInt32({0})", "toDate({0})", "toString({0})",
            "toFloat64({0})", "ifNull({0}, 0)", "assumeNotNull({0})",
            "lowerUTF8({0})", "toStartOfDay({0})", "toStartOfWeek({0})",
            "toStartOfMonth({0})", "multiIf(x > 0, {0}, {0})",
        ]).map(lambda t: t.format(inner))

    exprs = st.recursive(leaves, lambda c: c.flatmap(wrap), max_leaves=6)
    ch_names = [
        "toUInt64", "toInt32", "toDate", "toString", "toFloat64", "ifNull",
        "assumeNotNull", "lowerUTF8", "toStartOfDay", "toStartOfWeek",
        "toStartOfMonth", "multiIf",
    ]

    @settings(max_examples=60, deadline=None)
    @given(exprs)
    def check(expr):
        t = translate_clickhouse_sql(f"SELECT {expr} AS v FROM t")
        for name in ch_names:
            assert f"{name}(" not in t.sql.replace(" (", "("), (expr, t.sql)

    check()

    # and a deep concrete nesting actually EXECUTES in Spark
    spark.sql("SELECT 1 AS x, 2 AS y").createOrReplaceTempView("fuzz_t")
    out = run_clickhouse_sql(
        spark,
        "SELECT toUInt64(ifNull(toUInt64(multiIf(x > 0, toInt32(y), 0)), 0))"
        " AS v FROM fuzz_t",
    ).collect()
    assert out[0]["v"] == 2
