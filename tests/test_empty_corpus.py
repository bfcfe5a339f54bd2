"""Empty-corpus robustness: a new chain / day / source with ZERO rows
must not crash the engine. Every registry query either returns a
(possibly empty) result or raises the engine's own ValueError guard —
never an opaque AnalysisException / ANSI arithmetic error.

At 100 TB empty inputs are routine (fresh partitions, filtered-out
days, unlaunched sources); this sweep is the contract that the whole
query surface degrades cleanly.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# Whole-registry long-horizon sweep: excluded from the default
# (driver-budget) pytest run; gates shipping via `make test-slow`.
pytestmark = pytest.mark.slow


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Schema-preserving empty replicas of every corpus table."""
    d = tmp_path_factory.mktemp("sf0")
    con = duckdb.connect()
    src = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') WHERE 1=0)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


def test_every_query_degrades_cleanly_on_empty_corpus(spark, empty_sf):
    from dataengineering_spark.plans.queries import QUERIES

    unexpected = {}
    for name, spec in QUERIES.items():
        try:
            spec.fn(spark, empty_sf).collect()
        except ValueError:
            pass  # the engine's own explicit empty-input guard
        except Exception as ex:  # noqa: BLE001 — classifying failure modes
            unexpected[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
    assert not unexpected, unexpected


@pytest.fixture(scope="module")
def nulled_sf(tmp_path_factory):
    """sf0.001 replica with ~20% NULLs injected into nullable non-key
    columns — real corpora have nulls even though the driver data
    doesn't."""
    d = tmp_path_factory.mktemp("sfnull")
    specs = {
        "region": [],
        "nation": [],
        "customer": ["c_acctbal", "c_mktsegment"],
        "supplier": ["s_acctbal"],
        "part": ["p_retailprice", "p_type"],
        "orders": ["o_totalprice", "o_orderpriority"],
        "lineitem": ["l_discount", "l_tax", "l_returnflag"],
        "events": ["value", "props", "event_type"],
        "documents": ["text", "lang"],
        "embeddings": ["label"],
    }
    con = duckdb.connect()
    src = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    for t, cols in specs.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()
        sel = [
            (
                f"CASE WHEN (ROW_NUMBER() OVER ()) % 5 = 0 THEN NULL "
                f"ELSE {name} END AS {name}"
                if name in cols
                else name
            )
            for name, *_ in desc
        ]
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


def test_every_query_tolerates_injected_nulls(spark, nulled_sf):
    """No opaque crash on null-bearing columns — null text, null
    values, null enrichment keys all flow through (semantics per
    query; this sweep pins crash-freedom, not results)."""
    from dataengineering_spark.plans.queries import QUERIES

    unexpected = {}
    for name, spec in QUERIES.items():
        try:
            spec.fn(spark, nulled_sf).collect()
        except ValueError:
            pass
        except Exception as ex:  # noqa: BLE001 — classifying failure modes
            unexpected[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
    assert not unexpected, unexpected


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    """Documents with CJK / emoji / RTL / combining-accent heads — the
    text the driver corpus never exercises but a real crawl always
    contains."""
    d = tmp_path_factory.mktemp("sfuni")
    con = duckdb.connect()
    src = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    for t in TABLES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"""
        COPY (
          SELECT doc_id,
            CASE doc_id % 5
              WHEN 0 THEN '数据处理引擎测试 ' || text
              WHEN 1 THEN '🚀🔥💾 emoji head ' || text
              WHEN 2 THEN 'اختبار المحرك ' || text
              WHEN 3 THEN 'café naïve façade ñoño ' || text
              ELSE text
            END AS text,
            lang, source, n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


_DOC_QUERY_MARKERS = (
    "token", "lang", "quality", "char", "html", "doc_", "dedup", "simhash",
    "minhash", "ngram", "fuzzy", "redact", "tfidf", "repetition", "chunk",
    "fingerprint", "mixture", "dataset", "benchmark", "rarity", "dsir",
)


def test_text_queries_stay_oracle_exact_on_unicode(spark, unicode_sf):
    """Not just crash-freedom: every document-facing query must still
    HASH-MATCH its DuckDB oracle when the text carries multi-byte code
    points — i.e. both engines agree on substring / levenshtein /
    regex / md5-of-utf8 semantics over the full unicode range the
    queries touch."""
    from dataengineering_spark.plans.queries import QUERIES
    from tests.conftest import assert_frames_match

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{unicode_sf}/{t}.parquet')"
        )
    names = [
        n
        for n in QUERIES
        if any(m in n for m in _DOC_QUERY_MARKERS) and QUERIES[n].sql is not None
    ]
    assert len(names) >= 20
    for name in names:
        sdf = QUERIES[name].fn(spark, unicode_sf)
        assert_frames_match(sdf, con.sql(QUERIES[name].sql))
    con.close()
