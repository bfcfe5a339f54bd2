"""Build a PERF-ONLY scaled corpus by replicating a driver sf dir.

The driver ships sf0.001/0.01/0.1; the scale story needs at least one
datapoint an order of magnitude past the largest. This replicates each
fact table K times with shifted keys (dimension tables region/nation
stay fixed, like TPC-H), so row counts and key cardinalities scale
together the way a real sf1 generation would. Document text is
per-copy letter-rotated so shingle/minhash distributions spread like
genuinely distinct documents instead of producing a pathological
10-way exact-duplicate corpus.

Output is ONLY for relative timing (bench.py against the same query
set) — it is not driver data and is never used for correctness
oracles. Writes to the target dir (default /tmp/sf1); never touches
/root/testdata.

Usage: python scripts/make_scaled_sf.py [src_dir] [dst_dir] [k] [tables]

``tables`` (comma-separated, optional) restricts generation to the
listed tables — the scale probes usually need only documents and/or
embeddings, and lineitem x1000 alone costs ~an hour.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

# (table, [key columns to shift by copy * max_key])
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# foreign keys borrow the max of their referenced table's key space
FK_SOURCE = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    maxes: dict[str, int] = {}
    for t, keys in SHIFTS.items():
        for k in keys:
            ref_t, ref_k = FK_SOURCE.get(k, (t, k))
            if ref_k not in maxes:
                maxes[ref_k] = con.sql(
                    f"SELECT MAX({ref_k}) + 1 FROM read_parquet('{SRC}/{ref_t}.parquet')"
                ).fetchone()[0]
            maxes[k] = maxes[ref_k]

    for t, keys in SHIFTS.items():
        if ONLY is not None and t not in ONLY:
            continue
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if not keys:
            con.execute(f"COPY (SELECT * FROM {src}) TO '{DST}/{t}.parquet'")
            continue
        selects = []
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        for i in range(K):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i} * {maxes[c]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    rot = "abcdefghijklmnopqrstuvwxyz"
                    shifted = rot[i % 26 :] + rot[: i % 26]
                    exprs.append(f"translate(text, '{rot}', '{shifted}') AS text")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{DST}/{t}.parquet'"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
