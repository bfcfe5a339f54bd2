"""ClickHouse → Spark SQL dialect shim.

The reference executes raw ClickHouse SQL through its generic execute
operator (``clickhouse/v1/operator.py:440-499``; query strings across
``clickhouse/utils.py``, ``airflow/bitquery.py``,
``coinprice/*.py``). A user migrating from the reference brings those
query strings with them; this module rewrites the ClickHouse-isms that
actually appear in the reference's SQL surface into Spark SQL, so the
S2/S6 runners accept them unchanged:

- type casts: ``toDate/toDateTime/toString/toUInt*/toInt*/toFloat*``
- time: ``now()``, ``today()``, ``toStartOfDay/Week/Month``
- conditional aggregates: ``countIf/sumIf/avgIf``
- distinct estimation: ``uniq`` (approximate in ClickHouse →
  ``approx_count_distinct``), ``uniqExact`` → ``count(DISTINCT ...)``
- ``multiIf`` → chained ``CASE WHEN`` via nested ``if()`` (Spark's
  ``if`` matches ClickHouse's ternary semantics)
- trailing ``FORMAT JSON|JSONEachRow|JSONCompactStrings|CSVWithNames|
  TSV...`` → stripped and returned separately (the reader/writer layer
  owns formats, ``sources/io.py``)

Deliberately NOT translated (raise ``ValueError`` pointing at the
native operator): ``replaceRegexpOne`` (Spark's ``regexp_replace``
replaces ALL matches — the one reference use, the Ripple block parse
at ``clickhouse/utils.py``, is implemented natively in
``functions/scalars.py``), and ``arrayJoin`` (use LATERAL VIEW
``explode`` — a clause-level rewrite no function map can do safely).

This is a pragmatic word-boundary rewriter for the reference's query
shapes, not a full SQL parser: function names inside string literals
are left alone by masking literals first.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# simple name-for-name rewrites (CH is case-sensitive for these)
_RENAMES = {
    "toDate": "to_date",
    "toDateTime": "to_timestamp",
    "toString": "string",
    "toFloat64": "double",
    "toFloat32": "float",
    "now": "current_timestamp",
    "today": "current_date",
    "countIf": "count_if",
    "uniq": "approx_count_distinct",
    "toStartOfDay": "date_trunc('DAY', ",  # handled specially below
    "lowerUTF8": "lower",
    "upperUTF8": "upper",
    "ifNull": "coalesce",
    "assumeNotNull": "",  # no-op wrapper in Spark (nullability hint only)
}

_INT_CASTS = {
    "toUInt64": "BIGINT",
    "toInt64": "BIGINT",
    "toUInt32": "INT",
    "toInt32": "INT",
    "toUInt16": "INT",
    "toInt16": "INT",
    "toUInt8": "TINYINT",
    "toInt8": "TINYINT",
}

_TRUNCS = {
    "toStartOfDay": "day",
    "toStartOfWeek": "week",
    "toStartOfMonth": "month",
    "toStartOfHour": "hour",
}

_UNSUPPORTED = {
    "replaceRegexpOne": (
        "Spark regexp_replace replaces ALL matches; the reference's one "
        "use (Ripple block parse) is native — see functions/scalars.py"
    ),
    "arrayJoin": "use LATERAL VIEW explode(...) — a clause-level rewrite",
}

_FORMAT_RE = re.compile(
    r"\s+FORMAT\s+(JSONEachRow|JSONCompactStrings|JSONCompact|JSON|"
    r"CSVWithNames|CSV|TSVWithNames|TSV|Parquet)\s*;?\s*$",
    re.IGNORECASE,
)


@dataclass
class TranslatedSQL:
    sql: str
    format: str | None  # the stripped ClickHouse FORMAT clause, if any


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Swap out single-quoted literals so rewrites never touch them."""
    lits: list[str] = []

    def stash(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    return re.sub(r"'(?:[^'\\]|\\.)*'", stash, sql), lits


def _unmask(sql: str, lits: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], sql)


def _balanced_arg(text: str, open_idx: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in SQL")


def _rewrite_call(sql: str, name: str, render) -> str:
    """Rewrite every ``name( args )`` call via ``render(args_text)``."""
    out = []
    i = 0
    pat = re.compile(rf"\b{name}\s*\(")
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        open_idx = sql.index("(", m.start())
        end = _balanced_arg(sql, open_idx)
        out.append(sql[i : m.start()])
        out.append(render(sql[open_idx + 1 : end - 1].strip()))
        i = end


def _render_multi_if(args: str) -> str:
    """multiIf(c1, v1, c2, v2, ..., default) → nested if()."""
    parts = _split_args(args)
    if len(parts) % 2 == 0 or len(parts) < 3:
        raise ValueError("multiIf expects odd argument count ≥ 3")
    expr = parts[-1]
    for cond, val in zip(parts[-3::-2], parts[-2::-2]):
        expr = f"if({cond}, {val}, {expr})"
    return expr


def _split_args(args: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def translate_clickhouse_sql(sql: str) -> TranslatedSQL:
    """Rewrite a ClickHouse query into Spark SQL (see module doc)."""
    fmt = None
    m = _FORMAT_RE.search(sql)
    if m:
        fmt = m.group(1)
        sql = sql[: m.start()]

    masked, lits = _mask_literals(sql)

    for name, why in _UNSUPPORTED.items():
        if re.search(rf"\b{name}\s*\(", masked):
            raise ValueError(f"unsupported ClickHouse function {name}(): {why}")

    for name, unit in _TRUNCS.items():
        masked = _rewrite_call(
            masked, name, lambda a, u=unit: f"date_trunc('{u}', {a})"
        )
    for name, sqltype in _INT_CASTS.items():
        masked = _rewrite_call(
            masked, name, lambda a, t=sqltype: f"CAST({a} AS {t})"
        )
    masked = _rewrite_call(
        masked,
        "sumIf",
        lambda a: (
            lambda p: f"sum(CASE WHEN {p[1]} THEN {p[0]} END)"
        )(_split_args(a)),
    )
    masked = _rewrite_call(
        masked,
        "avgIf",
        lambda a: (
            lambda p: f"avg(CASE WHEN {p[1]} THEN {p[0]} END)"
        )(_split_args(a)),
    )
    masked = _rewrite_call(
        masked, "uniqExact", lambda a: f"count(DISTINCT {a})"
    )
    masked = _rewrite_call(masked, "multiIf", _render_multi_if)
    masked = _rewrite_call(masked, "assumeNotNull", lambda a: f"({a})")
    for src, dst in _RENAMES.items():
        if src in ("toStartOfDay", "assumeNotNull"):
            continue  # handled above
        masked = re.sub(rf"\b{src}\s*\(", f"{dst}(", masked)

    return TranslatedSQL(sql=_unmask(masked, lits).strip(), format=fmt)


def run_clickhouse_sql(spark, sql: str, params: dict | None = None):
    """Translate and execute one ClickHouse-dialect statement."""
    t = translate_clickhouse_sql(sql)
    return spark.sql(t.sql, args=params or {})
