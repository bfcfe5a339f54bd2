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

- ``arrayJoin(expr) [AS alias]`` in the top-level SELECT list →
  ``LATERAL VIEW explode(expr)`` (exactly one call; nested/multiple
  uses raise — ClickHouse's multi-arrayJoin cartesian semantics are a
  deliberate non-goal)
- ``toStartOfWeek`` → a Sunday-start expression (ClickHouse mode 0 is
  Sunday-first; a bare ``date_trunc('week')`` would be Monday-first)
- nested same-name calls translate fully: the rewrite loops to a
  fixpoint (``toUInt64(coalesce(toUInt64(x), 0))`` both convert)

- ``replaceRegexpOne(x, pat, repl)`` → a first-occurrence splice:
  Spark's ``regexp_replace`` replaces ALL matches, so the rewrite
  stitches ``substr``-before-match + replacement + ``substr``-after
  around ``regexp_instr``/``regexp_extract`` of the FIRST match.
  Only plain string-literal replacements translate (no ``\\N``/``$N``
  backreferences — RE2 vs Java backref syntax differs); anything else
  raises with a pointer.  This covers the one reference use, the
  Hedera block parse at ``clickhouse/utils.py:57-59`` (empty-string
  replacement), whose math also lives natively in
  ``functions/scalars.py``.

This is a pragmatic word-boundary rewriter for the reference's query
shapes, not a full SQL parser: function names inside string literals
are left alone by masking literals first.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# simple name-for-name rewrites (CH is case-sensitive for these).
# Rename targets must never re-match a ClickHouse source name — the
# translation core loops to a fixpoint to handle nested calls.
_RENAMES = {
    "toDate": "to_date",
    "toDateTime": "to_timestamp",
    "toString": "string",
    "toFloat64": "double",
    "toFloat32": "float",
    "now": "current_timestamp",
    "today": "current_date",
    "countIf": "count_if",
    "lowerUTF8": "lower",
    "upperUTF8": "upper",
    "ifNull": "coalesce",
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

# toStartOfWeek is NOT here: ClickHouse's default mode 0 means
# Sunday-start weeks, while Spark date_trunc('week') is Monday-start —
# it gets a dedicated Sunday-start render below.
_TRUNCS = {
    "toStartOfDay": "day",
    "toStartOfMonth": "month",
    "toStartOfHour": "hour",
}

_UNSUPPORTED: dict[str, str] = {}

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


def _render_to_start_of_week(args: str) -> str:
    """toStartOfWeek(d[, mode]) — ClickHouse mode 0 (the default) means
    Sunday-start weeks; Spark date_trunc('week') truncates to Monday, so
    shift by one day in and back out.  Only mode 0 is supported: a blind
    1-arg rewrite would fold an explicit mode argument into to_date()'s
    format parameter and emit invalid Spark SQL (ADVICE r6)."""
    parts = _split_args(args)
    if len(parts) > 1:
        mode = parts[1]
        if mode.strip() != "0":
            raise ValueError(
                "toStartOfWeek mode "
                f"{mode!r} unsupported — only mode 0 (Sunday-start) "
                "translates; rewrite the query with date_trunc('week', "
                "date_add(d, 1)) semantics for Monday-start modes"
            )
    d = parts[0]
    return f"date_sub(date_trunc('week', date_add(to_date({d}), 1)), 1)"


def _render_replace_regexp_one(args: str, lits: list[str]) -> str:
    """replaceRegexpOne(x, pat, repl) → first-occurrence splice.

    Spark's ``regexp_replace`` replaces every match, so build the
    first-only semantics from primitives: everything before the first
    match (``regexp_instr`` is 1-based; 0 = no match), the literal
    replacement, then everything after the matched text
    (``regexp_extract(..., 0)`` is the first match itself, so the two
    agree on which occurrence is "first").  The replacement must be a
    plain string literal with no ``\\N``/``$N`` backreferences —
    ClickHouse (RE2) and Java disagree on backref syntax, and a
    spliced literal sidesteps the question entirely."""
    parts = _split_args(args)
    if len(parts) != 3:
        raise ValueError(
            "replaceRegexpOne expects (haystack, pattern, replacement)"
        )
    x, pat, repl = parts
    m = re.fullmatch(r"\x00(\d+)\x00", repl)
    if not m or re.search(r"[\\$]", lits[int(m.group(1))][1:-1]):
        raise ValueError(
            "replaceRegexpOne(): only a plain string-literal replacement "
            "(no \\N/$N backreferences) translates — rewrite natively "
            "with regexp_instr/regexp_extract (see functions/scalars.py "
            "for the Hedera block parse)"
        )
    first = f"regexp_instr({x}, {pat})"
    matched = f"regexp_extract({x}, {pat}, 0)"
    return (
        f"CASE WHEN {first} > 0 THEN concat("
        f"substr({x}, 1, {first} - 1), {repl}, "
        f"substr({x}, {first} + length({matched}))) "
        f"ELSE {x} END"
    )


def _render_uniq(args: str) -> str:
    """uniq(a) → approx_count_distinct(a); uniq(a, b, ...) estimates
    distinct TUPLES in ClickHouse, so multi-arg forms struct()-wrap —
    a blind rename would make Spark read the second argument as the
    rsd precision parameter and silently change semantics."""
    parts = _split_args(args)
    if len(parts) <= 1:
        return f"approx_count_distinct({args})"
    return f"approx_count_distinct(struct({', '.join(parts)}))"


_CLAUSE_KEYWORDS = re.compile(
    r"\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|SETTINGS|UNION)\b",
    re.IGNORECASE,
)


def _depth_at(text: str, idx: int) -> int:
    return text.count("(", 0, idx) - text.count(")", 0, idx)


def _rewrite_array_join(masked: str) -> str:
    """arrayJoin(arr) in the SELECT list → LATERAL VIEW explode.

    Deliberately narrow (the reference itself never uses arrayJoin —
    this exists for migrating user queries): exactly ONE top-level
    SELECT-list ``arrayJoin(expr) [AS alias]``; anything else
    (multiple calls = ClickHouse cartesian semantics, subquery
    placement, WHERE-clause use) raises with a pointer.
    """
    pat = re.compile(r"\barrayJoin\s*\(")
    matches = list(pat.finditer(masked))
    if not matches:
        return masked
    if len(matches) > 1:
        raise ValueError(
            "unsupported: multiple arrayJoin() calls (ClickHouse gives the "
            "cartesian product) — rewrite as explicit LATERAL VIEW explode"
        )
    m = matches[0]
    if _depth_at(masked, m.start()) != 0:
        raise ValueError(
            "unsupported: arrayJoin() outside the top-level SELECT list — "
            "rewrite as LATERAL VIEW explode in the subquery"
        )
    sel = re.search(r"\bSELECT\b", masked, re.IGNORECASE)
    frm = None
    for fm in re.finditer(r"\bFROM\b", masked, re.IGNORECASE):
        if _depth_at(masked, fm.start()) == 0:
            frm = fm
            break
    if not sel or not frm or not (sel.end() <= m.start() < frm.start()):
        raise ValueError(
            "unsupported: arrayJoin() must appear in the top-level SELECT "
            "list — rewrite as LATERAL VIEW explode"
        )
    open_idx = masked.index("(", m.start())
    end = _balanced_arg(masked, open_idx)
    arr_expr = masked[open_idx + 1 : end - 1].strip()
    alias_m = re.match(r"\s+AS\s+(\w+)", masked[end:], re.IGNORECASE)
    if alias_m:
        alias = alias_m.group(1)
        call_end = end + alias_m.end()
    else:
        alias = "aj"
        call_end = end
    # swap the call (+ AS clause) for a plain column reference
    body = masked[: m.start()] + alias + masked[call_end:]
    # insert the LATERAL VIEW after the FROM-clause table expression:
    # just before the first top-level clause keyword after FROM, else at
    # the end of the statement.
    frm2 = None
    for fm in re.finditer(r"\bFROM\b", body, re.IGNORECASE):
        if _depth_at(body, fm.start()) == 0:
            frm2 = fm
            break
    insert_at = len(body.rstrip().rstrip(";"))
    for kw in _CLAUSE_KEYWORDS.finditer(body, frm2.end()):
        if _depth_at(body, kw.start()) == 0:
            insert_at = kw.start()
            break
    lv = f" LATERAL VIEW explode({arr_expr}) _aj AS {alias} "
    return body[:insert_at].rstrip() + lv + body[insert_at:]


def _translate_once(masked: str, lits: list[str]) -> str:
    """One pass of every function-level rewrite."""
    masked = _rewrite_call(
        masked,
        "replaceRegexpOne",
        lambda a: _render_replace_regexp_one(a, lits),
    )
    for name, unit in _TRUNCS.items():
        masked = _rewrite_call(
            masked, name, lambda a, u=unit: f"date_trunc('{u}', {a})"
        )
    # ClickHouse toStartOfWeek defaults to mode 0 = Sunday-start weeks;
    # Spark date_trunc('week') truncates to Monday.  Shift by one day on
    # the way in and back out so every Sunday lands in its own week.
    masked = _rewrite_call(masked, "toStartOfWeek", _render_to_start_of_week)
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
    masked = _rewrite_call(masked, "uniq", _render_uniq)
    masked = _rewrite_call(masked, "multiIf", _render_multi_if)
    # assumeNotNull is a nullability hint with no Spark equivalent —
    # strip the wrapper, keep the argument parenthesized.
    masked = _rewrite_call(masked, "assumeNotNull", lambda a: f"({a})")
    for src, dst in _RENAMES.items():
        masked = re.sub(rf"\b{src}\s*\(", f"{dst}(", masked)
    return masked


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

    masked = _rewrite_array_join(masked)

    # Loop to a fixpoint so nested same-name calls translate too —
    # a single pass emits argument text verbatim, leaving e.g. the
    # inner toUInt64 of toUInt64(coalesce(toUInt64(x), 0)) untouched.
    for _ in range(10):
        before = masked
        masked = _translate_once(masked, lits)
        if masked == before:
            break
    else:
        raise ValueError("dialect rewrite did not converge (10 passes)")

    return TranslatedSQL(sql=_unmask(masked, lits).strip(), format=fmt)


def run_clickhouse_sql(spark, sql: str, params: dict | None = None):
    """Translate and execute one ClickHouse-dialect statement."""
    t = translate_clickhouse_sql(sql)
    return spark.sql(t.sql, args=params or {})
