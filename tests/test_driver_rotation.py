"""The mechanical driver-window rotation contract (VERDICT r5 #1/#4).

The external driver checks only the FIRST 50 entries of queries();
ordering comes from the committed DRIVER_LAST_GREEN map: red (checked,
never green) first, never-checked next, then green stalest-first, ties
in registry order. These tests pin that contract and keep the committed
map in sync with the CORRECTNESS_r*.json files it derives from.
"""

from __future__ import annotations

import glob
import os

from dataengineering_spark.plans.driver_rounds import (
    DRIVER_HISTORY,
    DRIVER_LAST_GREEN,
)
from dataengineering_spark.plans.queries import QUERIES, _ordered_names

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rank(name: str) -> int:
    hist = DRIVER_HISTORY.get(name)
    if hist is None:
        return 0
    last_green, last_checked = hist
    rank = -1 if (last_green < 0 or last_checked > last_green) else 1 + last_green
    if rank > 0:
        # a green whose implementation changed since its rotate-time stamp
        # ranks with the reds (VERDICT r10 #2 — the audio_neardup class)
        from dataengineering_spark.plans import driver_rounds
        from dataengineering_spark.plans.queries import _query_signature

        stamp = getattr(driver_rounds, "DRIVER_SIGNATURES", {}).get(name)
        if stamp is not None and name in QUERIES:
            live = _query_signature(name)
            if live is not None and stamp != live:
                rank = -1
    return rank


def test_ordering_is_red_then_never_then_stalest():
    from dataengineering_spark.plans.queries import _DRIVER_PRIORITY

    names = _ordered_names()
    assert sorted(names) == sorted(QUERIES), "ordering must be a permutation"
    # a manual override head is allowed (prepended verbatim); the
    # mechanical contract applies to the remainder
    head = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    assert names[: len(head)] == head
    rest = names[len(head):]
    ranks = [_rank(n) for n in rest]
    assert ranks == sorted(ranks), "rank order violated"
    # ties break on registry position (deterministic window round-to-round)
    pos = {n: i for i, n in enumerate(QUERIES)}
    for a, b in zip(rest, rest[1:]):
        if _rank(a) == _rank(b):
            assert pos[a] < pos[b], (a, b)


def test_window_targets_weakest_evidence():
    window = _ordered_names()[:50]
    reds = [n for n in QUERIES if n in DRIVER_HISTORY and _rank(n) < 0]
    never = [n for n in QUERIES if n not in DRIVER_HISTORY]
    for n in reds:
        assert n in window, f"red query {n} must be re-checked first"
    # never-checked queries fill the window before any green rotates in
    n_free = 50 - len(reds)
    expect_never = min(n_free, len(never))
    assert sum(1 for n in window if n in never) == expect_never


def test_committed_map_matches_correctness_files():
    """Race-aware staleness guard (VERDICT r9 #3).

    The driver drops CORRECTNESS_r{N}.json AFTER the round's final commit,
    so the committed map can never have ingested the newest file.  The
    guard therefore asserts:
      (a) the stamped INGESTED_ROUNDS replay to DRIVER_HISTORY exactly
          (no hand-edits, no history rewrites);
      (b) every on-disk round <= max(INGESTED_ROUNDS) is ingested;
      (c) at most ONE newer on-disk round is un-ingested (the post-commit
          driver drop).  Two or more behind = a skipped `make rotate`.
    """
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from rebuild_driver_priority import compute_history, discover_rounds

    from dataengineering_spark.plans.driver_rounds import INGESTED_ROUNDS

    hist = compute_history(INGESTED_ROUNDS)
    assert hist == DRIVER_HISTORY, (
        "driver_rounds.py disagrees with its own stamped rounds — it was "
        "hand-edited or the CORRECTNESS history was rewritten; re-run "
        "scripts/rebuild_driver_priority.py"
    )
    assert DRIVER_LAST_GREEN == {n: lg for n, (lg, _lc) in hist.items()}

    on_disk = discover_rounds()
    ingested = set(INGESTED_ROUNDS)
    assert ingested <= set(on_disk), (
        f"map ingested rounds missing from disk: {sorted(ingested - set(on_disk))}"
    )
    stale = [r for r in on_disk if r not in ingested]
    assert all(r > max(ingested) for r in stale), (
        f"older un-ingested CORRECTNESS rounds: {stale} — run rotate"
    )
    assert len(stale) <= 1, (
        f"{len(stale)} un-ingested rounds {stale}: rotate was skipped for a "
        "whole round — run scripts/rebuild_driver_priority.py"
    )


def test_regression_ranks_red():
    # a query green in round N but red on a later check must rank with the
    # reds (ADVICE r6): simulate via the rank function's contract
    assert _rank("__never_checked__") == 0
    DRIVER_HISTORY["__regressed__"] = (3, 5)
    DRIVER_HISTORY["__never_green__"] = (-1, 5)
    try:
        assert _rank("__regressed__") == -1
        assert _rank("__never_green__") == -1
    finally:
        del DRIVER_HISTORY["__regressed__"]
        del DRIVER_HISTORY["__never_green__"]


def test_signature_change_jumps_into_window():
    """Editing a query's oracle (or callable) after its last driver green
    must pull it into the 50-slot window immediately (VERDICT r10 task #2:
    the audio_neardup gap is a class, not an instance)."""
    from dataengineering_spark.plans import driver_rounds
    from dataengineering_spark.plans.queries import QuerySpec, _ordered_names

    stamps = getattr(driver_rounds, "DRIVER_SIGNATURES", {})
    assert stamps, "rotate must stamp DRIVER_SIGNATURES"
    # the freshest green is the query least likely to rotate in on its own
    name = max(
        (n for n in QUERIES if n in stamps and DRIVER_LAST_GREEN.get(n, -1) > 0),
        key=lambda n: DRIVER_LAST_GREEN[n],
    )
    before = _ordered_names()
    spec = QUERIES[name]
    assert spec.sql is not None
    QUERIES[name] = QuerySpec(spec.fn, spec.sql + " -- edited", spec.survey_ref)
    try:
        window = _ordered_names()[:50]
        assert name in window, f"{name} edited after green but not re-checked"
        assert _rank(name) == -1
    finally:
        QUERIES[name] = spec
    assert _ordered_names() == before, "restore must be clean"


def test_rotate_rerun_does_not_launder_stamps():
    """Re-running the rebuild with NO newly-ingested round must preserve
    existing stamps verbatim — otherwise a mid-round edit followed by a
    second `make rotate` would silently re-green the changed query."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from rebuild_driver_priority import compute_signatures

    from dataengineering_spark.plans.queries import _SIG_VERSION

    v = _SIG_VERSION + ":"
    old = {"some_query": v + "deadbeef", "video_neardup": v + "cafebabe"}
    sigs = compute_signatures(old, new_rounds=[])
    assert sigs.get("video_neardup") == v + "cafebabe"
    # a query checked in a newly-ingested round IS refreshed
    sigs2 = compute_signatures(old, new_rounds=[10])
    assert sigs2.get("video_neardup") != v + "cafebabe"
    # a stamp from an OLDER signature algorithm cannot be compared against
    # live signatures and is deliberately refreshed (one-time reset; known
    # pre-upgrade gaps are washed via _DRIVER_PRIORITY pins instead)
    old_v1 = {"video_neardup": "cafebabe"}  # no version prefix = v1
    sigs3 = compute_signatures(old_v1, new_rounds=[])
    assert sigs3.get("video_neardup", "").startswith(v)


def test_driver_priority_pin_heads_window():
    from dataengineering_spark.plans.queries import _DRIVER_PRIORITY, _ordered_names

    # r14 pins: the five r13 batch-3 rewrites whose last driver green
    # predates the rewrite (the r13 restamp means they no longer rank as
    # drifted — the pin is what forces them into the r14 window; VERDICT
    # r13 #3).  Drop once CORRECTNESS_r14 shows them green.
    pins = _DRIVER_PRIORITY
    assert pins == [
        "sla_percentiles",
        "growth_accounting",
        "repetition_metrics",
        "vocab_growth",
        "rfm_segments",
    ]
    assert len(pins) <= 50, "pins must fit the driver window"
    assert _ordered_names()[: len(pins)] == pins


def test_closure_sees_function_local_imports():
    """A callable whose ONLY reference to an operator module is a
    function-body ``from pkg.mod import sym`` must still contribute that
    module to the v3 signature (ADVICE r12 medium: the dotted path sits in
    co_names but never resolves through __globals__)."""
    from dataengineering_spark.plans.queries import _callable_closure

    def only_local_import(spark, sf_dir):
        from dataengineering_spark.operators.sketches import kmv_sketch

        return kmv_sketch

    helpers, modules = _callable_closure(only_local_import)
    assert "dataengineering_spark.operators.sketches" in modules, modules
    # a body-local PLANS import enters as a source-hash helper key, never
    # the module set (whole-plan-file hashing must stay out of `modules`)
    def local_plans_import(spark, sf_dir):
        from dataengineering_spark.plans.queries_llm import QUERIES as q

        return q

    helpers2, modules2 = _callable_closure(local_plans_import)
    assert not any(".plans" in m for m in modules2), modules2
    assert "module:dataengineering_spark.plans.queries_llm" in helpers2


def test_module_ast_deps_sees_value_only_imports(tmp_path):
    """_module_deps must count a dependency pulled in as plain data
    (ADVICE r12 low: ``from other_op import SOME_CONST`` leaves no module
    object or __module__-tagged symbol in globals)."""
    import sys
    import types

    from dataengineering_spark.plans.queries import _module_ast_deps

    src = tmp_path / "fake_mod.py"
    src.write_text(
        "from dataengineering_spark.operators.dedup import PAIR_THRESHOLD\n"
        "from .similarity import SOME_TABLE\n"
        "import dataengineering_spark.functions.text\n"
        "def f():\n"
        "    from dataengineering_spark.caching import persist_tracked\n"
        "    return persist_tracked\n"
    )
    name = "dataengineering_spark.operators._test_astdep"
    mod = types.ModuleType(name)
    mod.__file__ = str(src)
    mod.__package__ = "dataengineering_spark.operators"
    sys.modules[name] = mod
    try:
        deps = _module_ast_deps(name)
    finally:
        del sys.modules[name]
    assert "dataengineering_spark.operators.dedup" in deps, deps  # value-only
    assert "dataengineering_spark.operators.similarity" in deps, deps  # relative
    assert "dataengineering_spark.functions.text" in deps, deps  # plain import
    assert "dataengineering_spark.caching" in deps, deps  # function-local


def test_signature_covers_operator_module_closure():
    """The v2 signature must include the operator modules a query callable
    transitively touches (VERDICT r11 #1: the r11 rewrite of
    connected_components changed the engine under dedup_clusters without
    tripping the v1 stamp)."""
    from dataengineering_spark.plans.queries import _callable_closure

    helpers, modules = _callable_closure(QUERIES["dedup_clusters"].fn)
    assert "dataengineering_spark.operators.dedup" in modules, modules
    # the plans-layer pair-cache helper rides along as source, not module
    assert any("_lsh_pairs_cached" in k for k in helpers), sorted(helpers)
    # plans modules must never enter the module set (hashing a whole plan
    # file would drift every sibling query on any edit)
    assert not any(".plans" in m for m in modules), modules


def test_operator_module_edit_jumps_consumers_into_window():
    """Editing operators/dedup.py alone (no callable/oracle change) must
    pull its consumer queries into the 50-slot window (VERDICT r11 #1).
    Simulated at the exact point file contents enter the signature: the
    module-source-hash memo."""
    from dataengineering_spark.plans import queries as Q

    mod = "dataengineering_spark.operators.dedup"
    # ensure the real hash is cached, then override it
    real = Q._module_source_hash(mod)
    assert real is not None
    before = _ordered_names()
    Q._MODULE_HASH_CACHE[mod] = "0" * 64  # simulate an engine edit
    try:
        window = _ordered_names()[:50]
        for name in ("dedup_clusters", "dedup_survivors"):
            assert name in window, f"{name} engine edited but not re-checked"
            assert _rank(name) == -1, name
        # a dedup-free green query must NOT drift
        assert _rank("grouped_counts") > 0
    finally:
        Q._MODULE_HASH_CACHE[mod] = real
    assert _ordered_names() == before, "restore must be clean"


def test_sourceless_signature_skips_drift_not_red():
    """A query whose callable source is unavailable returns a None live
    signature; the drift check must SKIP it (ADVICE r11: a source-less
    deployment must not rank every green red)."""
    from dataengineering_spark.plans.queries import QuerySpec, _query_signature

    # exec'd callable: inspect.getsource raises OSError
    ns: dict = {}
    exec("def _no_source(spark, sf_dir):\n    return None\n", ns)
    name = max(
        (n for n in QUERIES if DRIVER_LAST_GREEN.get(n, -1) > 0),
        key=lambda n: DRIVER_LAST_GREEN[n],
    )
    spec = QUERIES[name]
    QUERIES[name] = QuerySpec(ns["_no_source"], spec.sql, spec.survey_ref)
    try:
        assert _query_signature(name) is None
        # drift check skipped -> keeps its green rank, stays out of window
        assert _rank(name) > 0
    finally:
        QUERIES[name] = spec


def test_every_query_has_an_oracle():
    from dataengineering_spark.plans.queries import get_oracle_sql

    missing = [n for n, s in QUERIES.items() if s.sql is None]
    # non-SQL-expressible ops are allowed, but must be deliberate: today
    # the registry is 100% oracle-backed — extend this list consciously
    assert missing == [], missing
    assert len(get_oracle_sql()) == len(QUERIES)
