"""Regenerate dataengineering_spark/plans/driver_rounds.py from CORRECTNESS_r*.json.

The external correctness driver checks only the FIRST 50 entries of
``queries()`` per round.  To rotate coverage mechanically (instead of
hand-curating ``_DRIVER_PRIORITY`` each round), we keep a committed map of
``query name -> last round with a fully-green driver row`` (-1 when the query
has been checked but never green).  Queries absent from the map have never
been driver-checked.  ``queries.py`` orders the registry by
(red first, never-checked next, then stalest green), so each round's 50-slot
window automatically targets the weakest driver evidence.

Run from the repo root after a new CORRECTNESS_r{N}.json lands:

    python scripts/rebuild_driver_priority.py

and commit the regenerated module.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dataengineering_spark", "plans", "driver_rounds.py")
# When run as `python scripts/rebuild_driver_priority.py`, sys.path[0]
# is scripts/, NOT the repo root — so the package import of the OLD map
# inside main() silently failed, the bare except bootstrapped EVERY
# stamp to its live signature, and the no-launder semantics never
# engaged for script-invoked rotates (r14 finding: every `make rotate`
# since the stamps existed laundered them).  Insert the repo root
# before anything imports the package.
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def load_old_map() -> tuple[set[int], dict[str, str]]:
    """(ingested rounds, stamps) from the committed driver_rounds.py.

    A missing module (true first bootstrap) returns empty sets; any
    OTHER failure is re-raised — silently treating an import error as
    "no prior map" is exactly the stamp-laundering bug above."""
    try:
        from dataengineering_spark.plans import driver_rounds as _old
    except ImportError:
        if os.path.exists(OUT):
            raise  # the file exists but cannot import — do not launder
        return set(), {}
    return set(_old.INGESTED_ROUNDS), dict(
        getattr(_old, "DRIVER_SIGNATURES", {})
    )


def discover_rounds() -> list[int]:
    """Sorted round numbers of every CORRECTNESS_r*.json on disk."""
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return sorted(rounds)


def compute_history(rounds=None) -> dict[str, tuple[int, int]]:
    """name -> (last_green, last_checked).

    ``last_green`` is the newest round whose driver row was fully green
    (rows+schema+hash, no error), or -1 if never green.  ``last_checked``
    is the newest round with any driver row.  A query whose most recent
    check was NOT green (last_checked > last_green) is a live regression
    and must rank with the reds, not as "green but stale".

    ``rounds`` restricts ingestion to a specific round set (the rotation
    guard replays the stamped INGESTED_ROUNDS to verify the committed map
    byte-exactly even after the driver drops a newer ledger).
    """
    hist: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if rounds is not None and rnd not in set(rounds):
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            last_green, last_checked = hist.get(name, (-1, -1))
            if green:
                last_green = max(last_green, rnd)
            hist[name] = (last_green, max(last_checked, rnd))
    return hist


def checked_in_rounds(rounds) -> set[str]:
    """Names with a driver row in any of the given rounds."""
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m or int(m.group(1)) not in set(rounds):
            continue
        with open(path) as f:
            names.update(json.load(f))
    return names


def compute_signatures(old_stamps, new_rounds) -> dict[str, str]:
    """name -> content signature of the form the driver last checked.

    Rotate runs as the round's FIRST action, right after the driver ran the
    previous round's final commit — so the live signature at rotate time IS
    the signature of the form the driver just checked.  Refresh the stamp
    only for queries with a driver row in a newly-ingested round; preserve
    everything else (re-running rotate mid-round must not launder a
    mid-round edit back to green — that is the exact failure this stamp
    exists to catch).  Queries with no prior stamp bootstrap live.

    Signature-ALGORITHM upgrades are the one deliberate exception: a stamp
    from a different _SIG_VERSION cannot be compared against live v-current
    signatures (the old form's source is gone), so version-mismatched
    stamps are refreshed wholesale.  This resets the drift ranking once;
    any KNOWN pre-upgrade gaps must be washed explicitly via
    _DRIVER_PRIORITY pins in the same round (r12: the four CC/bucket
    consumers).  Laundering via a version bump would be a visible code
    change to queries._SIG_VERSION, not a silent rotate re-run.

    A None live signature (callable source unavailable) never overwrites an
    existing stamp and is omitted for new queries — the drift check skips
    such queries entirely.
    """
    import sys

    sys.path.insert(0, REPO)
    from dataengineering_spark.plans.queries import (
        QUERIES,
        _SIG_VERSION,
        _query_signature,
    )

    fresh = checked_in_rounds(new_rounds)
    prefix = _SIG_VERSION + ":"
    sigs: dict[str, str] = {}
    for name in QUERIES:
        old = old_stamps.get(name)
        stale_version = old is not None and not old.startswith(prefix)
        if name in fresh or old is None or stale_version:
            live = _query_signature(name)
            if live is not None:
                sigs[name] = live
            elif old is not None:
                sigs[name] = old
        else:
            sigs[name] = old
    return sigs


def main() -> None:
    """Regenerate driver_rounds.py.

    ``--restamp-verified=<names-or-artifact>`` additionally refreshes the
    signature stamp of the NAMED drifted queries to their LIVE signatures.
    The value is mandatory (ADVICE r13 medium: the r13 blanket form
    restamped a query that actually diverged from the oracle, suppressing
    the drift-triggered recheck exactly where it was needed) and must be
    either a comma-separated list of query names or a path to a
    CORRECTNESS_r*.json-format parity artifact, from which only the GREEN
    rows (rows+schema+hash, no err) are taken.  Any currently-drifted
    query NOT covered by the evidence makes the run ERROR, so the caller
    cannot silently launder an unverified edit; dropping the flag leaves
    drifted queries ranked with the reds (the safe default).
    """
    import sys as _sys

    restamp_arg = None
    for a in _sys.argv[1:]:
        if a == "--restamp-verified":
            raise SystemExit(
                "--restamp-verified now requires explicit evidence: pass "
                "--restamp-verified=name1,name2 or "
                "--restamp-verified=path/to/CORRECTNESS_rNN.json "
                "(ADVICE r13: the blanket form restamped a diverged query)"
            )
        if a.startswith("--restamp-verified="):
            restamp_arg = a.split("=", 1)[1]
    rounds = discover_rounds()
    hist = compute_history(rounds)
    old_ingested, old_stamps = load_old_map()
    new_rounds = [r for r in rounds if r not in old_ingested]
    sigs = compute_signatures(old_stamps, new_rounds)
    if restamp_arg is not None:
        from dataengineering_spark.plans.queries import (
            QUERIES as _Q,
            _query_signature as _qsig,
        )

        if restamp_arg.endswith(".json"):
            with open(restamp_arg) as f:
                rows = json.load(f)
            verified = {
                n
                for n, row in rows.items()
                if row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            }
        else:
            verified = {n for n in restamp_arg.split(",") if n}
        unknown = verified - set(_Q)
        if unknown:
            raise SystemExit(
                f"--restamp-verified: unknown query names {sorted(unknown)}"
            )
        refreshed, drifted_unverified = [], []
        for name in _Q:
            live = _qsig(name)
            if live is None or sigs.get(name) in (None, live):
                continue  # not drifted (or no comparable stamp)
            if name in verified:
                sigs[name] = live
                refreshed.append(name)
            else:
                drifted_unverified.append(name)
        if drifted_unverified:
            raise SystemExit(
                "--restamp-verified: these queries are drifted but carry "
                f"no green evidence: {sorted(drifted_unverified)} — verify "
                "them (or drop the flag to leave them red-ranked)"
            )
        print(f"--restamp-verified: refreshed {len(refreshed)} stamps")
    lines = [
        '"""AUTO-GENERATED by scripts/rebuild_driver_priority.py — do not edit.',
        "",
        "Maps each registry query to (last_green, last_checked): the newest",
        "round whose external driver row was fully green (rows+schema+hash, no",
        "error; -1 when never green), and the newest round with any driver row.",
        "last_checked > last_green marks a live regression, ranked with the",
        "reds by queries._ordered_names().  Queries missing from the map have",
        "never been driver-checked and sort ahead of every green entry.",
        '"""',
        "",
        "# Rounds whose CORRECTNESS_r*.json this map ingested.  The rotation",
        "# guard allows exactly ONE newer un-ingested file (the driver drops",
        "# it after the round's final commit); >=2 behind is neglect and fails.",
        f"INGESTED_ROUNDS: tuple[int, ...] = {tuple(rounds)!r}",
        "",
        "DRIVER_HISTORY: dict[str, tuple[int, int]] = {",
    ]
    for name in sorted(hist):
        lines.append(f"    {name!r}: {hist[name]!r},")
    lines.extend(
        [
            "}",
            "",
            "# Back-compat view: last fully-green round only (-1 = never green).",
            "DRIVER_LAST_GREEN: dict[str, int] = {",
            "    name: lg for name, (lg, _lc) in DRIVER_HISTORY.items()",
            "}",
            "",
            "# Content signature (oracle SQL + callable source, sha256) of the form",
            "# the driver last checked — stamped at rotate time, refreshed only for",
            "# queries checked in a newly-ingested round.  _ordered_names() ranks a",
            "# green whose live signature drifted from its stamp with the reds.",
            "DRIVER_SIGNATURES: dict[str, str] = {",
        ]
    )
    for name in sorted(sigs):
        lines.append(f"    {name!r}: {sigs[name]!r},")
    lines.extend(["}", ""])
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    reds = sorted(n for n, (lg, lc) in hist.items() if lg < 0 or lc > lg)
    print(f"wrote {OUT}: {len(hist)} checked queries, red-or-regressed={reds}")


if __name__ == "__main__":
    main()
