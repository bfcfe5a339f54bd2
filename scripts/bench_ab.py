"""Same-day bench A/B — the ONLY valid cross-commit perf evidence on
this host (SCALE.md r12: cross-round local totals drift ±30% with the
machine era; the "r11 bench regression" dissolved under this protocol).

Clones the repo at a reference commit into /tmp, then alternates
ref/HEAD bench runs (fresh process each, idle machine assumed) and
prints the per-query best-of ratio table. A median ratio inside
[0.9, 1.1] on the common query set means NO code-level change; a
skewed subset names the queries to bisect.

Usage: python scripts/bench_ab.py <ref_commit> [n_rounds=2]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_once(workdir: str, tag: str, i: int) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=workdir,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip().splitlines()[-1]
    rec = json.loads(out)
    print(f"{tag} run {i}: {rec['value']} s", flush=True)
    return rec


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: bench_ab.py <ref_commit> [n_rounds]")
    ref = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    clone = tempfile.mkdtemp(prefix=f"bench_ab_{ref[:8]}_")
    subprocess.run(["git", "clone", "-q", REPO, clone], check=True)
    subprocess.run(["git", "-C", clone, "checkout", "-q", ref], check=True)
    runs = {"ref": [], "head": []}
    # alternate arms so era drift WITHIN the session cancels
    for i in range(n_rounds):
        runs["ref"].append(bench_once(clone, f"ref({ref[:8]})", i))
        runs["head"].append(bench_once(REPO, "HEAD", i))
    best = {}
    for arm in ("ref", "head"):
        qs = {}
        for rec in runs[arm]:
            for k, v in rec["queries"].items():
                qs[k] = min(v, qs.get(k, float("inf")))
        best[arm] = qs
    common = sorted(set(best["ref"]) & set(best["head"]))
    ratios = {
        k: best["head"][k] / best["ref"][k]
        for k in common
        if best["ref"][k] > 0
    }
    med = statistics.median(ratios.values())
    print(json.dumps({
        "ref": ref,
        "n_common": len(common),
        "median_ratio": round(med, 3),
        "mean_ratio": round(statistics.fmean(ratios.values()), 3),
        "sum_ref": round(sum(best["ref"][k] for k in common), 1),
        "sum_head": round(sum(best["head"][k] for k in common), 1),
        "worst": {
            k: round(v, 2)
            for k, v in sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
        },
        "best": {
            k: round(v, 2)
            for k, v in sorted(ratios.items(), key=lambda kv: kv[1])[:8]
        },
        "verdict": (
            "no code-level change" if 0.9 <= med <= 1.1 else "bisect the skew"
        ),
    }))


if __name__ == "__main__":
    main()
