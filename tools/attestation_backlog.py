"""Print the driver-attestation backlog: registry queries that have
never appeared in any committed CORRECTNESS_r*.json record (judge r10
stretch #8 — rotation planning without archaeology).

Usage: python tools/attestation_backlog.py [--head] [--stale[=N]]

``--head`` restricts the report to the current driver-recorded head
(the first _DRIVER_RECORD_CAP registry entries) — the set the NEXT
driver run will actually attest; without it the full registry backlog
prints. ``--stale[=N]`` instead prints the N (default 50)
oldest-attested registry queries with their last-attested round, in
registry order within each round — exactly the list the standing
rotation rule's filler block wants (round 13 made this a per-round
step; the ad-hoc script it replaces lived only in the session log).
Exit status 0 always (a reporting tool, not a gate).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_spark import harness  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    reg = list(harness.registry())
    stale_arg = next(
        (a for a in sys.argv if a == "--stale" or a.startswith("--stale=")),
        None,
    )
    if stale_arg:
        n = int(stale_arg.split("=", 1)[1]) if "=" in stale_arg else 50
        ranked = sorted(
            ((k, latest[k]) for k in reg if k in latest),
            key=lambda kv: kv[1],
        )
        print(f"registry={len(reg)} attested={len(ranked)} stalest {n}:")
        for k, r in ranked[:n]:
            print(f"r{r:02d}  {k}")
        return
    seen = set(latest)
    scope = reg[: harness._DRIVER_RECORD_CAP] if "--head" in sys.argv else reg
    backlog = [k for k in scope if k not in seen]
    print(
        f"registry={len(reg)} attested={len(seen & set(reg))} "
        f"scope={'head' if '--head' in sys.argv else 'all'} "
        f"backlog={len(backlog)}"
    )
    for k in backlog:
        print(k)


if __name__ == "__main__":
    main()
