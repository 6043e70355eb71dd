"""Print the driver-attestation backlog: registry queries that have
never appeared in any committed CORRECTNESS_r*.json record (judge r10
stretch #8 — rotation planning without archaeology).

Usage: python tools/attestation_backlog.py [--head]

``--head`` restricts the report to the current driver-recorded head
(the first _DRIVER_RECORD_CAP registry entries) — the set the NEXT
driver run will actually attest; without it the full registry backlog
prints. Exit status 0 always (a reporting tool, not a gate).
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
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        seen.update(json.load(open(f)).keys())
    reg = list(harness.registry())
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
