"""Regenerate _CHECK_PRIORITY in queries/__init__.py.

The driver's per-round oracle gate checks a ~50-entry PREFIX of the
registry in iteration order, so _CHECK_PRIORITY rotates verification
coverage: queries with no CORRECTNESS row yet come first, then every
registered query ordered by (latest green driver round ascending,
name). Run after registering new queries or after a new
CORRECTNESS_r{N}.json lands:

    python tools/gen_check_priority.py

Names listed in the hand-maintained "round additions" block at the top
of the generated list (anything between the header comment and the
first "(last driver-checked ...)" marker) are preserved ahead of the
staleness ordering, so brand-new queries keep their first-driver-row
slot even before any evidence file mentions them.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(
    REPO, "quick_and_easy_vectordb_spark", "queries", "__init__.py"
)


def latest_evidence() -> dict[str, int]:
    ev: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for q in json.load(open(f)):
            ev[q] = max(ev.get(q, 0), rnd)
    return ev


def main() -> int:
    sys.path.insert(0, REPO)
    from quick_and_easy_vectordb_spark.queries import QUERIES

    ev = latest_evidence()
    src = open(INIT).read()
    start = src.index("_CHECK_PRIORITY = [")
    end = src.index("]", start) + 1
    block = src[start:end]

    # Preserve the hand-maintained new-additions prefix: quoted names
    # appearing before the first staleness marker comment.
    first_marker = re.search(r"#\s*\((?:last driver-checked|no driver)",
                             block)
    head = block[: first_marker.start()] if first_marker else block
    pinned = re.findall(r'"([a-z0-9_]+)"', head)
    pinned = [n for n in pinned if n in QUERIES]

    rest = sorted(
        (n for n in QUERIES if n not in pinned),
        key=lambda n: (ev.get(n, 0), n),
    )

    lines = ["_CHECK_PRIORITY = [",
             "    # -- round additions (need first driver rows) --"]
    for n in pinned:
        lines.append(f'    "{n}",')
    cur = None
    for n in rest:
        r = ev.get(n, 0)
        if r != cur:
            cur = r
            lines.append(
                f"    # (last driver-checked round {r})" if r
                else "    # (no driver row yet)"
            )
        lines.append(f'    "{n}",')
    lines.append("]")
    open(INIT, "w").write(src[:start] + "\n".join(lines) + src[end:])
    n_stale = sum(1 for n in QUERIES if ev.get(n, 0) <= 3)
    print(
        f"regenerated: {len(pinned)} pinned + {len(rest)} by staleness"
        f" ({n_stale} with evidence <= round 3)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
