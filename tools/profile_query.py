"""Per-operator profiling for one or more registered queries.

Runs each named query end-to-end with the noop sink (guide §1.4) in a
UI-enabled session, then pulls the executed plan's per-node metrics
from the Spark REST API (/api/v1/.../sql) so optimization work starts
from measurements, not guesses (guide §1.1).

Usage:  python tools/profile_query.py <query> [...] [--sf DIR] [--runs N]

Prints, per query and run: wall seconds, then the top plan nodes by
metric time (whole-stage codegen durations, shuffle write/fetch times,
Python eval times, rows). The last run's node table is shown (warm JIT,
the steady-state shape — the same reasoning as bench.py's best-of-N).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quick_and_easy_vectordb_spark.queries import QUERIES  # noqa: E402
from quick_and_easy_vectordb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
UI_PORT = int(os.environ.get("QEV_PROFILE_UI_PORT", "4047"))


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.load(r)


def _ms(s: str) -> float:
    """Parse a Spark metric value like '1.2 s', '340 ms', 'total (min, med, max...)' heads."""
    s = s.strip()
    try:
        if s.endswith(" ms"):
            return float(s[:-3])
        if s.endswith(" s"):
            return float(s[:-2]) * 1000.0
        if s.endswith(" m"):
            return float(s[:-2]) * 60000.0
    except ValueError:
        return 0.0
    return 0.0


def profile(name: str, sf_dir: str, runs: int) -> None:
    spark = get_spark(
        "qev-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qd = QUERIES[name]
    walls = []
    for i in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
        t0 = time.perf_counter()
        qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls.append(time.perf_counter() - t0)
    app_id = spark.sparkContext.applicationId
    execs = _api(f"applications/{app_id}/sql?length=1000")
    # every execution belonging to this query's final (warm) run — a
    # query function may fire helper actions (.first(), broadcasts)
    # before the final noop write; each is its own SQL execution.
    tag = f"profile:{name}#{runs - 1}"
    mine = [e for e in execs if e.get("description", "") == tag]
    print(f"\n=== {name}  walls: {[round(w, 3) for w in walls]} s")
    if not mine:
        print("  (no SQL executions captured)")
        return
    print(f"  final run {walls[-1]:.3f}s across {len(mine)} SQL execution(s):")
    for e in mine:
        dur = e.get("duration", 0) / 1000.0
        detail_e = _api(
            f"applications/{app_id}/sql/{e['id']}?details=true&planDescription=false"
        )
        rows = []
        for node in detail_e.get("nodes", []):
            label = node.get("nodeName", "?")
            tmax = 0.0
            detail = []
            for m in node.get("metrics", []):
                mn, mv = m.get("name", ""), str(m.get("value", ""))
                head = mv.split("(")[0].strip()
                t = _ms(head)
                if t and ("time" in mn or "duration" in mn):
                    tmax = max(tmax, t)
                    detail.append(f"{mn}={head}")
                elif mn in (
                    "number of output rows",
                    "records read",
                    "shuffle records written",
                ):
                    detail.append(f"{mn}={head}")
            rows.append((tmax, node.get("nodeId"), label, "; ".join(detail[:4])))
        rows.sort(reverse=True)
        print(f"  -- exec {e['id']}: {dur:.3f}s  top nodes:")
        for tmax, nid, label, detail in rows[:12]:
            if tmax == 0.0 and not detail:
                continue
            print(f"  {tmax / 1000.0:8.3f}s  [{nid:>3}] {label:42s} {detail}")


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = SF_DIR
    runs = 3
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    for name in argv:
        profile(name, sf_dir, runs)


if __name__ == "__main__":
    main()
