"""Calibrated cross-round per-query comparison (VERDICT r13 item 2).

Usage: python tools/calib_table.py BASE.json NEW.json [NEW2.json ...]

Each file is either a driver BENCH_r{N}.json (with a `parsed` record
or a raw headline dict) or a local bench stdout capture (DETAIL line +
headline JSON line). For every query present in both the base and any
new run, prints:

    raw seconds  — min over the new runs (in-suite min; isolated min
                   where available, which supersedes in-suite)
    norm         — seconds / calib_32t_s of its own run (the
                   host-speed-free number; comparisons across rounds
                   should use THIS)
    ratio        — new norm / base norm; >1.30 is flagged for
                   investigation per the r13 verdict

The base's normalized value uses the base run's own calibration, so a
fast host in one round and a slow host in another cancel out.
"""

from __future__ import annotations

import json
import sys


def load_run(path: str) -> dict:
    """Return {'queries': {...}, 'isolated': {...}, 'calib': float}."""
    text = open(path).read()
    rec = None
    # Try plain JSON (driver BENCH file or single headline line).
    try:
        d = json.loads(text)
        rec = d.get("parsed", d)
    except json.JSONDecodeError:
        # Local stdout capture: the headline is the LAST json line.
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                rec = json.loads(line)
                break
    if rec is None or "queries" not in rec:
        raise SystemExit(f"{path}: no bench record found")
    return {
        "queries": rec["queries"],
        "isolated": rec.get("isolated", {}),
        "calib": rec.get("calib_32t_s") or 0.0,
        "label": path,
    }


def best(run: dict, q: str) -> float | None:
    """Isolated minimum supersedes in-suite (it is load-gated and
    min-of-4); fall back to the in-suite best-of-N."""
    if q in run["isolated"]:
        return run["isolated"][q]
    return run["queries"].get(q)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base = load_run(sys.argv[1])
    news = [load_run(p) for p in sys.argv[2:]]
    if not base["calib"]:
        raise SystemExit("base run carries no calib_32t_s")
    for n in news:
        if not n["calib"]:
            raise SystemExit(f"{n['label']} carries no calib_32t_s")

    rows = []
    for q in sorted(base["queries"]):
        b = best(base, q)
        cands = [
            (best(n, q), n["calib"]) for n in news if best(n, q) is not None
        ]
        if b is None or not cands:
            continue
        # Pick the new observation with the smallest NORMALIZED value
        # (min over runs, each under its own calibration).
        ns, ncal = min(cands, key=lambda t: t[0] / t[1])
        bn = b / base["calib"]
        nn = ns / ncal
        rows.append((q, b, bn, ns, nn, nn / bn))

    print(f"| query | base s | base norm | new s | new norm | ratio |")
    print("|---|---|---|---|---|---|")
    flagged = 0
    for q, b, bn, ns, nn, r in sorted(rows, key=lambda t: -t[5]):
        flag = " **>1.30**" if r > 1.30 else ""
        if r > 1.30:
            flagged += 1
        print(
            f"| {q} | {b:.2f} | {bn:.1f} | {ns:.2f} | {nn:.1f} "
            f"| {r:.2f}x{flag} |"
        )
    tot_b = sum(t[2] for t in rows)
    tot_n = sum(t[4] for t in rows)
    print(
        f"\ncommon queries: {len(rows)}; total norm {tot_b:.1f} -> "
        f"{tot_n:.1f} = {tot_n / tot_b:.2f}x; flagged >1.30x: {flagged}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
