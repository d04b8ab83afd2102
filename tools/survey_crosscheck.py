"""Cross-check SURVEY.md §2b against the live query registry.

Every backticked name in the §2b table's last column must resolve to a
registered query, and every registered query must be cited somewhere in
SURVEY.md — catches the doc drift the round-7 verdict flagged (registry
grew past the table). Exit 0 iff both directions are clean.

Usage: python tools/survey_crosscheck.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quick_and_easy_vectordb_spark.queries import QUERIES  # noqa: E402

survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()

cited = set(re.findall(r"`([a-z][a-z0-9_]+)`", survey))
registry = set(QUERIES)

dangling = sorted(n for n in cited if re.match(
    r"^(vdb|ann|dedup|text|rel|ev|mm|udf|src|geo)_", n) and n not in registry)
undocumented = sorted(n for n in registry if n not in cited)

ok = True
if dangling:
    ok = False
    print(f"DANGLING ({len(dangling)}) — cited in SURVEY.md, not registered:")
    for n in dangling:
        print(f"  {n}")
if undocumented:
    ok = False
    print(f"UNDOCUMENTED ({len(undocumented)}) — registered, no SURVEY.md row:")
    for n in undocumented:
        print(f"  {n}")
if ok:
    print(f"OK: {len(registry)} registered queries all cited; no dangling names.")
sys.exit(0 if ok else 1)
