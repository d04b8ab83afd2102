"""SURVEY_INDEX.md freshness pin (VERDICT r11 item 8): the committed
generated index must match what the live registry would emit — a new
query without `python tools/survey_crosscheck.py --index` re-run, or a
hand edit to the generated file, fails here."""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_crosscheck_build_index():
    # The tool runs its CLI at import; load it as a module with argv
    # neutralized so only the functions come in.
    import sys

    path = os.path.join(_REPO, "tools", "survey_crosscheck.py")
    spec = importlib.util.spec_from_file_location("survey_crosscheck", path)
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = ["survey_crosscheck.py", "--index"]
    old_index = os.path.join(_REPO, "SURVEY_INDEX.md")
    before = open(old_index).read()
    try:
        try:
            spec.loader.exec_module(mod)
        except SystemExit:
            pass
    finally:
        sys.argv = old_argv
        # The CLI rewrote the file; restore and compare out-of-band.
        after = open(old_index).read()
        with open(old_index, "w") as f:
            f.write(before)
    return mod, before, after


def test_survey_index_is_fresh():
    mod, committed, regenerated = _load_crosscheck_build_index()
    assert committed == regenerated, (
        "SURVEY_INDEX.md is stale — run "
        "`python tools/survey_crosscheck.py --index` and commit"
    )


def test_survey_index_covers_every_query():
    from quick_and_easy_vectordb_spark.queries import QUERIES

    idx = open(os.path.join(_REPO, "SURVEY_INDEX.md")).read()
    missing = [n for n in QUERIES if f"`{n}`" not in idx]
    assert not missing, f"queries absent from SURVEY_INDEX.md: {missing[:5]}"
