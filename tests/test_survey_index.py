"""SURVEY_INDEX.md freshness pin (VERDICT r11 item 8): the committed
generated index must match what the live registry would emit — a new
query without `python tools/survey_crosscheck.py --index` re-run, or a
hand edit to the generated file, fails here."""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_index() -> str:
    # The tool's CLI is under a __main__ guard, so importing it is
    # side-effect-free; call build_index() directly.
    path = os.path.join(_REPO, "tools", "survey_crosscheck.py")
    spec = importlib.util.spec_from_file_location("survey_crosscheck", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build_index()


def test_survey_index_is_fresh():
    committed = open(os.path.join(_REPO, "SURVEY_INDEX.md")).read()
    assert committed == _build_index(), (
        "SURVEY_INDEX.md is stale — run "
        "`python tools/survey_crosscheck.py --index` and commit"
    )


def test_survey_index_covers_every_query():
    from quick_and_easy_vectordb_spark.queries import QUERIES

    idx = open(os.path.join(_REPO, "SURVEY_INDEX.md")).read()
    missing = [n for n in QUERIES if f"`{n}`" not in idx]
    assert not missing, f"queries absent from SURVEY_INDEX.md: {missing[:5]}"
