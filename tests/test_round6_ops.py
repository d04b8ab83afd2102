"""Semantic contracts for the round-6 batch-1 operators: KMV sketch
estimator behavior, autocorrelation formula, ordered-funnel
monotonicity, skyline dominance, Matryoshka rerank fidelity, and the
fixed-point power-iteration matvec — each validated independently
(numpy/pandas recomputation on sf0.001) so the DuckDB oracle gate is
not the only line of defense.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

from quick_and_easy_vectordb_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return QUERIES[name].fn(spark, SF).toPandas()


def test_kmv_small_set_falls_back_to_exact(spark):
    """Every type with fewer than k=64 distinct users must report the
    exact count as its estimate (the sketch IS the full set), and no
    estimate may be produced from more than k retained values."""
    out = _run(spark, "ev_kmv_distinct_estimate")
    assert (out["kmv_k"] <= 64).all()
    small = out[out["n_exact"] < 64]
    for _, r in small.iterrows():
        assert r["kmv_k"] == r["n_exact"]
        assert r["kmv_estimate"] == float(r["n_exact"])


def test_kmv_estimate_error_is_bounded(spark):
    """For saturated sketches the KMV relative standard deviation is
    ~1/sqrt(k-2) ≈ 12.7%; 5 rsd is a generous determinism-safe bound
    (the data is fixed, so this can never flake — it documents that
    the estimator is actually estimating)."""
    out = _run(spark, "ev_kmv_distinct_estimate")
    sat = out[out["n_exact"] >= 64]
    for _, r in sat.iterrows():
        rel_err = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel_err < 5 / math.sqrt(62)


def test_kmv_matches_numpy_bottom_k(spark):
    """The retained k-th minimum (and hence the estimate) must equal a
    direct single-machine bottom-k over md5 hashes — proving the
    salted two-phase merge loses nothing."""
    ev = pd.read_parquet(f"{SF}/events.parquet")
    out = _run(spark, "ev_kmv_distinct_estimate").set_index("event_type")
    for etype, grp in ev.groupby("event_type"):
        users = sorted(grp["user_id"].unique())
        hs = sorted(
            int(hashlib.md5(f"kmv-v1:{u}".encode()).hexdigest()[:12], 16)
            for u in users
        )
        k = min(64, len(hs))
        want = (
            float(k)
            if k < 64
            else 63 * (16**12) / float(hs[63])
        )
        got = out.loc[etype, "kmv_estimate"]
        assert got == want, (etype, got, want)


def test_autocorr_matches_numpy(spark):
    """r1 must equal the classic lag-1 sample autocorrelation computed
    directly with numpy over the same hourly series."""
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hr"] = ev["ts"].astype("datetime64[us]").astype("int64") // (3600 * 10**6)
    out = _run(spark, "ev_autocorr_lag1").set_index("event_type")
    for etype, grp in ev.groupby("event_type"):
        x = grp.groupby("hr").size().sort_index().to_numpy(dtype=float)
        c = x - x.mean()
        want = float((c[:-1] * c[1:]).sum() / (c * c).sum())
        got = out.loc[etype, "r1"]
        assert abs(got - want) < 1e-9, (etype, got, want)
        assert out.loc[etype, "n_hours"] == len(x)


def test_ordered_funnel_matches_pandas(spark):
    """Stage counts must match an independent pandas implementation of
    the strictly-ordered, 1-hour-bounded funnel, and be monotone."""
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    hz = 3_600_000_000
    m1 = (
        ev[ev.event_type == "view"].groupby("user_id")["us"].min().rename("m1")
    )
    clicks = ev[ev.event_type == "click"].join(m1, on="user_id", how="inner")
    clicks = clicks[(clicks.us >= clicks.m1) & (clicks.us <= clicks.m1 + hz)]
    m2 = clicks.groupby("user_id").agg(m2=("us", "min"), m1=("m1", "min"))
    buys = ev[ev.event_type == "purchase"].join(m2, on="user_id", how="inner")
    buys = buys[(buys.us >= buys.m2) & (buys.us <= buys.m1 + hz)]
    m3 = buys.groupby("user_id").agg(m3=("us", "min"), m1=("m1", "min"))

    out = _run(spark, "ev_ordered_funnel_windowed").iloc[0]
    assert out["users_viewed"] == len(m1)
    assert out["users_clicked"] == len(m2)
    assert out["users_converted"] == len(m3)
    assert out["total_convert_us"] == int((m3["m3"] - m3["m1"]).sum())
    assert out["users_viewed"] >= out["users_clicked"] >= out["users_converted"]


def test_skyline_is_exactly_the_undominated_set(spark):
    """Brute-force dominance over all customers: the query's output
    must be precisely the set of undominated (n_orders, acctbal)
    customers — no false keeps, no false drops."""
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    n = orders.groupby("o_custkey").size()
    cust["n_orders"] = cust["c_custkey"].map(n).fillna(0).astype(int)
    pts = cust[["c_custkey", "n_orders", "c_acctbal"]].to_numpy()
    keep = set()
    no = pts[:, 1].astype(float)
    bal = pts[:, 2].astype(float)
    for i in range(len(pts)):
        dominated = (
            (no >= no[i])
            & (bal >= bal[i])
            & ((no > no[i]) | (bal > bal[i]))
        ).any()
        if not dominated:
            keep.add(int(pts[i, 0]))
    got = set(_run(spark, "rel_skyline_frontier")["c_custkey"].astype(int))
    assert got == keep


def test_matryoshka_scores_are_true_dots(spark):
    """Both the prefix score and the reranked similarity must equal
    numpy dot products over the corresponding slices, and rerank must
    order by the FULL dot (not the prefix)."""
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC

    q = np.array(QUERY_VEC)
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    out = _run(spark, "vdb_matryoshka_prefix_search")
    assert len(out) == 5
    sims = out["similarity"].to_numpy()
    assert (np.diff(sims) <= 1e-15).all()  # descending by full dot
    for _, r in out.iterrows():
        v = vecs[int(r["vec_id"])]
        assert abs(r["prefix_score"] - float(v[:16] @ q[:16])) < 1e-9
        assert abs(r["similarity"] - float(v @ q)) < 1e-9


def test_power_iteration_matches_numpy_exactly(spark):
    """y_fixed is an integer aggregate of floor-quantized terms — the
    numpy recomputation must match EXACTLY (no tolerance), proving
    order-independence of the fixed-point sum."""
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC

    q = np.array(QUERY_VEC)
    V = np.stack([np.array(v, dtype=np.float64) for v in emb["embedding"]])
    d = V @ q
    terms = np.floor(V * d[:, None] * 16777216.0).astype(np.int64)
    want = terms.sum(axis=0)
    out = _run(spark, "vdb_power_iteration_step").sort_values("pos")
    assert list(out["y_fixed"]) == list(want)


def test_vocab_growth_totals_and_monotonicity(spark):
    """Final cumulative counts must equal direct pandas totals; both
    cumulative columns must be non-decreasing."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    norm = (
        docs["text"]
        .str.lower()
        .map(lambda s: re.sub(r"\s+", " ", s).strip())
    )
    tok_lists = [t.split(" ") for t in norm if t != ""]
    all_tokens = [t for lst in tok_lists for t in lst]
    out = _run(spark, "text_vocab_growth").sort_values("bucket")
    assert out["cum_types"].iloc[-1] == len(set(all_tokens))
    assert out["cum_tokens"].iloc[-1] == len(all_tokens)
    assert out["cum_types"].is_monotonic_increasing
    assert out["cum_tokens"].is_monotonic_increasing
    assert (out["new_types"] >= 0).all()
