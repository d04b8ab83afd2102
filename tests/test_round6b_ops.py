"""Semantic contracts for the round-6 continuation operators: bitmap
distinct algebra, rolling OR-merge windows, the hour-decomposed
interval sweep, CUSUM argmax, KMV set algebra, rational Zipf fit, soft
dedup mass conservation, mutual-kNN symmetry, int4 reconstruction
error, silence-trim bounds, and schema-merge row accounting — each
validated by an independent numpy/pandas recomputation on sf0.001 so
the DuckDB oracle gate is not the only line of defense.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from quick_and_easy_vectordb_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _run(spark, name):
    return QUERIES[name].fn(spark, SF).toPandas()


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev["ts"].astype("int64") // (
        1000 if ev["ts"].dtype.str.endswith("ns]") else 1
    )
    return ev


def test_bitmap_daily_actives_equals_nunique(spark):
    """The word-bucketed BIT_OR/popcount pipeline must reproduce the
    naive per-day distinct-user count exactly."""
    out = _run(spark, "ev_bitmap_daily_actives").set_index("day")
    ev = _events()
    ev["day"] = ev["us"] // DAY_US
    exp = ev.groupby("day")["user_id"].nunique()
    assert len(out) == len(exp)
    for day, n in exp.items():
        assert out.loc[day, "n_active"] == n
        assert out.loc[day, "n_words"] == ev[ev["day"] == day]["user_id"].floordiv(
            32
        ).nunique()


def test_rolling_wau_equals_trailing_union(spark):
    """Each day's OR-merged 7-day bitmap popcount must equal the
    distinct-user count of the trailing 7 calendar days."""
    out = _run(spark, "ev_rolling_wau_bitmap").set_index("day")
    ev = _events()
    ev["day"] = ev["us"] // DAY_US
    days = sorted(ev["day"].unique())
    assert sorted(out.index) == days
    for d in days:
        users = ev[(ev["day"] >= d - 6) & (ev["day"] <= d)]["user_id"].nunique()
        assert out.loc[d, "wau_7d"] == users


def _brute_sessions(ev: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for uid, grp in ev.sort_values(["us", "event_id"]).groupby("user_id"):
        start = prev = None
        for us in grp["us"]:
            if prev is None or us - prev > 1_800_000_000:
                if start is not None:
                    rows.append((start, prev))
                start = us
            prev = us
        rows.append((start, prev))
    return pd.DataFrame(rows, columns=["s_us", "e_us"])


def test_max_concurrency_equals_global_sweep(spark):
    """The hour-decomposed sweep (carry-in + per-hour prefix) must
    equal a single global brute-force sweep over all session
    intervals."""
    out = _run(spark, "ev_max_concurrent_sessions").set_index("day")
    sess = _brute_sessions(_events())
    deltas = sorted(
        [(s, 1) for s in sess["s_us"]] + [(e + 1, -1) for e in sess["e_us"]]
    )
    # merge deltas at identical instants, then walk
    merged: dict[int, int] = {}
    for t, d in deltas:
        merged[t] = merged.get(t, 0) + d
    run = 0
    peak: dict[int, int] = {}
    times = sorted(merged)
    for i, t in enumerate(times):
        run += merged[t]
        # the concurrency value `run` holds on [t, next_t): attribute it
        # to every day that interval touches
        nxt = times[i + 1] if i + 1 < len(times) else t + 1
        for day in range(t // DAY_US, (nxt - 1) // DAY_US + 1):
            peak[day] = max(peak.get(day, 0), run)
    # the spark query only emits days that have a delta point or carry
    for day in out.index:
        assert out.loc[day, "peak_concurrent"] == peak[day], day


def test_cusum_peak_is_argmax(spark):
    """cp_hour must be the earliest hour attaining the maximum
    |cumulative deviation| when recomputed with exact integer
    arithmetic on micro-scaled values."""
    out = _run(spark, "ev_cusum_changepoint").set_index("event_type")
    ev = _events()
    ev["hr"] = ev["us"] // HOUR_US
    # decimal(30,10) cast of a double rounds half-up at 10 dp; value
    # has ~6 significant digits so scaling by 1e10 and rounding matches
    ev["v10"] = (ev["value"] * 1e10).round().astype("int64")
    for etype, grp in ev.groupby("event_type"):
        h = grp.groupby("hr")["v10"].sum().sort_index()
        n = len(h)
        total = h.sum()
        dev = h * n - total
        cusum = dev.cumsum()
        mx = cusum.abs().max()
        cp = cusum.abs().idxmax()  # pandas idxmax returns FIRST max
        assert out.loc[etype, "n_hours"] == n
        assert out.loc[etype, "cp_hour"] == cp
        assert abs(out.loc[etype, "max_abs_cusum"] - mx / 1e10) < 1e-6 * max(
            1.0, mx / 1e10
        )


def test_kmv_set_ops_exact_and_estimates(spark):
    """Exact union/intersection must match pandas; the union estimate
    must obey the same bottom-k closure a direct sketch of the union
    would produce; inclusion-exclusion must tie the three estimates."""
    out = _run(spark, "ev_kmv_set_ops")
    ev = _events()
    sets = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    for _, r in out.iterrows():
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["exact_union"] == len(a | b)
        assert r["exact_intersect"] == len(a & b)
        # direct KMV of the union from scratch
        hs = sorted(
            int(hashlib.md5(f"kmv-v1:{u}".encode()).hexdigest()[:12], 16)
            for u in (a | b)
        )
        k = 64
        if len(hs) < k:
            direct = float(len(hs))
        else:
            direct = (k - 1) * 16**12 / hs[k - 1]
        assert abs(r["est_union"] - direct) < 1e-9 * max(1.0, direct)
        assert (
            abs(
                (r["est_union"] + r["est_intersect"])
                - (r["est_union"] * (1 + r["jaccard_est"]))
            )
            < 1e-6
        )


def test_zipf_fit_exact_recompute(spark):
    """Integer recomputation of the rational Zipf deviation."""
    out = _run(spark, "text_zipf_fit").set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["norm"] = (
        docs["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    for lang, grp in docs.groupby("lang"):
        toks = grp["norm"].str.split(" ").explode()
        freq = toks.value_counts()
        assert out.loc[lang, "n_distinct"] == len(freq)
        top = sorted(
            freq.items(), key=lambda kv: (-kv[1], kv[0])
        )[:20]
        f1 = top[0][1]
        dev = sum(abs((r + 1) * f - f1) for r, (_, f) in enumerate(top))
        assert out.loc[lang, "f1"] == f1
        assert out.loc[lang, "n_top"] == len(top)
        assert abs(out.loc[lang, "zipf_dev"] - dev / (len(top) * f1)) < 1e-12


def test_soft_weight_mass_conservation(spark):
    """Total soft-dedup mass across all (source, cluster_size) cells
    must equal the number of DISTINCT contents — each cluster
    contributes exactly 1 regardless of copy count."""
    out = _run(spark, "dedup_soft_weight")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    norm = docs["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    n_clusters = norm.nunique()
    assert abs(out["soft_weight_total"].sum() - n_clusters) < 1e-6
    assert out["n_docs"].sum() == len(docs)


def test_reciprocal_pairs_brute_force(spark):
    """Mutual top-3 pairs recomputed with numpy cosine must match."""
    out = _run(spark, "vdb_reciprocal_knn_pairs").set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    sub = emb[emb["vec_id"] % 7 == 0]
    total_pairs = 0
    for label, grp in sub.groupby("label"):
        ids = grp["vec_id"].to_numpy()
        m = np.stack(grp["embedding"].to_numpy()).astype("float64")
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ m.T) / np.outer(norms, norms)
        np.fill_diagonal(sims, -np.inf)
        edges = set()
        for i in range(len(ids)):
            order = sorted(
                range(len(ids)), key=lambda j: (-sims[i, j], ids[j])
            )[:3]
            for j in order:
                edges.add((ids[i], ids[j]))
        mutual = {
            (a, b) for (a, b) in edges if a < b and (b, a) in edges
        }
        if mutual:
            assert out.loc[label, "n_mutual_pairs"] == len(mutual)
            total_pairs += len(mutual)
    assert total_pairs == out["n_mutual_pairs"].sum()


def test_int4_reconstruction_error_bound(spark):
    """Midpoint reconstruction error per dim is at most span/32 (half
    a 16-level bin), and the top-5 must match a numpy recomputation of
    the full quantize/dequantize/score pipeline."""
    out = _run(spark, "ann_int4_search")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    mn, mx = m.min(axis=0), m.max(axis=0)
    span = mx - mn
    codes = np.minimum(15.0, np.floor((m - mn) * 16.0 / np.where(span > 0, span, 1)))
    recon = np.where(span > 0, mn + (codes + 0.5) * span / 16.0, mn)
    assert (np.abs(recon - m) <= span / 32 + 1e-12).all()
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC

    scores = recon @ np.array(QUERY_VEC)
    ids = emb["vec_id"].to_numpy()
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:5]
    assert list(out["vec_id"]) == [ids[i] for i in order]
    for rank, i in enumerate(order):
        assert abs(out["int4_score"].iloc[rank] - scores[i]) < 1e-9


def test_silence_trim_invariants(spark):
    """Trim bounds are consistent; a direct numpy recomputation of the
    synthetic ramp matches for every clip."""
    out = _run(spark, "mm_audio_silence_trim")
    for _, r in out.iterrows():
        doc_id = int(r["doc_id"])
        n = 64 + doc_id % 64
        s = ((doc_id * 7 + np.arange(n) * 13) % 4096) - 2048
        idx = np.nonzero(np.abs(s) >= 1024)[0]
        if idx.size:
            assert r["first_loud"] == idx[0]
            assert r["last_loud"] == idx[-1]
            assert r["trimmed_len"] == idx[-1] - idx[0] + 1
            assert r["n_loud"] == idx.size
            assert r["n_loud"] <= r["trimmed_len"] <= n
        else:
            assert r["trimmed_len"] == 0 and r["first_loud"] == -1


def test_schema_merge_row_accounting(spark):
    """Rows from the pre-evolution generation surface with NULL value;
    generation sizes add up."""
    out = _run(spark, "src_parquet_schema_merge").iloc[0]
    ev = _events()
    n97 = int((ev["event_id"] % 97 == 0).sum())
    n101 = int((ev["event_id"] % 101 == 0).sum())
    assert out["n_rows"] == n97 + n101
    assert out["n_without_value"] == n97
    assert out["n_with_value"] == n101


def test_phash_hamming_pairs_brute_force(spark):
    """The banded multi-index candidate set must reproduce the naive
    all-pairs <=7 histogram exactly (pigeonhole: <=7 diffs over 8
    bands forces an identical band)."""
    from itertools import combinations

    ph = _run(spark, "mm_image_phash")
    out = _run(spark, "mm_phash_hamming_pairs").set_index("hamming")
    classes = ph.groupby("phash").size()
    hist: dict[int, list[int]] = {}
    for (pa, ca), (pb, cb) in combinations(classes.items(), 2):
        d = sum(1 for x, y in zip(pa, pb) if x != y)
        if d <= 7:
            hist.setdefault(d, [0, 0])
            hist[d][0] += 1
            hist[d][1] += ca * cb
    dup = classes[classes >= 2]
    if len(dup):
        hist.setdefault(0, [0, 0])
        hist[0][0] += len(dup)
        hist[0][1] += int((dup * (dup - 1) // 2).sum())
    assert sorted(out.index) == sorted(hist)
    for d, (ncp, nip) in hist.items():
        assert out.loc[d, "n_class_pairs"] == ncp
        assert out.loc[d, "n_image_pairs"] == nip


def test_stratified_sample_allocation(spark):
    """Allocation is proportional (floor, min 1) and the selected rows
    are exactly the md5-minimal ones per stratum."""
    out = _run(spark, "ev_stratified_sample_alloc")
    ev = _events()
    total = len(ev)
    for etype, grp in ev.groupby("event_type"):
        alloc = max(1, 50 * len(grp) // total)
        sel = out[out["event_type"] == etype]
        assert len(sel) == alloc
        assert (sel["n_alloc"] == alloc).all()
        ranked = sorted(
            grp["event_id"],
            key=lambda i: (hashlib.md5(f"strat-v1:{i}".encode()).hexdigest(), i),
        )[:alloc]
        assert sorted(sel["event_id"]) == sorted(ranked)


def test_mix_rebalance_weights_normalize(spark):
    """weight * actual_share == target_share for every source, and the
    weighted corpus mass equals the original corpus size."""
    out = _run(spark, "text_mix_rebalance_weights")
    k = len(out)
    for _, r in out.iterrows():
        assert abs(r["weight"] * r["actual_share"] - r["target_share"]) < 1e-12
        assert abs(r["target_share"] - 1.0 / k) < 1e-15
    n = out["n_docs"].sum()
    assert abs((out["weight"] * out["n_docs"]).sum() - n) < 1e-6


def test_observe_metrics_match_direct_agg(spark):
    """The CollectMetrics side-channel must equal a direct aggregation
    of the same scan."""
    out = _run(spark, "rel_observe_metrics").iloc[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    assert out["n_orders"] == len(orders)
    assert out["n_big_orders"] == int((orders["o_totalprice"] > 100000).sum())
    assert abs(out["total_price"] - orders["o_totalprice"].sum()) < 1e-4


def test_stream_bitmap_matches_batch_bitmap(spark):
    """The streaming bitmap state must converge to the batch bitmap
    result exactly (OR-idempotence across micro-batches)."""
    streamed = _run(spark, "ev_stream_bitmap_actives").set_index("window_start")
    batch = _run(spark, "ev_bitmap_daily_actives")
    for _, r in batch.iterrows():
        ws = int(r["day"]) * 86400
        assert streamed.loc[ws, "n_active"] == r["n_active"]
        assert streamed.loc[ws, "n_words"] == r["n_words"]
    assert len(streamed) == len(batch)


def test_udtf_analyze_dynamic_width(spark):
    """The same UDTF registration must resolve different output
    schemas for different literal n — the property a fixed returnType
    cannot express."""
    _run(spark, "udf_udtf_analyze")  # registers qev_ngrams
    spark.sql("SELECT 1").collect()
    two = spark.sql(
        "SELECT * FROM qev_ngrams('alpha beta gamma', 2)"
    )
    assert [f.name for f in two.schema.fields] == ["pos", "g1", "g2"]
    rows = sorted(map(tuple, two.collect()))
    assert rows == [(0, "alpha", "beta"), (1, "beta", "gamma")]
    four = spark.sql("SELECT * FROM qev_ngrams('a b c', 4)")
    assert [f.name for f in four.schema.fields] == ["pos", "g1", "g2", "g3", "g4"]
    assert four.count() == 0  # 3 tokens cannot form a 4-gram


def test_scene_cuts_recompute(spark):
    """Frame-intensity deltas recomputed in pure Python must match."""
    out = _run(spark, "mm_video_scene_cuts").set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, drow in docs.head(50).iterrows():
        doc_id, text = int(drow["doc_id"]), drow["text"]
        inten = [
            int(hashlib.md5(f"{text}:{i}".encode()).hexdigest()[:8], 16)
            for i in range(16)
        ]
        cuts = [
            i
            for i in range(1, 16)
            if abs(inten[i] - inten[i - 1]) > (1 << 31)
        ]
        assert out.loc[doc_id, "n_frames"] == 16
        assert out.loc[doc_id, "n_cuts"] == len(cuts)
        assert out.loc[doc_id, "first_cut_idx"] == (cuts[0] if cuts else -1)


def test_kmeans_iterated_matches_numpy_lloyd(spark):
    """Three Lloyd rounds recomputed in numpy with the same
    fixed-point centroid rule must agree on assignments and means."""
    out = _run(spark, "ann_kmeans_iterated")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    from quick_and_easy_vectordb_spark.operators.ann import hyperplane

    cent = {k: np.array(hyperplane(k, 64)) for k in range(4)}
    for _ in range(3):
        d = np.stack(
            [np.sqrt(((m - cent[k]) ** 2).sum(axis=1)) for k in range(4)]
        )
        assign = np.argmin(d, axis=0)  # ties -> lowest index, same rule
        means = {}
        for k in range(4):
            rows = m[assign == k]
            if len(rows):
                fp = np.floor(rows * 1073741824.0).astype("int64").sum(axis=0)
                means[k] = fp.astype("float64") / 1073741824.0 / len(rows)
            else:
                means[k] = cent[k]
        last_sizes = {k: int((assign == k).sum()) for k in range(4)}
        cent = means
    for _, r in out.iterrows():
        k, p = int(r["cluster"]), int(r["pos"])
        assert abs(r["c"] - cent[k][p]) < 1e-9
        assert r["n"] == last_sizes[k]


def test_burst_histogram_brute_force(spark):
    """Per-user sliding 5-minute max recomputed with a two-pointer."""
    out = _run(spark, "ev_burst_detection").set_index("max_burst")
    ev = _events()
    bursts = {}
    for uid, grp in ev.groupby("user_id"):
        ts = sorted(grp["us"])
        best = 0
        for i in range(len(ts)):
            cnt = sum(1 for t in ts if ts[i] <= t <= ts[i] + 299_999_999)
            best = max(best, cnt)
        bursts[uid] = best
    hist = pd.Series(list(bursts.values())).value_counts()
    assert sorted(out.index) == sorted(hist.index)
    for b, n in hist.items():
        assert out.loc[b, "n_users"] == n


def test_csv_and_orc_roundtrips_preserve_rows(spark):
    """Row counts per type survive both format roundtrips."""
    ev = _events()
    per_type = ev.groupby("event_type").size()
    for name in ("src_orc_roundtrip", "src_csv_quoted_roundtrip"):
        out = _run(spark, name).set_index("event_type")
        for t, n in per_type.items():
            assert out.loc[t, "n"] == n


def test_cogroup_covers_one_sided_keys(spark):
    """Keys with events but no orders (and vice versa) must appear
    with the sentinel values — the empty-frame edge."""
    out = _run(spark, "udf_cogroup_apply").set_index("user_id")
    ev_users = set(_events()["user_id"])
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    ord_users = set(orders["o_custkey"])
    assert set(out.index) == ev_users | ord_users
    only_ev = ev_users - ord_users
    if only_ev:
        u = next(iter(only_ev))
        assert out.loc[u, "n_orders"] == 0 and out.loc[u, "last_order_us"] == -1
    only_ord = ord_users - ev_users
    if only_ord:
        u = next(iter(only_ord))
        assert out.loc[u, "n_events"] == 0 and out.loc[u, "first_event_us"] == -1


def test_try_arithmetic_null_populations(spark):
    """Overflow and division-by-zero populations match direct counts."""
    out = _run(spark, "rel_try_arithmetic").iloc[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    limit = (2**63 - 1) // 9007199254740992
    assert out["n_mul_overflow"] == int((orders["o_orderkey"] > limit).sum())
    assert out["n_div_by_zero"] == int((orders["o_orderkey"] % 3 == 1).sum())
    assert out["n_rows"] == len(orders)


def test_postfilter_is_subset_of_global_topk(spark):
    """Post-filter rows are exactly the qualifying members of the
    global top-20, and never more than 20."""
    out = _run(spark, "vdb_postfilter_search")
    assert len(out) <= 20
    assert (out["global_rank"] <= 20).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")
    for vid in out["vec_id"]:
        assert docs.loc[vid, "lang"] == "en"
        assert docs.loc[vid, "n_chars"] >= 200


def test_compaction_reduces_file_count(spark):
    """64 fragment files become 4 compacted files on disk, and the
    compacted table holds every row."""
    out = _run(spark, "src_small_file_compaction").iloc[0]
    assert out["n_files_small"] == 64
    assert out["n_files_compacted"] == 4
    assert out["n_rows"] == len(_events())


def test_band_tuning_monotone_candidates(spark):
    """More bands (shorter rows) can only widen the candidate set of
    any stricter config derived from the same signatures when row
    groups nest (6x2 bands refine 3x4's concatenation? they do not
    nest pairwise in general — but the verified TRUE-PAIR count must
    be monotone non-decreasing in band count, because a pair agreeing
    on a full r-row band agrees on each of its nested shorter
    bands when r is a multiple: 6 divides into 2s, 4 into 2s... here
    (2,6)->(4,3) does not nest, so assert only the extremes, which
    do: a 6-row band (b=2) is two consecutive 3-row bands (b=4) and
    three 2-row bands (b=6))."""
    out = _run(spark, "dedup_band_tuning").set_index("n_bands")
    # any pair caught by b=2 (12=2x6) is caught by b=4 (3-row bands
    # nest in 6-row bands) and by b=6 (2-row bands nest likewise)
    assert out.loc[2, "n_candidates"] <= out.loc[4, "n_candidates"]
    assert out.loc[4, "n_candidates"] <= out.loc[6, "n_candidates"] * 3
    assert out.loc[2, "n_verified"] <= out.loc[4, "n_verified"]
    assert out.loc[2, "n_verified"] <= out.loc[6, "n_verified"]
    for b in (2, 3, 4, 6):
        assert 0 <= out.loc[b, "precision"] <= 1


def test_xml_roundtrip_matches_orc(spark):
    """All three format roundtrips reduce to identical aggregates."""
    xml = _run(spark, "src_xml_roundtrip").set_index("event_type")
    orc = _run(spark, "src_orc_roundtrip").set_index("event_type")
    assert sorted(xml.index) == sorted(orc.index)
    for t in xml.index:
        assert xml.loc[t, "n"] == orc.loc[t, "n"]
        assert xml.loc[t, "sum_users"] == orc.loc[t, "sum_users"]
        assert xml.loc[t, "total_value"] == orc.loc[t, "total_value"]


def test_time_to_convert_brute_force(spark):
    """Latency percentiles recomputed in numpy."""
    out = _run(spark, "ev_funnel_time_to_convert").iloc[0]
    ev = _events()
    lat = []
    viewers = 0
    for uid, grp in ev.groupby("user_id"):
        v = grp[grp["event_type"] == "view"]["us"].min()
        p = grp[grp["event_type"] == "purchase"]["us"].min()
        if pd.notna(v):
            viewers += 1
            if pd.notna(p) and p >= v:
                lat.append(int(p - v))
    assert out["n_viewers"] == viewers
    assert out["n_converted"] == len(lat)
    assert abs(out["p50_latency_us"] - np.percentile(lat, 50)) < 1e-6
    assert abs(out["p90_latency_us"] - np.percentile(lat, 90)) < 1e-6


def test_hnsw_levels_geometric(spark):
    """Level populations follow the 1/16 geometric decay and node
    counts across levels sum to the corpus."""
    out = _run(spark, "ann_hnsw_substrate").set_index("level")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    exp = {}
    for vid in emb["vec_id"]:
        h = hashlib.md5(f"hnsw-v1:{vid}".encode()).hexdigest()
        lvl = len(h) - len(h.lstrip("0"))
        exp[lvl] = exp.get(lvl, 0) + 1
    assert {int(k): int(v) for k, v in out["n_nodes"].items()} == exp
    assert out["n_nodes"].sum() == len(emb)
    if 1 in out.index:
        # upper layers must be sparse: <=2 out-edges per node
        assert out.loc[1, "n_edges"] <= 2 * out.loc[1, "n_nodes"]


def test_novelty_bounds_and_first_doc_rule(spark):
    """Novelty ratios are in (0, 1]; the source containing the
    globally first document has a novel first document (ratio
    contribution 1 for that doc)."""
    out = _run(spark, "text_ngram_novelty")
    assert ((out["novelty_ratio"] > 0) & (out["novelty_ratio"] <= 1)).all()
    assert (out["novel_shingles"] <= out["total_shingles"]).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert out["n_docs"].sum() <= len(docs)


def test_interpolation_is_exact_on_gaps(spark):
    """Interpolated values recomputed from the observed neighbors."""
    out = _run(spark, "ev_gapfill_interpolate")
    obs = out[out["interpolated"] == 0].set_index(["user_id", "day"])[
        "filled_value"
    ]
    for _, r in out[out["interpolated"] == 1].iterrows():
        uid, day = r["user_id"], r["day"]
        udays = sorted(
            d for (u, d) in obs.index if u == uid
        )
        d_prev = max(d for d in udays if d < day)
        d_next = min(d for d in udays if d > day)
        vp, vn = obs[(uid, d_prev)], obs[(uid, d_next)]
        want = vp + (vn - vp) * (day - d_prev) / (d_next - d_prev)
        assert abs(r["filled_value"] - want) < 1e-9


def test_fertility_at_least_one(spark):
    """BPE-ish pre-tokens can only split words, never merge them, so
    fertility >= 1 for any corpus of word-ish text."""
    out = _run(spark, "text_tokenizer_fertility")
    assert (out["fertility"] >= 1.0).all()
    assert (out["bpe_tokens"] >= out["ws_tokens"]).all()


def test_image_keep_best_consistent_with_hamming_zero(spark):
    """Copies counted by keep-best must equal the distance-0 image
    pairs of mm_phash_hamming_pairs."""
    kb = _run(spark, "mm_image_dedup_keep_best")
    dup = kb[kb["n_copies"] >= 2]
    pairs = int((dup["n_copies"] * (dup["n_copies"] - 1) // 2).sum())
    hist = _run(spark, "mm_phash_hamming_pairs").set_index("hamming")
    got = int(hist.loc[0, "n_image_pairs"]) if 0 in hist.index else 0
    assert got == pairs
    assert kb["n_copies"].sum() == 500  # every sf0.001 image classed


def test_null_safe_join_bridge_accounting(spark):
    """The null-safe surplus equals n_null_events when the dim side
    contains a NULL key (every null event matches it exactly once),
    else zero."""
    import json

    out = _run(spark, "rel_null_safe_join").iloc[0]
    ev = _events()
    ks = ev["props"].map(lambda p: json.loads(p).get("k"))
    n_null = int((ks % 7 == 0).sum())
    assert out["n_null_events"] == n_null
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    dim_has_null = bool((docs["n_chars"] % 7 == 0).any())
    expected_bridge = n_null if dim_has_null else 0
    assert out["n_null_bridge"] == expected_bridge


def test_norm_pruning_is_lossless_and_sound(spark):
    """Pruned top-5 equals the plain top-5; every surviving candidate
    satisfies the Cauchy-Schwarz bound; every excluded vector provably
    cannot reach tau."""
    out = _run(spark, "vdb_norm_pruned_search")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC

    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    qv = np.array(QUERY_VEC)
    scores = m @ qv
    ids = emb["vec_id"].to_numpy()
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:5]
    assert list(out["vec_id"]) == [ids[i] for i in order]
    tau = min(scores[i] for i in order)
    xnorm = np.linalg.norm(m, axis=1)
    qnorm = np.linalg.norm(qv)
    must = int((xnorm * qnorm >= tau - 1e-9).sum())
    assert abs(int(out["n_must_scan"].iloc[0]) - must) <= 2  # ulp slack
    # soundness: every vector excluded by the bound scores under tau
    excluded = xnorm * qnorm < tau - 1e-9
    assert (scores[excluded] < tau).all()
    assert out["n_total"].iloc[0] == len(ids)


def test_multi_distinct_uses_expand(spark):
    """Three COUNT(DISTINCT) over different columns must plan as ONE
    aggregation with Expand, not three jobs."""
    from quick_and_easy_vectordb_spark.plans.inspect import formatted_plan

    df = QUERIES["ev_multi_distinct_profile"].fn(spark, SF)
    assert "Expand" in formatted_plan(df)
    out = df.toPandas().set_index("event_type")
    ev = _events()
    for t, grp in ev.groupby("event_type"):
        assert out.loc[t, "n_users"] == grp["user_id"].nunique()
        assert out.loc[t, "n_days"] == (grp["us"] // DAY_US).nunique()


def test_length_percentiles_numpy(spark):
    """Interpolated percentiles vs numpy per language."""
    out = _run(spark, "text_length_percentiles").set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for lang, grp in docs.groupby("lang"):
        v = grp["n_chars"].to_numpy()
        assert abs(out.loc[lang, "p50_chars"] - np.percentile(v, 50)) < 1e-9
        assert abs(out.loc[lang, "p90_chars"] - np.percentile(v, 90)) < 1e-9
        assert out.loc[lang, "min_chars"] == v.min()


def test_pandas_window_udaf_matches_native(spark):
    """The UDAF-over-window result must equal the native windowed SUM
    row for row."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    got = _run(spark, "udf_pandas_window_agg").set_index("event_id")
    ev = load_table(spark, SF, "events").filter(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    want = (
        ev.select(
            "event_id",
            F.sum(F.round("value").cast("long")).over(w).alias("rolling3"),
        )
        .toPandas()
        .set_index("event_id")
    )
    assert got["rolling3"].sort_index().equals(
        want["rolling3"].sort_index().astype("int64")
    )


def test_random_projection_candidates_then_exact(spark):
    """The result is the exact top-5 AMONG the projected top-20 — and
    proj_rank certifies candidate membership."""
    out = _run(spark, "vdb_random_projection_search")
    assert len(out) == 5
    assert (out["proj_rank"] <= 20).all()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC
    from quick_and_easy_vectordb_spark.queries.vector import _rp_planes

    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    qv = np.array(QUERY_VEC)
    planes = np.array(_rp_planes())
    px = m @ planes.T
    qx = planes @ qv
    proj = px @ qx
    ids = emb["vec_id"].to_numpy()
    cand = sorted(range(len(ids)), key=lambda i: (-proj[i], ids[i]))[:20]
    scores = m @ qv
    best = sorted(cand, key=lambda i: (-scores[i], ids[i]))[:5]
    assert list(out["vec_id"]) == [ids[i] for i in best]


def test_tv_distance_bounds_and_pandas(spark):
    """TV in [0,1]; exact integer recompute for two sources."""
    out = _run(spark, "text_source_divergence_tv").set_index("source")
    assert ((out["tv_distance"] >= 0) & (out["tv_distance"] <= 1)).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    norm = docs["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    toks = pd.DataFrame({"source": docs["source"], "tok": norm.str.split(" ")}).explode(
        "tok"
    )
    sc = toks.groupby(["source", "tok"]).size().rename("n").reset_index()
    st = sc.groupby("source")["n"].sum()
    cc = sc.groupby("tok")["n"].sum()
    mt = int(sc["n"].sum())
    for src in list(st.index)[:2]:
        ns = int(st[src])
        scounts = sc[sc["source"] == src].set_index("tok")["n"]
        sn = sum(
            abs(int(scounts.get(tok, 0)) * mt - int(m) * ns)
            for tok, m in cc.items()
        )
        assert abs(out.loc[src, "tv_distance"] - sn / (2.0 * ns * mt)) < 1e-12
        assert out.loc[src, "n_tokens"] == ns


def test_holt_forecast_python_recurrence(spark):
    """Level/trend recomputed with the exact same float recurrence in
    Python must match bit-for-bit (alpha = beta = 0.5)."""
    out = _run(spark, "ev_holt_linear_forecast").set_index("event_type")
    ev = _events()
    ev["hr"] = ev["us"] // HOUR_US
    for etype, grp in ev.groupby("event_type"):
        xs = [float(v) for v in grp.groupby("hr").size().sort_index().values]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            ln = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * x - 0.5 * ln + b
            l = ln
        assert out.loc[etype, "n_hours"] == len(xs)
        assert out.loc[etype, "level"] == l
        assert out.loc[etype, "trend"] == b
        assert out.loc[etype, "forecast_next"] == l + b
