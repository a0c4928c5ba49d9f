"""Round-5 operator tests: PNG defilter math, sharded packing
bounds, edit-distance discrimination, PageRank invariants, audio
feature exactness."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_data_ingestion_spark.operators.multimodal import (
    _png_defilter,
    _png_filter_line,
)
from etl_data_ingestion_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_png_filter_roundtrip_all_types():
    # every filter type, both channel counts, adversarial content:
    # ramps, constants, and alternating extremes exercise the
    # Sub/Up/Average/Paeth predictors differently
    patterns = [
        lambda x: x % 256,
        lambda x: 0,
        lambda x: 255 if x % 2 == 0 else 0,
        lambda x: (x * 37 + 11) % 256,
    ]
    for ch in (1, 3):
        for pat in patterns:
            w, h = 9, 7
            prior = bytes(w * ch)
            filtered = b""
            src = []
            for y in range(h):
                line = bytes(pat(y * w * ch + i) for i in range(w * ch))
                src.append(line)
                ftype = y % 5
                filtered += bytes([ftype]) + _png_filter_line(
                    line, prior, ftype, ch
                )
                prior = line
            out = _png_defilter(filtered, w, h, ch)
            assert bytes(out) == b"".join(src)


def test_pack_sequences_sharded_bounds(spark):
    rows = registry.QUERIES["pipeline_pack_sequences_sharded"](
        spark, SF
    ).collect()
    assert len(rows) == 8  # doc_id % 8 shards, all populated
    for r in rows:
        # every shard honors the remainder bound: at most one short
        # (tail) window, and window accounting reconciles exactly
        assert r["remainder_bound_ok"]
        assert r["short_windows"] <= 1
        full = r["n_windows"] - r["short_windows"]
        assert r["shard_tokens"] >= full * 2048
        assert r["shard_tokens"] <= r["n_windows"] * 2048


def test_levenshtein_banded_discriminates(spark):
    rows = registry.QUERIES["dedup_levenshtein_banded"](spark, SF).collect()
    pairs = {(r["a_id"], r["b_id"]): r["edit_dist"] for r in rows}
    # planted 6-edit copies (base + 1000000) are all found...
    base_ids = [a for (a, b) in pairs if b == a + 1000000]
    assert base_ids, "no near-dup pairs found"
    assert all(pairs[(a, a + 1000000)] == 6 for a in base_ids)
    # ...and no 40-edit copy (base + 2000000) sneaks through even
    # though it shares the blocking prefix
    assert not any(b >= 2000000 for (_, b) in pairs)


def test_pagerank_mass_and_ranking(spark):
    df = registry.QUERIES["graph_pagerank_bipartite"](spark, SF)
    rows = df.collect()
    assert len(rows) == 20
    # descending, positive, deterministic top ranking
    vals = [r["pr_milli"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(v > 0 for v in vals)
    # suppliers aggregate many customers' mass -> the top of the
    # ranking should be supplier nodes at this fixture scale
    assert rows[0]["node"].startswith("S")


def test_audio_features_exact(spark):
    rows = registry.QUERIES["multimodal_audio_features"](spark, SF).collect()
    assert len(rows) == 200
    for r in rows:
        d = r["doc_id"]
        assert r["n_frames"] == 10
        assert r["rms_first_half"] == 100 + d % 900
        assert r["rms_second_half"] == 200 + d % 700
        assert r["peak"] == max(100 + d % 900, 200 + d % 700)
        assert r["zcr_per_frame_ok"]


def test_ohlc_high_low_envelope(spark):
    bars = registry.QUERIES["timeseries_resample_ohlc"](spark, SF).collect()
    assert bars, "no bars"
    for r in bars:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["volume"] >= 1


def test_asof_nearest_matches_bruteforce(spark):
    from etl_data_ingestion_spark.catalog import load_table

    got = {
        r["event_id"]: (r["direction"], r["nearest_view_ts"])
        for r in registry.QUERIES["join_asof_nearest"](spark, SF).collect()
    }
    events = load_table(spark, SF, "events").collect()
    views = sorted(
        [e for e in events if e["event_type"] == "view"],
        key=lambda e: (e["ts"], e["event_id"]),
    )
    import random

    rng = random.Random(7)
    purchases = [e for e in events if e["event_type"] == "purchase"]
    for p in rng.sample(purchases, min(50, len(purchases))):
        mine = [v for v in views if v["user_id"] == p["user_id"]]
        back = [v for v in mine if v["ts"] <= p["ts"]]
        fwd = [v for v in mine if v["ts"] >= p["ts"]]
        b = back[-1] if back else None
        f_ = fwd[0] if fwd else None
        if b is None and f_ is None:
            assert got[p["event_id"]][0] is None
            continue
        if f_ is None or (
            b is not None
            and (p["ts"] - b["ts"]) <= (f_["ts"] - p["ts"])
        ):
            exp_dir, exp_ts = "backward", b["ts"]
        else:
            exp_dir, exp_ts = "forward", f_["ts"]
        assert got[p["event_id"]][0] == exp_dir, p["event_id"]
        assert got[p["event_id"]][1] == exp_ts.strftime("%Y-%m-%d %H:%M:%S")


def test_end_to_end_dedup_transitive(spark):
    rows = registry.QUERIES["dedup_end_to_end_canonical"](spark, SF).collect()
    canon = {r["doc_id"]: r["canonical"] for r in rows}
    # every planted copy pair maps to the SAME canonical as its base,
    # and the canonical is the minimum member (the base doc)
    for d, c in canon.items():
        if d >= 1000000:
            base = d % 1000000
            if base in canon:
                assert c == canon[base], (d, c, canon[base])
    kept = [r for r in rows if r["kept"]]
    assert all(r["doc_id"] == r["canonical"] for r in kept)


def test_rfm_quartiles_cover(spark):
    rows = registry.QUERIES["events_rfm_segmentation"](spark, SF).collect()
    assert rows
    users = sum(r["users"] for r in rows)
    for r in rows:
        assert 1 <= r["r_q"] <= 4 and 1 <= r["f_q"] <= 4 and 1 <= r["m_q"] <= 4
    assert users > 0


def test_bigram_lm_scores_positive(spark):
    rows = registry.QUERIES["text_bigram_lm_perplexity"](spark, SF).collect()
    assert rows
    for r in rows:
        # add-one smoothing bounds every probability in (0, 1):
        # -log2 must be strictly positive and finite
        assert 0 < r["avg_neg_log2"] < 64
        assert r["n_bigrams"] >= 1


def test_reachability_depths(spark):
    rows = registry.QUERIES["graph_reachability_recursive"](spark, SF).collect()
    d = {r["node"]: r["min_depth"] for r in rows}
    assert d.get("view") == 0
    assert all(v >= 0 for v in d.values())
