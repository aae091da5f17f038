"""Round-8 operators: time-series (TWA / OHLC / rolling median /
islands / Holt), Adamic–Adar, URL canonicalization, mixture
rebalancing, confusion stats, bitmap distinct."""

import math

import pytest
from pyspark.sql import functions as F


# --- time_weighted_avg -----------------------------------------------------

def test_twa_hand_computed_trapezoid(spark):
    from niamoto_spark.operators.timeseries import time_weighted_avg

    # k=a: samples (t, v) = (0,0), (10,10), (20,0)
    # trapezoids: (0+10)/2*10 + (10+0)/2*10 = 100; span 20 -> twa 5.0
    rows = [("a", 0, 0.0, 1), ("a", 10, 10.0, 2), ("a", 20, 0.0, 3),
            ("b", 5, 7.0, 4)]                      # single sample
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    out = {r["k"]: r for r in
           time_weighted_avg(df, "k", "t", "v", "i").collect()}
    assert out["a"]["twa"] == pytest.approx(5.0)
    assert out["a"]["n_samples"] == 3
    assert out["b"]["twa"] == pytest.approx(7.0)   # plain-avg fallback


def test_twa_burst_insensitive(spark):
    """A burst of identical samples must not drag TWA (the failure mode
    of a plain mean)."""
    from niamoto_spark.operators.timeseries import time_weighted_avg

    # v=100 for [0,10], then v=0 for (10,110]: TWA ~ 100*10/110
    rows = ([("a", t, 100.0, t) for t in (0, 2, 4, 6, 8, 10)]
            + [("a", 110, 0.0, 999)])
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    twa = time_weighted_avg(df, "k", "t", "v", "i").first()["twa"]
    # trapezoid: 100*10 + (100+0)/2*100 = 6000; span 110
    assert twa == pytest.approx(6000 / 110, abs=1e-3)
    # plain mean would be 600/7 ~ 85.7 — wildly different
    assert abs(twa - 600 / 7) > 30


# --- ohlc_bars -------------------------------------------------------------

def test_ohlc_open_close_by_composite_key(spark):
    from niamoto_spark.operators.timeseries import ohlc_bars

    rows = [("x", 3600, 5.0, 1), ("x", 3700, 9.0, 2),
            ("x", 3650, 1.0, 3),                    # low, mid-bar
            ("x", 7300, 4.0, 4)]                    # next bar
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    out = {r["bucket"]: r for r in
           ohlc_bars(df, "k", "t", "v", "i", granule_s=3600).collect()}
    b1 = out[1]
    assert (b1["open"], b1["close"]) == (5.0, 9.0)  # by time, not value
    assert (b1["high"], b1["low"], b1["n"]) == (9.0, 1.0, 3)
    assert out[2]["open"] == out[2]["close"] == 4.0


def test_ohlc_tie_on_ts_broken_by_tiebreak(spark):
    from niamoto_spark.operators.timeseries import ohlc_bars

    rows = [("x", 100, 8.0, 2), ("x", 100, 3.0, 1)]
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    r = ohlc_bars(df, "k", "t", "v", "i", granule_s=60).first()
    assert (r["open"], r["close"]) == (3.0, 8.0)    # event_id order


# --- rolling_median --------------------------------------------------------

def test_rolling_median_ramp_and_even_frames(spark):
    from niamoto_spark.operators.timeseries import rolling_median

    vals = [5.0, 1.0, 4.0, 2.0, 3.0]
    rows = [("a", i, v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    out = [r["roll_median"] for r in
           rolling_median(df, "k", "t", "v", "i", window=3)
           .orderBy("t").collect()]
    # frames: [5], [5,1], [5,1,4], [1,4,2], [4,2,3]
    assert out == [5.0, 3.0, 4.0, 2.0, 3.0]


# --- state_periods ---------------------------------------------------------

def test_state_periods_islands(spark):
    from niamoto_spark.operators.timeseries import state_periods

    rows = [("u", 1, "A", 1), ("u", 2, "A", 2), ("u", 3, "B", 3),
            ("u", 4, "A", 4), ("v", 1, "A", 5)]
    df = spark.createDataFrame(rows, "k string, t long, s string, i long")
    out = sorted((r["k"], r["period_no"], r["s"], r["start"], r["end"],
                  r["run_length"])
                 for r in state_periods(df, "k", "t", "s", "i").collect())
    assert out == [("u", 1, "A", 1, 2, 2), ("u", 2, "B", 3, 3, 1),
                   ("u", 3, "A", 4, 4, 1), ("v", 1, "A", 1, 1, 1)]


# --- holt_linear -----------------------------------------------------------

def test_holt_linear_matches_reference_loop(spark):
    from niamoto_spark.operators.timeseries import holt_linear

    y = [10.0, 12.0, 13.0, 16.0, 19.0, 18.0]
    a, b = 0.5, 0.3
    lvl, trd = y[0], y[1] - y[0]
    for t in range(1, len(y)):
        prev = lvl
        lvl = a * y[t] + (1 - a) * (lvl + trd)
        trd = b * (lvl - prev) + (1 - b) * trd
    rows = [("s", i, v) for i, v in enumerate(y)] + [("tiny", 0, 1.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["k"]: r for r in holt_linear(df, "k", "t", "v",
                                          alpha=a, beta=b,
                                          horizon=2).collect()}
    assert out["s"]["level"] == pytest.approx(lvl, abs=1e-12)
    assert out["s"]["trend"] == pytest.approx(trd, abs=1e-12)
    assert out["s"]["forecast"] == pytest.approx(lvl + 2 * trd, abs=1e-12)
    assert "tiny" not in out                        # < 2 points dropped


# --- adamic_adar -----------------------------------------------------------

def test_adamic_adar_hand_computed(spark):
    from niamoto_spark.operators.graph import adamic_adar

    # groups: g1={1,2,3}, g2={1,2}, g3={2,3,4}, singleton={9}
    rows = [(1, "g1"), (2, "g1"), (3, "g1"), (1, "g2"), (2, "g2"),
            (2, "g3"), (3, "g3"), (4, "g3"), (9, "solo")]
    df = spark.createDataFrame(rows, "item long, grp string")
    out = {(r["item_a"], r["item_b"]): r
           for r in adamic_adar(df, "item", "grp").collect()}
    w3, w2 = 1 / math.log(3), 1 / math.log(2)
    assert out[(1, 2)]["common_groups"] == 2
    assert out[(1, 2)]["aa_score"] == pytest.approx(w3 + w2, abs=1e-4)
    assert out[(2, 3)]["aa_score"] == pytest.approx(2 * w3, abs=1e-4)
    assert (9, 9) not in out and not any(9 in k for k in out)


def test_adamic_adar_viral_group_excluded(spark):
    from niamoto_spark.operators.graph import adamic_adar

    rows = ([(i, "huge") for i in range(10)]
            + [(0, "small"), (1, "small")])
    df = spark.createDataFrame(rows, "item long, grp string")
    out = adamic_adar(df, "item", "grp", max_group_size=5).collect()
    # only the small group survives: exactly the (0, 1) pair
    assert [(r["item_a"], r["item_b"], r["common_groups"])
            for r in out] == [(0, 1, 1)]


# --- url_normalize ---------------------------------------------------------

def test_url_normalize_cases(spark):
    from niamoto_spark.operators.web import url_normalize

    urls = [
        ("HTTP://WWW.Example.COM:80/A/b/?utm_source=x&z=1&a=2#frag",
         "http://example.com/A/b?a=2&z=1", "example.com"),
        ("https://sub.Site.org/path", "https://sub.site.org/path",
         "site.org"),
        ("https://site.org/?utm_campaign=c&gclid=g",
         "https://site.org", "site.org"),          # all params stripped
        ("https://site.org", "https://site.org", "site.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in urls], "url string")
    out = url_normalize(df, "url").select("url", "url_norm",
                                          "domain").collect()
    got = {r["url"]: (r["url_norm"], r["domain"]) for r in out}
    for u, want_norm, want_dom in urls:
        assert got[u] == (want_norm, want_dom), u


def test_url_normalize_keeps_www_when_asked(spark):
    from niamoto_spark.operators.web import url_normalize

    df = spark.createDataFrame([("https://www.a.com/x",)], "url string")
    r = url_normalize(df, "url", strip_www=False).first()
    assert r["url_norm"] == "https://www.a.com/x"
    assert r["host"] == "www.a.com"


# --- mixture_rebalance -----------------------------------------------------

def test_mixture_rebalance_quota_math_and_determinism(spark):
    from niamoto_spark.operators.curation import mixture_rebalance

    rows = ([(i, "big") for i in range(100)]
            + [(1000 + i, "rare") for i in range(5)]
            + [(2000 + i, "drop") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, g string")
    sel, summ = mixture_rebalance(df, "doc_id", "g",
                                  {"big": 0.5, "rare": 0.5}, 40)
    s = {r["g"]: r for r in summ.collect()}
    assert (s["big"]["quota"], s["rare"]["quota"]) == (20, 20)
    assert s["big"]["rate"] == pytest.approx(0.2)
    assert s["rare"]["rate"] == 1.0
    assert s["rare"]["n_selected"] == 5             # keeps all it has
    assert s["rare"]["shortfall"] == 15
    assert "drop" not in s                           # untargeted gone
    ids1 = sorted(r["doc_id"] for r in sel.collect())
    sel2, _ = mixture_rebalance(df, "doc_id", "g",
                                {"big": 0.5, "rare": 0.5}, 40)
    assert ids1 == sorted(r["doc_id"] for r in sel2.collect())
    assert all(i < 2000 for i in ids1)
    # selection is consistent with the summary's own counts
    assert len([i for i in ids1 if i < 1000]) == s["big"]["n_selected"]


# --- confusion_stats -------------------------------------------------------

def test_confusion_stats_hand_computed(spark):
    from niamoto_spark.operators.mleval import confusion_stats

    #            actual pred
    rows = [("a", "a"), ("a", "a"), ("a", "b"),
            ("b", "b"), ("b", "a"),
            ("c", "d")]                  # d never actual: support 0
    df = spark.createDataFrame(rows, "y string, p string")
    out = {r["class"]: r for r in confusion_stats(df, "y", "p").collect()}
    assert (out["a"]["support"], out["a"]["pred_n"], out["a"]["tp"]) \
        == (3, 3, 2)
    assert out["a"]["precision"] == pytest.approx(2 / 3, abs=1e-4)
    assert out["a"]["recall"] == pytest.approx(2 / 3, abs=1e-4)
    assert out["a"]["f1"] == pytest.approx(2 / 3, abs=1e-4)
    assert (out["d"]["support"], out["d"]["pred_n"]) == (0, 1)
    assert out["d"]["recall"] == 0.0                 # zero_division=0
    assert (out["c"]["precision"], out["c"]["f1"]) == (0.0, 0.0)


# --- bitmap_distinct -------------------------------------------------------

def test_bitmap_distinct_exact_and_rollup(spark):
    from niamoto_spark.operators.sketches import bitmap_distinct_rollup

    rows = [("a", i % 7) for i in range(50)] + [("b", i) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, id long")
    out = {r["g"]: r["n_distinct"] for r in
           bitmap_distinct_rollup(df, "g", "id").collect()}
    assert out["a"] == 7 and out["b"] == 9
    assert out[None] == 9                            # ids overlap: 0..8


def test_bitmap_distinct_crosses_bucket_boundary(spark):
    """Spark bitmaps hold 32768 bits per bucket: ids spanning buckets
    must still count exactly (the per-bucket construct + sum)."""
    from niamoto_spark.operators.sketches import bitmap_distinct_rollup

    ids = [1, 2, 40_000, 70_000, 1_000_000]
    df = spark.createDataFrame([("g", i) for i in ids], "g string, id long")
    out = bitmap_distinct_rollup(df, "g", "id",
                                 rollup_to_total=False).collect()
    assert out[0]["n_distinct"] == 5


# --- debounce_events -------------------------------------------------------

def test_debounce_keeps_first_of_burst(spark):
    from niamoto_spark.operators.cleaning import debounce_events

    rows = [("u", "c", 0, 1), ("u", "c", 5, 2), ("u", "c", 8, 3),
            ("u", "c", 100, 4),              # new burst (gap > 10)
            ("u", "d", 1, 5),                # different key tuple
            ("v", "c", 2, 6)]
    df = spark.createDataFrame(rows, "u string, e string, t long, i long")
    out = sorted((r["u"], r["e"], r["t"], r["burst_n"]) for r in
                 debounce_events(df, ["u", "e"], "t", "i", 10).collect())
    assert out == [("u", "c", 0, 3), ("u", "c", 100, 1),
                   ("u", "d", 1, 1), ("v", "c", 2, 1)]


def test_debounce_slow_drizzle_is_one_burst(spark):
    """Chained gaps each <= tol must stay ONE burst even when the total
    span exceeds tol (the debounce-vs-time-bucket distinction)."""
    from niamoto_spark.operators.cleaning import debounce_events

    rows = [("u", "c", t, t) for t in (0, 9, 18, 27, 36)]
    df = spark.createDataFrame(rows, "u string, e string, t long, i long")
    out = debounce_events(df, ["u", "e"], "t", "i", 10).collect()
    assert len(out) == 1 and out[0]["burst_n"] == 5


# --- counter_rate ----------------------------------------------------------

def test_counter_rate_reset_semantics(spark):
    from niamoto_spark.operators.timeseries import counter_rate

    # 10 -> 25 (+15) -> 5 (reset: +5) -> 30 (+25); span 30s
    rows = [("k", 0, 10.0, 1), ("k", 10, 25.0, 2), ("k", 20, 5.0, 3),
            ("k", 30, 30.0, 4)]
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    r = counter_rate(df, "k", "t", "v", "i").first()
    assert (r["n_samples"], r["n_resets"]) == (4, 1)
    assert r["increase"] == pytest.approx(45.0)
    assert r["rate_per_s"] == pytest.approx(1.5)


# --- cramers_v -------------------------------------------------------------

def test_cramers_v_perfect_association_is_one(spark):
    from niamoto_spark.operators.drift import cramers_v

    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "p string, q string")
    r = cramers_v(df, "p", "q").first()
    # chi2 must include the two UNOBSERVED cells ((a,y), (b,x)): each
    # contributes (0-5)^2/5 = 5, so 20 total — not the 10 an
    # observed-cells-only sum reports
    assert r["v"] == pytest.approx(1.0)
    assert r["chi2"] == pytest.approx(20.0)


def test_cramers_v_independent_is_zero(spark):
    from niamoto_spark.operators.drift import cramers_v

    rows = [(a, b) for a in "ab" for b in "xy" for _ in range(5)]
    df = spark.createDataFrame(rows, "p string, q string")
    assert cramers_v(df, "p", "q").first()["v"] == pytest.approx(0.0)


# --- ip_range_join ---------------------------------------------------------

def test_ipv4_to_long_and_range_join(spark):
    from niamoto_spark.operators.web import ip_range_join, ipv4_to_long

    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.255.255",), ("10.1.0.0",),
         ("not-an-ip",)], "ip string")
    ranges = spark.createDataFrame(
        [(10 * 16_777_216, 10 * 16_777_216 + 65_535, "low")],
        "ip_start long, ip_end long, zone string")
    out = {r["ip"]: r["zone"] for r in
           ip_range_join(df, "ip", ranges).collect()}
    assert out["10.0.0.1"] == "low"
    assert out["10.0.255.255"] == "low"
    assert out["10.1.0.0"] is None              # outside the block
    assert out["not-an-ip"] is None             # NULL ip_num, no match
    v = spark.range(1).select(
        ipv4_to_long(F.lit("1.2.3.4")).alias("n")).first()["n"]
    assert v == 16_777_216 + 2 * 65_536 + 3 * 256 + 4


# --- frequent_triples ------------------------------------------------------

def test_frequent_triples_hand_computed(spark):
    from niamoto_spark.operators.itemsets import frequent_triples

    # baskets: {a,b,c} x3, {a,b} x1, {a,d} x1 -> only (a,b,c) triple
    rows = ([(i, x) for i in range(3) for x in "abc"]
            + [(3, "a"), (3, "b"), (4, "a"), (4, "d")])
    df = spark.createDataFrame(rows, "bk long, it string")
    out = frequent_triples(df, "bk", "it", min_support=0.5).collect()
    assert [(r["item_a"], r["item_b"], r["item_c"], r["triple_count"])
            for r in out] == [("a", "b", "c", 3)]
    assert out[0]["support"] == pytest.approx(0.6)


def test_frequent_triples_prunes_via_pairs(spark):
    """A triple whose pairs are frequent but whose own count is below
    threshold must not survive; items below support never pair."""
    from niamoto_spark.operators.itemsets import frequent_triples

    rows = [(0, "a"), (0, "b"), (0, "c"),
            (1, "a"), (1, "b"), (2, "b"), (2, "c"), (3, "a"), (3, "c"),
            (4, "z")]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = frequent_triples(df, "bk", "it", min_support=0.4).collect()
    assert out == []                             # abc appears once < 2


# --- int8 scalar quantization ----------------------------------------------

def test_sq_roundtrip_error_bounded_and_self_match(spark):
    import random

    from niamoto_spark.operators.quantization import (sq_encode,
                                                      sq_topk, sq_train)

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    mins, spans = sq_train(df, "embedding")
    codes = sq_encode(df, "vec_id", "embedding", mins, spans)
    rows = codes.collect()
    assert all(0 <= c <= 255 for r in rows for c in r["codes"])
    # dequantization error per dim <= span/510 (half a code step)
    by_id = {i: v for i, v in vecs}
    for r in rows:
        for d, c in enumerate(r["codes"]):
            dq = mins[d] + c * spans[d] / 255.0
            assert abs(dq - by_id[r["vec_id"]][d]) \
                <= spans[d] / 510 + 1e-12
    qs = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), "embedding")
    top = sq_topk(codes, qs, "vec_id", "qid", "embedding",
                  mins, spans, k=1)
    # with 8-bit precision each query's own vector wins its top-1
    assert {(r["qid"], r["vec_id"]) for r in top.collect()} \
        == {(0, 0), (1, 1)}


def test_sq_constant_dim_codes_zero(spark):
    from niamoto_spark.operators.quantization import sq_encode, sq_train

    df = spark.createDataFrame([(0, [5.0, 1.0]), (1, [5.0, 3.0])],
                               "vec_id long, embedding array<double>")
    mins, spans = sq_train(df, "embedding")
    assert spans[0] == 0.0
    rows = {r["vec_id"]: r["codes"] for r in
            sq_encode(df, "vec_id", "embedding", mins, spans).collect()}
    assert rows[0][0] == 0 and rows[1][0] == 0    # zero-span dim
    assert rows[0][1] == 0 and rows[1][1] == 255  # full-range dim


# --- parse_access_log ------------------------------------------------------

def test_parse_access_log_fields_and_garbage(spark):
    from niamoto_spark.operators.web import parse_access_log

    good = ('192.168.0.7 - alice [10/Oct/2023:13:55:36 +0000] '
            '"GET /a/b?x=1 HTTP/1.1" 200 2326')
    nobody = ('10.0.0.1 - - [10/Oct/2023:13:55:37 +0000] '
              '"POST /login HTTP/1.0" 302 -')
    df = spark.createDataFrame(
        [(good,), (nobody,), ("not a log line",)], "line string")
    out = {r["line"][:11]: r for r in
           parse_access_log(df, "line").collect()}
    g = out[good[:11]]
    assert (g["ip"], g["http_user"], g["method"], g["path"],
            g["status"], g["bytes_sent"]) \
        == ("192.168.0.7", "alice", "GET", "/a/b?x=1", 200, 2326)
    n = out[nobody[:11]]
    assert n["http_user"] is None and n["bytes_sent"] == 0
    bad = out["not a log l"]
    assert bad["ip"] is None and bad["status"] is None


# --- negative_samples ------------------------------------------------------

def test_negative_samples_distribution_and_determinism(spark):
    from niamoto_spark.operators.text import negative_samples

    # one dominant token, several rare: the 0.75 power flattens but the
    # dominant token must still be drawn most
    docs = [(i, "the " * 50 + "rare%d tail" % (i % 5)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ns = negative_samples(df, "doc_id", "text", k=4, vocab_limit=50)
    assert ns.count() == 160                     # every draw lands
    top = (ns.groupBy("token").count()
           .orderBy(F.desc("count")).first())
    assert top["token"] == "the"
    ns2 = negative_samples(df, "doc_id", "text", k=4, vocab_limit=50)
    assert sorted(map(tuple, ns.collect())) \
        == sorted(map(tuple, ns2.collect()))     # deterministic
    ns3 = negative_samples(df, "doc_id", "text", k=4, vocab_limit=50,
                           seed="other")
    assert sorted(map(tuple, ns.collect())) \
        != sorted(map(tuple, ns3.collect()))     # seed matters


# --- hashed_features -------------------------------------------------------

def test_hashed_features_stable_and_bounded(spark):
    from niamoto_spark.operators.text import hashed_features

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")],
        "doc_id long, text string")
    out = hashed_features(df, "doc_id", "text", dim=16).collect()
    assert all(0 <= r["bucket"] < 16 for r in out)
    per_doc1 = {r["bucket"]: r["n"] for r in out if r["doc_id"] == 1}
    assert sum(per_doc1.values()) == 3           # token mass preserved
    # same token -> same bucket across docs (the serve-side contract)
    out2 = hashed_features(df, "doc_id", "text", dim=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


# --- multilabel_metrics ----------------------------------------------------

def test_multilabel_hand_computed(spark):
    from niamoto_spark.operators.mleval import multilabel_metrics

    rows = [(["a", "b"], ["a"]),        # tp1 fp0 fn1, jac 1/2
            (["c"], ["c", "d"]),        # tp1 fp1 fn0, jac 1/2
            ([], [])]                   # both empty: jaccard 1
    df = spark.createDataFrame(
        rows, "actual array<string>, pred array<string>")
    r = multilabel_metrics(df, "actual", "pred").first()
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
    assert r["micro_precision"] == pytest.approx(2 / 3, abs=1e-4)
    assert r["micro_recall"] == pytest.approx(2 / 3, abs=1e-4)
    assert r["mean_jaccard"] == pytest.approx((0.5 + 0.5 + 1) / 3,
                                              abs=1e-4)


def test_multilabel_null_arrays_are_empty(spark):
    from niamoto_spark.operators.mleval import multilabel_metrics

    df = spark.createDataFrame(
        [(None, ["a"])], "actual array<string>, pred array<string>")
    r = multilabel_metrics(df, "actual", "pred").first()
    assert (r["tp"], r["fp"], r["fn"]) == (0, 1, 0)
    assert r["micro_recall"] == 0.0


# --- temporal_split --------------------------------------------------------

def test_temporal_split_order_and_embargo(spark):
    from niamoto_spark.operators.curation import temporal_split

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, t double")
    out = {r["id"]: r["split"] for r in
           temporal_split(df, "t", test_frac=0.2,
                          embargo_s=5.0).collect()}
    # cutoff = interpolated q0.8 over 0..99 = 79.2
    assert out[99] == "test" and out[80] == "test"
    assert out[79] == "embargo" and out[75] == "embargo"
    assert out[74] == "train" and out[0] == "train"
    # every test row is strictly after every train row
    tmax_train = max(i for i, s in out.items() if s == "train")
    tmin_test = min(i for i, s in out.items() if s == "test")
    assert tmax_train < tmin_test


# --- knn_classify ----------------------------------------------------------

def test_knn_majority_and_tiebreak(spark):
    from niamoto_spark.operators.clustering import knn_classify

    # train: 3 class-0 vectors near (1,0), 2 class-1 near (0,1)
    train = spark.createDataFrame(
        [(10, [1.0, 0.0], 0), (11, [0.9, 0.1], 0), (12, [0.95, 0.05], 0),
         (13, [0.0, 1.0], 1), (14, [0.1, 0.9], 1)],
        "vec_id long, embedding array<double>, label int")
    test = spark.createDataFrame(
        [(0, [1.0, 0.05]), (1, [0.05, 1.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           knn_classify(train, test, "vec_id", "embedding", "label",
                        k=3).collect()}
    assert out[0]["pred_label"] == 0 and out[0]["votes"] == 3
    # point near class 1: 3-NN = two 1s + one 0 -> majority 1
    assert out[1]["pred_label"] == 1 and out[1]["votes"] == 2


# --- silhouette_simplified -------------------------------------------------

def test_silhouette_tight_vs_boundary(spark):
    from niamoto_spark.operators.clustering import silhouette_simplified

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0])],
        "cluster_id long, cent_vec array<double>")
    pts = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [0.2, 0.0]),     # tight around c0
         (3, [5.2, 0.0])],                     # near the boundary
        "vec_id long, embedding array<double>")
    out = {r["cluster_id"]: r for r in
           silhouette_simplified(pts, "vec_id", "embedding",
                                 cents).collect()}
    assert out[0]["n"] == 2
    assert out[0]["mean_silhouette"] > 0.9     # tight cluster
    assert out[1]["n"] == 1
    assert 0 <= out[1]["mean_silhouette"] < 0.1  # boundary point


# --- apply_masking ---------------------------------------------------------

def test_masking_policies(spark):
    from niamoto_spark.operators.privacy import apply_masking

    df = spark.createDataFrame(
        [("Alice Smith", "4111222233334444", 87.0, "GOLD"),
         ("Bob", "123", 12.0, "SILVER")],
        "name string, card string, bal double, tier string")
    m = {r["card"] is not None and len(r["card"]) or 0: r for r in []}
    out = {r["bal"]: r for r in apply_masking(
        df, {"name": "pseudonym", "card": "last4",
             "tier": "null", "bal": "bucket10"}, salt="z").collect()}
    a = out[80.0]
    assert len(a["name"]) == 12 and a["name"] != "Alice Smith"
    assert a["card"] == "x" * 12 + "4444"
    assert a["tier"] is None
    b = out[10.0]
    assert b["card"] == "123"                  # short strings unmasked tail
    # pseudonym is deterministic under the same salt, differs across salts
    again = apply_masking(df, {"name": "pseudonym"}, salt="z").collect()
    other = apply_masking(df, {"name": "pseudonym"}, salt="w").collect()
    assert {r["name"] for r in again} \
        == {out[80.0]["name"], out[10.0]["name"]}
    assert {r["name"] for r in other} != {r["name"] for r in again}


def test_masking_unknown_policy_raises(spark):
    from niamoto_spark.operators.privacy import apply_masking

    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="unknown policy"):
        apply_masking(df, {"a": "rot13"})


# --- forecast_accuracy -----------------------------------------------------

def test_forecast_accuracy_hand_computed(spark):
    from niamoto_spark.operators.mleval import forecast_accuracy

    # actual 10, pred 8 -> ae 2, smape 2*2/18; naive_err 4
    rows = [("s", 10.0, 8.0, 4.0), ("s", 20.0, 20.0, 2.0)]
    df = spark.createDataFrame(
        rows, "k string, y double, p double, ne double")
    r = forecast_accuracy(df, "k", "y", "p", "ne").first()
    assert r["mae"] == pytest.approx(1.0)
    assert r["smape"] == pytest.approx((2 * 2 / 18 + 0) / 2, abs=1e-4)
    assert r["mase"] == pytest.approx(1.0 / 3.0, abs=1e-4)


# --- rbo_similarity --------------------------------------------------------

def test_rbo_identical_and_disjoint(spark):
    from niamoto_spark.operators.retrieval import rbo_similarity

    items = [("q", f"i{r}", r) for r in range(1, 11)]
    a = spark.createDataFrame(items, "k string, item string, r int")
    # identical rankings -> RBO = (1-p) sum p^(d-1) * d/d = 1 - p^D
    r = rbo_similarity(a, a, "k", "item", "r", depth=10, p=0.9).first()
    assert r["n_matched"] == 10
    assert r["rbo"] == pytest.approx(1 - 0.9 ** 10, abs=1e-3)
    b = spark.createDataFrame([("q", f"z{r}", r) for r in range(1, 11)],
                              "k string, item string, r int")
    # disjoint rankings -> no matched rows at all
    assert rbo_similarity(a, b, "k", "item", "r").count() == 0


def test_rbo_top_weighted(spark):
    """Agreement at rank 1 must outweigh agreement at rank 10."""
    from niamoto_spark.operators.retrieval import rbo_similarity

    base = [("q", f"i{r}", r) for r in range(1, 11)]
    a = spark.createDataFrame(base, "k string, item string, r int")

    def swap(i, j):
        rows = []
        for k, it, r in base:
            r2 = j if r == i else i if r == j else r
            rows.append((k, f"x{r}" if r2 != r and False else it, r2))
        return spark.createDataFrame(
            [(k, it, r2) for (k, it, _), (_, _, r2)
             in zip(base, rows)], "k string, item string, r int")

    # replace top item vs replace bottom item
    top_off = spark.createDataFrame(
        [("q", "other", 1)] + base[1:], "k string, item string, r int")
    bot_off = spark.createDataFrame(
        base[:9] + [("q", "other", 10)], "k string, item string, r int")
    rbo_top = rbo_similarity(a, top_off, "k", "item", "r").first()["rbo"]
    rbo_bot = rbo_similarity(a, bot_off, "k", "item", "r").first()["rbo"]
    assert rbo_top < rbo_bot                   # losing rank 1 hurts more


# --- emd_1d ----------------------------------------------------------------

def test_emd_identical_zero_and_shift(spark):
    from niamoto_spark.operators.drift import emd_1d

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)],
                              "v double")
    assert emd_1d(a, a, "v").first()["emd"] == 0.0
    # shifting every value by +3 moves EMD to exactly 3
    b = spark.createDataFrame([(float(i % 10 + 3),) for i in range(100)],
                              "v double")
    assert emd_1d(a, b, "v").first()["emd"] == pytest.approx(3.0)


# --- gini_coefficient ------------------------------------------------------

def test_gini_equal_and_concentrated(spark):
    from niamoto_spark.operators.aggregation import gini_coefficient

    eq = spark.createDataFrame([("g", 10.0)] * 8, "g string, x double")
    assert gini_coefficient(eq, "g", "x").first()["gini"] \
        == pytest.approx(0.0, abs=1e-9)
    conc = spark.createDataFrame(
        [("g", 0.0)] * 9 + [("g", 100.0)], "g string, x double")
    # one holder of everything among 10 -> G = (n-1)/n = 0.9
    assert gini_coefficient(conc, "g", "x").first()["gini"] \
        == pytest.approx(0.9, abs=1e-9)


# --- hhi_concentration -----------------------------------------------------

def test_hhi_monopoly_and_uniform(spark):
    from niamoto_spark.operators.aggregation import hhi_concentration

    rows = ([("m1", "only", 50.0)]
            + [("m2", f"f{i}", 10.0) for i in range(4)])
    df = spark.createDataFrame(rows, "mkt string, firm string, v double")
    out = {r["mkt"]: r for r in
           hhi_concentration(df, "mkt", "firm", "v").collect()}
    assert out["m1"]["hhi"] == 1.0
    assert out["m1"]["effective_firms"] == 1.0
    assert out["m2"]["hhi"] == pytest.approx(0.25)
    assert out["m2"]["effective_firms"] == pytest.approx(4.0)


# --- nelson_aalen ----------------------------------------------------------

def test_nelson_aalen_hand_computed(spark):
    from niamoto_spark.operators.timeseries import nelson_aalen

    # durations: events at t=1 (1 of 4 at risk), t=3 (1 of 2);
    # censored at t=2 and t=5
    rows = [(1, 1), (2, 0), (3, 1), (5, 0)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    out = {r["t"]: r for r in nelson_aalen(df, "dur", "ev").collect()}
    assert out[1]["cum_hazard"] == pytest.approx(0.25)
    assert out[3]["cum_hazard"] == pytest.approx(0.25 + 0.5)
    assert out[3]["fh_survival"] == pytest.approx(
        round(__import__("math").exp(-0.75), 4))


# --- generate_rows ---------------------------------------------------------

def test_synthetic_rows_shape_and_determinism(spark):
    from niamoto_spark.operators.synthetic import generate_rows

    a = generate_rows(spark, 3000, {"x": 0.7, "y": 0.3}).collect()
    b = generate_rows(spark, 3000, {"x": 0.7, "y": 0.3}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    import statistics
    g = [r["gauss"] for r in a]
    assert abs(statistics.fmean(g)) < 0.1
    assert 0.9 < statistics.pstdev(g) < 1.1          # ~N(0,1)
    frac_x = sum(1 for r in a if r["category"] == "x") / len(a)
    assert 0.65 < frac_x < 0.75                      # ~0.7 share
    e = [r["expo"] for r in a]
    assert 0.9 < statistics.fmean(e) < 1.1           # exp(1) mean 1


def test_synthetic_seed_changes_values(spark):
    from niamoto_spark.operators.synthetic import generate_rows

    a = generate_rows(spark, 100, {"x": 1.0}, seed="a").collect()
    b = generate_rows(spark, 100, {"x": 1.0}, seed="b").collect()
    assert [r["gauss"] for r in a] != [r["gauss"] for r in b]


# --- neyman_allocation -----------------------------------------------------

def test_neyman_noisy_stratum_gets_more(spark):
    import random

    from niamoto_spark.operators.curation import neyman_allocation

    rng = random.Random(7)
    rows = ([(i, "calm", 100 + rng.uniform(-1, 1)) for i in range(500)]
            + [(1000 + i, "wild", 100 + rng.uniform(-80, 80))
               for i in range(500)])
    df = spark.createDataFrame(rows, "id long, g string, v double")
    sel, summ = neyman_allocation(df, "id", "g", "v", budget_rows=200)
    s = {r["g"]: r for r in summ.collect()}
    # equal sizes, wildly different stddev: quotas follow N*S
    assert s["wild"]["quota"] > 5 * s["calm"]["quota"]
    assert s["wild"]["n_selected"] > s["calm"]["n_selected"]
    # deterministic rerun
    sel2, _ = neyman_allocation(df, "id", "g", "v", budget_rows=200)
    assert sorted(r["id"] for r in sel.collect()) \
        == sorted(r["id"] for r in sel2.collect())


# --- rolling_active_users --------------------------------------------------

def test_rolling_active_users_window_math(spark):
    from niamoto_spark.operators.timeseries import rolling_active_users

    # users active: u1 on days 0,1; u2 on day 2 (granule 1s for ease)
    rows = [(1, 0), (1, 1), (2, 2)]
    df = spark.createDataFrame(rows, "u long, t long")
    out = {r["day"]: r for r in
           rolling_active_users(df, "u", "t", window_days=3,
                                granule_s=1).collect()}
    # day 2: window {0,1,2} -> both users; dau = 1 (u2)
    assert out[2]["rolling_active"] == 2
    assert out[2]["dau"] == 1
    assert out[2]["stickiness"] == pytest.approx(0.5)
    # days before lo+window-1 are trimmed (incomplete windows)
    assert 0 not in out and 1 not in out


# --- embedding_drift -------------------------------------------------------

def test_embedding_drift_detects_shift(spark):
    from niamoto_spark.operators.drift import embedding_drift

    ref = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(20)],
        "id long, v array<double>")
    same = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(10)],
        "id long, v array<double>")
    moved = spark.createDataFrame(
        [(i, [0.0, 2.0]) for i in range(10)],
        "id long, v array<double>")
    r_same = embedding_drift(ref, same, "v").first()
    assert r_same["centroid_dist"] == pytest.approx(0.0)
    assert r_same["centroid_norm_ratio"] == pytest.approx(1.0)
    r_mv = embedding_drift(ref, moved, "v").first()
    # centroids (1,0) vs (0,2): distance sqrt(5), norm ratio 2
    assert r_mv["centroid_dist"] == pytest.approx(5 ** 0.5, abs=1e-4)
    assert r_mv["centroid_norm_ratio"] == pytest.approx(2.0, abs=1e-4)


# --- rolling_slope ---------------------------------------------------------

def test_rolling_slope_linear_series_and_short_frames(spark):
    from niamoto_spark.operators.timeseries import rolling_slope

    # y = 3t + 5 exactly: every full frame's slope is 3
    rows = [("k", t, 3.0 * t + 5.0, t) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    out = [r["slope"] for r in
           rolling_slope(df, "k", "t", "v", "i", window=4)
           .orderBy("t").collect()]
    assert out[0] is None                      # 1-point frame
    assert all(s == pytest.approx(3.0) for s in out[1:])
    # alternating series has ~0 slope on symmetric frames
    rows2 = [("k", t, float(t % 2), t) for t in range(8)]
    df2 = spark.createDataFrame(rows2, "k string, t long, v double, i long")
    s4 = [r["slope"] for r in
          rolling_slope(df2, "k", "t", "v", "i", window=4)
          .orderBy("t").collect()][3:]
    assert all(abs(s) < 0.21 for s in s4)


# --- sssp_rounds -----------------------------------------------------------

def test_sssp_takes_cheaper_two_hop_path(spark):
    from niamoto_spark.operators.graph import sssp_rounds

    # a-b direct cost 10; a-c-b costs 2+3=5; d unreachable in 2 rounds
    edges = spark.createDataFrame(
        [("a", "b", 10.0), ("a", "c", 2.0), ("c", "b", 3.0),
         ("x", "d", 1.0)],
        "src string, dst string, w double")
    src = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["dist"] for r in
           sssp_rounds(edges, src, rounds=2).collect()}
    assert out["a"] == 0.0
    assert out["b"] == 5.0                    # two-hop beats direct
    assert out["c"] == 2.0
    assert "d" not in out                     # disconnected


def test_sssp_round_budget_limits_depth(spark):
    from niamoto_spark.operators.graph import sssp_rounds

    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(5)], "src long, dst long, w double")
    src = spark.createDataFrame([(0,)], "node long")
    out2 = {r["node"] for r in sssp_rounds(chain, src, rounds=2).collect()}
    assert out2 == {0, 1, 2}                  # only <=2-edge paths
    out5 = {r["node"]: r["dist"] for r in
            sssp_rounds(chain, src, rounds=5).collect()}
    assert out5[5] == 5.0


# --- reconcile_columns -----------------------------------------------------

def test_reconcile_columns_hand_planted(spark):
    from niamoto_spark.operators.quality import reconcile_columns

    a = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, None), (4, 40.0, "z")],
        "k long, v double, s string")
    b = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 99.0, "y"), (3, 30.0, "w"), (5, 50.0, "q")],
        "k long, v double, s string")
    out = {r["column"]: r for r in
           reconcile_columns(a, b, ["k"]).collect()}
    assert out["v"]["n_mismatch"] == 1          # key 2
    assert out["s"]["n_mismatch"] == 1          # key 3 null->w counts
    assert out["s"]["n_null_a_only"] == 1       # key 3
    p = out["__presence__"]
    assert (p["n_matched"], p["n_mismatch"], p["n_null_a_only"]) \
        == (3, 1, 1)                            # 4 a-only, 5 b-only


# --- cuped_adjust ----------------------------------------------------------

def test_cuped_removes_covariate_confound(spark):
    import random

    from niamoto_spark.operators.experiments import cuped_adjust

    rng = random.Random(3)
    rows = []
    for i in range(400):
        x = rng.gauss(50, 10)
        arm = "T" if i % 2 == 0 else "C"
        # y driven almost entirely by x, zero true treatment effect
        y = 2 * x + rng.gauss(0, 0.5)
        rows.append((arm, y, x))
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    r = cuped_adjust(df, "arm", "y", "x", "T").first()
    assert r["theta"] == pytest.approx(2.0, abs=0.05)
    assert r["var_ratio"] < 0.01                # ~all variance explained
    assert abs(r["diff_adj"]) < abs(r["diff_raw"]) + 1e-9
    assert abs(r["diff_adj"]) < 0.2             # near the true 0 effect


# --- bh_fdr ----------------------------------------------------------------

def test_bh_fdr_textbook_example(spark):
    from niamoto_spark.operators.experiments import bh_fdr

    # classic: m=5, alpha=0.25 -> thresholds .05 .10 .15 .20 .25
    rows = [("t1", 0.01), ("t2", 0.04), ("t3", 0.14), ("t4", 0.50),
            ("t5", 0.90)]
    df = spark.createDataFrame(rows, "test string, p double")
    out = {r["test"]: r for r in
           bh_fdr(df, "test", "p", alpha=0.25).collect()}
    # largest passing rank: t3 (0.14 <= 0.15) -> t1..t3 rejected
    assert out["t1"]["rejected"] and out["t2"]["rejected"] \
        and out["t3"]["rejected"]
    assert not out["t4"]["rejected"] and not out["t5"]["rejected"]
    # t2 alone fails its own threshold (0.04 <= 0.10 passes actually);
    # the suffix rule is what rescues any earlier rank below a later
    # passing one — pinned by t3 rescuing nothing above it here
    assert out["t3"]["rank"] == 3


# --- causal lane -----------------------------------------------------------

def test_did_recovers_planted_effect(spark):
    from niamoto_spark.operators.experiments import diff_in_diff

    rows = []
    for i in range(200):
        g = "T" if i % 2 == 0 else "C"
        for p, base in (("pre", 10.0), ("post", 14.0)):  # +4 trend
            y = base + (3.0 if (g, p) == ("T", "post") else 0.0)
            rows.append((g, p, y))
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = diff_in_diff(df, "g", "p", "y", "T", "post").first()
    assert r["diff_control"] == pytest.approx(4.0)   # shared trend
    assert r["did"] == pytest.approx(3.0)            # planted effect


def test_rdd_recovers_jump_not_slope(spark):
    from niamoto_spark.operators.experiments import rdd_estimate

    rows = [(float(x), 0.5 * x + (7.0 if x >= 100 else 0.0))
            for x in range(40, 161)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = rdd_estimate(df, "x", "y", cutoff=100.0, bandwidth=50.0).first()
    assert r["jump"] == pytest.approx(7.0, abs=1e-6)
    assert r["slope_left"] == pytest.approx(0.5, abs=1e-6)
    assert r["slope_right"] == pytest.approx(0.5, abs=1e-6)


def test_wald_iv_late_scales_itt(spark):
    from niamoto_spark.operators.experiments import wald_iv

    # z encourages: compliers (half) take d=1 under z=1; y = 10*d
    rows = []
    for i in range(400):
        z = i % 2
        complier = (i // 2) % 2 == 0
        d = 1 if (z == 1 and complier) else 0
        rows.append((z, d, 10.0 * d))
    df = spark.createDataFrame(rows, "z int, d int, y double")
    r = wald_iv(df, "z", "d", "y").first()
    assert r["first_stage"] == pytest.approx(0.5)
    assert r["itt"] == pytest.approx(5.0)
    assert r["late"] == pytest.approx(10.0)          # per-complier effect


# --- ipf_raking ------------------------------------------------------------

def test_ipf_converges_to_target_marginals(spark):
    from niamoto_spark.operators.experiments import ipf_raking

    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 50)
    df = spark.createDataFrame(rows, "r string, c string")
    out = ipf_raking(df, "r", "c", {"a": 50.0, "b": 50.0},
                     {"x": 60.0, "y": 40.0}, iters=8).collect()
    mass = {(r["r"], r["c"]): r["weight"] * r["n"] for r in out}
    col_x = mass[("a", "x")] + mass[("b", "x")]
    row_a = mass[("a", "x")] + mass[("a", "y")]
    assert col_x == pytest.approx(60.0, abs=0.1)   # column target hit
    assert row_a == pytest.approx(50.0, abs=0.5)   # row target near


# --- ecology estimators ----------------------------------------------------

def test_chao1_hand_computed(spark):
    from niamoto_spark.operators.ecological import chao1_richness

    # species counts: 1,1,1,2,2,5 -> S=6, f1=3, f2=2, N=12
    rows = [("p", f"s{i}", c) for i, c in enumerate([1, 1, 1, 2, 2, 5])]
    df = spark.createDataFrame(rows, "g string, sp string, count long")
    r = chao1_richness(df, ["g"]).first()
    assert (r["s_obs"], r["f1"], r["f2"], r["n_ind"]) == (6, 3, 2, 12)
    assert r["chao1"] == pytest.approx(6 + 3 * 2 / (2 * 3), abs=1e-6)
    assert r["coverage"] == pytest.approx(1 - 3 / 12)


def test_chao1_no_doubletons_stays_finite(spark):
    from niamoto_spark.operators.ecological import chao1_richness

    rows = [("p", "a", 1), ("p", "b", 1), ("p", "c", 10)]
    df = spark.createDataFrame(rows, "g string, sp string, count long")
    r = chao1_richness(df, ["g"]).first()
    assert r["chao1"] == pytest.approx(3 + 2 * 1 / 2)   # f2=0 -> /2


def test_bray_curtis_identical_zero_disjoint_one(spark):
    from niamoto_spark.operators.ecological import bray_curtis

    rows = [("A", "x", 5), ("A", "y", 5),
            ("B", "x", 5), ("B", "y", 5),          # identical to A
            ("C", "z", 4)]                         # disjoint
    df = spark.createDataFrame(rows, "site string, sp string, count long")
    out = {(r["site_a"], r["site_b"]): r["bray_curtis"]
           for r in bray_curtis(df, "site", "sp").collect()}
    assert out[("A", "B")] == pytest.approx(0.0)
    assert out[("A", "C")] == pytest.approx(1.0)   # no shared species
    assert out[("B", "C")] == pytest.approx(1.0)
    # partial overlap: A={x:5,y:5} vs D={x:5}: 1 - 2*5/15
    df2 = spark.createDataFrame(rows[:2] + [("D", "x", 5)],
                                "site string, sp string, count long")
    out2 = {(r["site_a"], r["site_b"]): r["bray_curtis"]
            for r in bray_curtis(df2, "site", "sp").collect()}
    assert out2[("A", "D")] == pytest.approx(1 - 10 / 15, abs=1e-4)


def test_rarefaction_limits(spark):
    """n = N gives E[S] = S_obs exactly; tiny n gives E[S] ~ 1 when
    one species dominates."""
    from niamoto_spark.operators.ecological import rarefaction_expected

    rows = [("p", "a", 50), ("p", "b", 30), ("p", "c", 20)]
    df = spark.createDataFrame(rows, "g string, sp string, count long")
    full = rarefaction_expected(df, ["g"], subsample=100).first()
    assert full["expected_s"] == pytest.approx(3.0)
    one = rarefaction_expected(df, ["g"], subsample=1).first()
    # E[S_1] = sum p_i-ish: 1 draw sees exactly one species
    assert one["expected_s"] == pytest.approx(1.0, abs=1e-6)
    # monotone in n
    mid = rarefaction_expected(df, ["g"], subsample=10).first()
    assert 1.0 < mid["expected_s"] < 3.0


def test_weighted_endemism_narrow_range_dominates(spark):
    from niamoto_spark.operators.ecological import weighted_endemism

    rows = [("A", "everywhere", 1), ("B", "everywhere", 1),
            ("C", "everywhere", 1),
            ("A", "endemicA", 9)]
    df = spark.createDataFrame(rows, "site string, sp string, count long")
    out = {r["site"]: r for r in
           weighted_endemism(df, "site", "sp").collect()}
    # A: 1/3 (cosmopolitan) + 1/1 (endemic) = 1.3333
    assert out["A"]["we"] == pytest.approx(4 / 3, abs=1e-4)
    assert out["B"]["we"] == pytest.approx(1 / 3, abs=1e-4)
    assert out["A"]["richness"] == 2


def test_faith_pd_subtree_sizes(spark):
    """Two leaves under ONE genus share its edge (PD 3+root); two
    leaves in different genera don't (PD 4+root) — the congeners-vs-
    families distinction PD exists for."""
    from niamoto_spark.operators.ecological import faith_pd

    # tree: root(0) -> g1(1), g2(2); leaves: a(11)->g1 b(12)->g1 c(13)->g2
    nodes = spark.createDataFrame(
        [(0, None), (1, 0), (2, 0), (11, 1), (12, 1), (13, 2)],
        "id long, parent_id long")
    occ = spark.createDataFrame(
        [("near", 11), ("near", 12),        # congeners
         ("far", 11), ("far", 13)],          # span both genera
        "site string, leaf long")
    out = {r["site"]: r for r in
           faith_pd(occ, "site", "leaf", nodes).collect()}
    # near: nodes {11,12,g1,root} = 4; far: {11,13,g1,g2,root} = 5
    assert out["near"]["pd"] == 4.0
    assert out["far"]["pd"] == 5.0
    assert out["near"]["n_leaves"] == out["far"]["n_leaves"] == 2


def test_beta_partition_turnover_vs_nestedness(spark):
    from niamoto_spark.operators.ecological import beta_partition

    rows = [("A", s, 1) for s in "abcd"] \
        + [("B", s, 1) for s in "ab"] \
        + [("C", s, 1) for s in "cdef"]
    df = spark.createDataFrame(rows, "site string, sp string, count long")
    out = {(r["site_a"], r["site_b"]): r
           for r in beta_partition(df, "site", "sp").collect()}
    ab = out[("A", "B")]        # B nested in A: pure nestedness
    assert ab["beta_sim"] == 0.0
    assert ab["beta_sne"] == ab["beta_sor"] > 0
    ac = out[("A", "C")]        # a=2 b=2 c=2: balanced turnover
    assert ac["beta_sim"] == pytest.approx(0.5)
    assert ac["beta_sne"] == pytest.approx(ac["beta_sor"] - 0.5,
                                           abs=1e-6)
