"""Property-based tests (hypothesis) — beyond the reference's own test
strategy (SURVEY §5 notes it has none).  Kept to a handful of cheap,
high-leverage invariants; Spark round trips are bounded with small sizes
and few examples to keep the suite fast."""

# Slow tier (r15, verdict item 1): this long refdiff/e2e/fuzz suite is
# opt-in so the DEFAULT `pytest tests/` finishes inside the driver's
# verify window (the r14 driver run was cut off at 95% after ~30 min).
# Run it with NIAMOTO_SLOW_TESTS=1 — the round's closing records include
# a full slow-tier pass.
import os as _os  # noqa: E402

import pytest as _pytest  # noqa: E402

pytestmark = _pytest.mark.skipif(
    not _os.environ.get("NIAMOTO_SLOW_TESTS"),
    reason="slow tier: set NIAMOTO_SLOW_TESTS=1")

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from niamoto_spark.plans.guards import UnsafeQueryError, safe_eval

settings.register_profile("ci", max_examples=15, deadline=None)
settings.load_profile("ci")


values = st.lists(st.floats(min_value=0.0, max_value=1000.0,
                            allow_nan=False, width=32),
                  min_size=1, max_size=60)


@given(values)
def test_bin_index_matches_np_histogram(spark, xs):
    from pyspark.sql import functions as F

    from niamoto_spark.functions import bin_index

    edges = [0, 100, 250, 500, 1000]
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (df.select(bin_index(F.col("x"), edges).alias("b"))
             .groupBy("b").count().collect())
    counts = {r["b"]: r["count"] for r in got if r["b"] is not None}
    np_counts, _ = np.histogram(xs, bins=edges)
    for i, c in enumerate(np_counts):
        assert counts.get(i, 0) == c


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=20))
def test_shannon_matches_numpy(spark, counts):
    from niamoto_spark.operators.ecological import shannon_pielou

    df = spark.createDataFrame(pd.DataFrame({"g": ["x"] * len(counts),
                                             "count": counts}))
    r = shannon_pielou(df, ["g"]).collect()[0]
    nz = np.array([c for c in counts if c > 0], dtype=float)
    if len(nz) == 0:
        assert r["shannon"] == 0.0
    else:
        p = nz / nz.sum()
        assert r["shannon"] == pytest.approx(round(float(-(p * np.log2(p)).sum()), 4),
                                             abs=1e-6)


@given(st.text(max_size=80))
def test_token_count_never_negative_and_ws_invariant(spark, text):
    from pyspark.sql import functions as F

    from niamoto_spark.functions import token_count

    df = spark.createDataFrame(pd.DataFrame({"t": [text, f"  {text}  "]}))
    a, b = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert a >= 0 and a == b  # padding never changes the token count


@given(st.text(alphabet="abc+-*/() ", max_size=30))
def test_safe_eval_never_escapes(expr):
    """Whatever the input, safe_eval either computes or raises UnsafeQueryError /
    a plain math error — never touches builtins."""
    try:
        safe_eval(expr, {"a": 1.0, "b": 2.0, "c": 3.0})
    except (UnsafeQueryError, SyntaxError, ZeroDivisionError, TypeError,
            KeyError, ValueError, OverflowError, NameError, MemoryError):
        pass  # any *contained* failure is fine; escaping the sandbox is not


word = st.text(alphabet="abcdefg", min_size=1, max_size=5)
doc_text = st.lists(word, min_size=0, max_size=40).map(" ".join)


@given(st.lists(doc_text, min_size=1, max_size=5),
       st.integers(min_value=2, max_value=8),
       st.integers(min_value=0, max_value=3))
def test_chunking_covers_every_token_with_exact_overlap(spark, texts,
                                                        chunk, overlap):
    """Invariant: de-overlapped chunk concatenation reconstructs the
    original token stream exactly (no token lost, none duplicated)."""
    from hypothesis import assume

    from niamoto_spark.operators.text import chunk_documents

    assume(overlap < chunk)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=chunk,
                          overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        toks = text.split()
        chunks = [r["chunk_text"].split() for r in
                  sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])]
        if not toks:
            assert chunks == []
            continue
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            assert c[:overlap] == rebuilt[len(rebuilt) - overlap:] \
                if overlap else True       # shared prefix is the overlap
            rebuilt.extend(c[overlap:])
        assert rebuilt == toks


@given(st.text(alphabet="abcdef \n.", min_size=0, max_size=80))
def test_char_entropy_bounds(spark, text):
    """0 <= H <= log2(#distinct chars) for any document."""
    import math

    from niamoto_spark.operators.text import char_entropy

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    (row,) = char_entropy(df, "doc_id", "text").collect()
    h = row["char_entropy"]
    distinct = len(set(text.lower()))
    assert h >= 0.0
    assert h <= math.log2(distinct) + 1e-3 if distinct > 1 else h == 0.0


@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=50, unique=True),
       st.floats(min_value=0.0, max_value=1.0))
def test_stratified_sample_monotone_in_rate(spark, ids, rate):
    """A kept row stays kept at any HIGHER rate (hash-threshold sampling
    is monotone — the property that makes rate changes safe in prod)."""
    from niamoto_spark.operators.text import stratified_sample

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "src": ["s"] * len(ids)}))
    low = {r["doc_id"] for r in
           stratified_sample(df, "doc_id", "src", {"s": rate}).collect()}
    high = {r["doc_id"] for r in
            stratified_sample(df, "doc_id", "src",
                              {"s": min(rate + 0.3, 1.0)}).collect()}
    assert low <= high


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=100),
       st.sampled_from(["444", "420"]),
       st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_never_crashes_and_bounds_error(h, w, quality,
                                                       subsample, dri, seed):
    """Any uint8 RGB image, any quality/sampling/restart combination must
    encode to a decodable stream with bounded reconstruction error — the
    Huffman/bit-stuffing edge cases (0xFF bytes, ZRL runs, category-11 DC
    diffs at quality 100) are exactly what random inputs exercise."""
    from niamoto_spark.sources.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed % 2**31)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    data = encode_jpeg(img, quality=quality, subsample=subsample,
                       restart_interval=dri)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    # worst case (quality 1, chroma-subsampled noise) still lands within
    # the uint8 range midpoint; high quality must be genuinely close
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err <= 128.0
    if quality >= 95 and subsample == "444":
        assert err < 16.0


@given(st.lists(st.tuples(st.integers(0, 3),      # key
                          st.integers(0, 500),    # start
                          st.integers(1, 200)),   # length
                min_size=1, max_size=8),
       st.lists(st.tuples(st.integers(0, 3),      # key
                          st.integers(0, 700)),   # point ts
                min_size=1, max_size=12),
       st.sampled_from([1, 16, 64, 1000]))
@settings(max_examples=10, deadline=None)
def test_interval_join_equals_theta_join(spark, ivs, pts, granule):
    """Granule co-partitioning must reproduce naive theta-join semantics
    for ANY interval layout and ANY granule size."""
    from niamoto_spark.operators.interval import interval_join

    intervals = spark.createDataFrame(
        [(f"k{k}", i, s, s + ln) for i, (k, s, ln) in enumerate(ivs)],
        ["key", "iv_id", "start_s", "end_s"])
    points = spark.createDataFrame(
        [(f"k{k}", t) for k, t in pts], ["key", "pt_s"])
    got = {(r["iv_id"], r["pt_s"])
           for r in interval_join(points, intervals, on="key",
                                  point_ts="pt_s", start_col="start_s",
                                  end_col="end_s", granule_s=granule,
                                  max_granules=10_000).collect()}
    want = {(i, t) for i, (k, s, ln) in enumerate(ivs)
            for (pk, t) in pts if pk == k and s <= t < s + ln}
    assert got == want


@given(st.integers(0, 2**31 - 1), st.integers(2, 6))
@settings(max_examples=10, deadline=None)
def test_winnowing_detection_guarantee(spark, seed, w):
    """For ANY pair of documents sharing a span >= gram + w - 1, the
    winnowed fingerprints must still collide (the MOSS guarantee), and
    winnowed fingerprints are always a subset of the full set."""
    from niamoto_spark.operators.substrings import (substring_dup_pairs,
                                                    substring_fingerprints)

    rng = np.random.RandomState(seed % 2**31)
    words = ["w%02d" % v for v in rng.randint(0, 99, size=30)]
    shared = " ".join(words)          # ~120 chars >> 20 + w - 1
    pre = " ".join("p%02d" % v for v in rng.randint(0, 99, size=6))
    suf = " ".join("s%02d" % v for v in rng.randint(0, 99, size=6))
    df = spark.createDataFrame(
        [(1, pre + " " + shared), (2, shared + " " + suf)],
        ["doc_id", "text"])
    pairs = substring_dup_pairs(df, "doc_id", "text", gram_chars=20,
                                winnow_window=w, max_gram_df=None)
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(1, 2)]
    full = {(r["doc_id"], r["gh"]) for r in substring_fingerprints(
        df, "doc_id", "text", 20).collect()}
    winnowed = {(r["doc_id"], r["gh"]) for r in substring_fingerprints(
        df, "doc_id", "text", 20, winnow_window=w).collect()}
    assert winnowed <= full


@given(st.lists(st.tuples(st.integers(0, 500), st.integers(1, 300),
                          st.floats(1.0, 100.0, allow_nan=False,
                                    width=32)),
                min_size=1, max_size=15))
def test_interval_allocate_conserves_mass_property(spark, rows):
    """Σ allocated == value for every interval, any granule alignment."""
    from pyspark.sql import functions as F

    from niamoto_spark.operators.timeseries import interval_allocate

    data = [(i, s, s + d, float(v)) for i, (s, d, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, s long, e long, v double")
    out = (interval_allocate(df, "s", "e", "v", granule_s=100,
                             round_dp=9)
           .groupBy("id").agg(F.sum("allocated").alias("tot"),
                              F.sum("overlap_s").alias("ov")))
    got = {r["id"]: r for r in out.collect()}
    for i, (s, d, v) in enumerate(rows):
        assert got[i]["ov"] == d                       # exact seconds
        assert got[i]["tot"] == pytest.approx(v, rel=1e-6)


@given(st.lists(st.tuples(st.integers(1, 5), st.integers(0, 50),
                          st.one_of(st.none(),
                                    st.integers(0, 9))),
                min_size=1, max_size=30))
def test_golden_record_matches_python_reference(spark, rows):
    """golden_record == last-non-null-by-order per key, vs a driver
    reference implementation."""
    from niamoto_spark.operators.cleaning import golden_record

    data = [(k, o, i, None if v is None else str(v))
            for i, (k, o, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, o long, tb long, v string")
    got = {r["k"]: r["v"] for r in
           golden_record(df, "k", "o", "tb", ["v"]).collect()}
    ref = {}
    for k, o, tb, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        if v is not None:
            ref[k] = v
        ref.setdefault(k, None)
    assert got == ref


@given(st.lists(st.tuples(st.integers(1, 8), st.integers(0, 1000)),
                min_size=1, max_size=40))
def test_cumulative_unique_final_equals_distinct(spark, rows):
    from niamoto_spark.operators.timeseries import cumulative_unique

    df = spark.createDataFrame(rows, "u long, t long")
    out = sorted(cumulative_unique(df, "u", "t", granule_s=100)
                 .collect(), key=lambda r: r["bucket"])
    assert out[-1]["cum_entities"] == len({u for u, _ in rows})
    # monotone, and increments equal the new_entities column
    for a, b in zip(out, out[1:]):
        assert b["cum_entities"] - a["cum_entities"] == b["new_entities"]


# --- round-8 invariants ----------------------------------------------------

_urlchars = st.text(
    alphabet=st.sampled_from("abcXYZ09-._~"), min_size=1, max_size=12)


@given(host=_urlchars, path=_urlchars, q1=_urlchars, q2=_urlchars)
def test_url_normalize_idempotent_and_tracking_free(spark, host, path,
                                                    q1, q2):
    """normalize(normalize(u)) == normalize(u), and no tracking param
    survives — for any synthesized URL shape."""
    from pyspark.sql import functions as F

    from niamoto_spark.operators.web import url_normalize

    url = (f"HTTPS://WWW.{host}.COM:443/{path}/"
           f"?utm_source={q1}&b={q2}&gclid=x#frag")
    df = spark.createDataFrame(pd.DataFrame({"url": [url]}))
    once = url_normalize(df, "url").select(
        F.col("url_norm").alias("url")).collect()[0]["url"]
    twice = url_normalize(
        spark.createDataFrame(pd.DataFrame({"url": [once]})),
        "url").collect()[0]["url_norm"]
    assert twice == once
    assert "utm_" not in once and "gclid" not in once
    assert "#" not in once and ":443" not in once


@given(st.lists(st.tuples(st.integers(0, 1000),
                          st.floats(0, 100, allow_nan=False, width=32)),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
def test_twa_bounded_by_min_max(spark, samples):
    from niamoto_spark.operators.timeseries import time_weighted_avg

    rows = [("k", t, float(v), t) for t, v in samples]
    df = spark.createDataFrame(
        rows, "k string, t long, v double, i long")
    twa = time_weighted_avg(df, "k", "t", "v", "i").collect()[0]["twa"]
    vs = [v for _, v in samples]
    assert min(vs) - 1e-4 <= twa <= max(vs) + 1e-4


@given(st.lists(st.tuples(st.integers(0, 500),
                          st.floats(0, 50, allow_nan=False, width=32)),
                min_size=1, max_size=30, unique_by=lambda t: t[0]))
def test_ohlc_low_le_open_close_le_high(spark, samples):
    from niamoto_spark.operators.timeseries import ohlc_bars

    rows = [("k", t, float(v), t) for t, v in samples]
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    for r in ohlc_bars(df, "k", "t", "v", "i", granule_s=100).collect():
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


@given(st.lists(st.tuples(st.integers(0, 300),
                          st.sampled_from("AB")),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
def test_state_periods_partition_rows_exactly(spark, evs):
    """Islands partition the input: run lengths sum to the row count
    and no period crosses a state change."""
    from niamoto_spark.operators.timeseries import state_periods

    rows = [("u", t, s, t) for t, s in evs]
    df = spark.createDataFrame(rows, "k string, t long, s string, i long")
    out = state_periods(df, "k", "t", "s", "i").collect()
    assert sum(r["run_length"] for r in out) == len(evs)
    spans = sorted((r["start"], r["end"], r["s"]) for r in out)
    by_t = dict((t, s) for t, s in evs)
    for lo, hi, state in spans:
        for t in [t for t, _ in evs if lo <= t <= hi]:
            assert by_t[t] == state


@given(st.lists(st.floats(0, 1000, allow_nan=False, width=32),
                min_size=1, max_size=40))
def test_gini_in_unit_interval(spark, xs):
    from niamoto_spark.operators.aggregation import gini_coefficient

    df = spark.createDataFrame([("g", float(x)) for x in xs],
                               "g string, x double")
    g = gini_coefficient(df, "g", "x").collect()[0]["gini"]
    assert -1e-9 <= g < 1.0


@given(st.lists(st.tuples(st.integers(0, 400),
                          st.floats(0, 100, allow_nan=False, width=32)),
                min_size=2, max_size=40, unique_by=lambda t: t[0]))
def test_counter_rate_increase_nonnegative(spark, samples):
    from niamoto_spark.operators.timeseries import counter_rate

    rows = [("k", t, float(v), t) for t, v in samples]
    df = spark.createDataFrame(rows, "k string, t long, v double, i long")
    r = counter_rate(df, "k", "t", "v", "i").collect()[0]
    assert r["increase"] >= 0
    assert r["rate_per_s"] >= 0


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=60))
def test_bitmap_distinct_matches_set(spark, ids):
    from niamoto_spark.operators.sketches import bitmap_distinct_rollup

    df = spark.createDataFrame([("g", i) for i in ids], "g string, id long")
    out = bitmap_distinct_rollup(df, "g", "id",
                                 rollup_to_total=False).collect()
    assert out[0]["n_distinct"] == len(set(ids))
