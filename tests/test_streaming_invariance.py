"""Batch-split invariance for the stateful streaming operators
(VERDICT r9 next-#6): a seeded multi-batch corpus where events also
arrive LATE (but within watermark), asserting that splitting the same
data across micro-batches never changes the result.

The r9 sessionization late-event fix (the monotonic fold, then this
round's interval fold) was found by review; these tests catch the next
fold regression mechanically:

- sessions: closed sessions from a 3-file out-of-order drain ==
  closed sessions from the single-file drain (closes are gap-proven
  only, so batch boundaries must be invisible).
- dedup: duplicates re-arriving late within the watermark are dropped
  identically whether they share a batch with the original or not.
- stream-stream join: purchase->click attribution pairs are identical
  under the split (watermark eviction happens later, never different).
"""

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

import os
import random

import pytest
from pyspark.sql import functions as F


def _corpus(seed: int):
    """Seeded events: (event_id, ts_sec, user_id, event_type, value).
    Late arrivals stay within 1h of the max timestamp and only extend
    OPEN (per-user latest) sessions — close-on-proof means an emitted
    session can't absorb late events, by design (documented in
    streaming/sessions.py)."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    base = 1_700_000_000
    for user in range(6):
        t = base + rng.randrange(0, 600)
        for _ in range(rng.randrange(8, 14)):
            t += rng.choice([30, 120, 500, 2500, 4000])
            rows.append((eid, t, user,
                         rng.choice(["click", "view", "purchase"]),
                         round(rng.random() * 100, 2)))
            eid += 1
    return rows


def _split(rows, seed: int, n_files: int = 3, gap_s: int = 1800):
    """Time-cut into ``n_files`` in-order batches, then deliver a random
    subset of each user's FINAL-session events one batch late.

    That is exactly the lateness the operator promises to absorb: a
    user's final session is still open when the drain ends, so its
    events merging from any later batch must be invisible.  Events of
    CLOSED sessions stay in time order — close-on-proof means an
    emitted session can never be extended (documented divergence in
    streaming/sessions.py), so arbitrary re-dealing is out of contract.
    """
    rng = random.Random(seed * 31 + 7)
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    size = (len(ordered) + n_files - 1) // n_files
    files = [ordered[i * size:(i + 1) * size] for i in range(n_files)]
    # final-session start per user (last gap > gap_s)
    by_user: dict = {}
    for r in ordered:
        by_user.setdefault(r[2], []).append(r)
    final_start = {}
    for u, rs in by_user.items():
        start = rs[0][1]
        for prev, cur in zip(rs, rs[1:]):
            if cur[1] - prev[1] > gap_s:
                start = cur[1]
        final_start[u] = start
    out = [list(f) for f in files]
    for i in range(n_files - 1):
        keep = []
        for r in out[i]:
            if r[1] >= final_start[r[2]] and rng.random() < 0.5:
                out[i + 1].append(r)   # arrives one batch LATE
            else:
                keep.append(r)
        out[i] = keep
    return [f for f in out if f]


def _write_stream_dir(spark, tmp_path, name, batches):
    import time as _time

    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        tmp = str(d / f".mk{i}")
        (spark.createDataFrame(
            rows, "event_id long, ts_sec long, user_id long, "
                  "event_type string, value double")
         .withColumn("ts", F.timestamp_seconds("ts_sec"))
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dest = str(d / f"b{i}.parquet")
        os.replace(os.path.join(tmp, part), dest)
        import shutil
        shutil.rmtree(tmp)
        bump = _time.time() + i * 60
        os.utime(dest, (bump, bump))
    return str(d)


def _drain(spark, src_dir, build, qname, max_files=1):
    schema = spark.read.parquet(src_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files).parquet(src_dir))
    out = build(stream)
    for q_ in [q_ for q_ in spark.streams.active if q_.name == qname]:
        q_.stop()
    q = (out.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(qname)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sessions_batch_split_invariance(spark, tmp_path, seed):
    from niamoto_spark.streaming.sessions import sessionize_stream

    rows = _corpus(seed)
    single = _write_stream_dir(spark, tmp_path, "single", [rows])
    split = _write_stream_dir(spark, tmp_path, "split",
                              _split(rows, seed))

    def build(stream):
        return sessionize_stream(stream.select("user_id", "ts"),
                                 gap_s=1800, watermark="2 hours")

    a = {tuple(r) for r in _drain(spark, single, build,
                                  f"inv_sess_a{seed}",
                                  max_files=9).collect()}
    b = {tuple(r) for r in _drain(spark, split, build,
                                  f"inv_sess_b{seed}").collect()}
    assert a == b, (f"seed {seed}: closed sessions differ under batch "
                    f"split (only-single {a - b}, only-split {b - a})")
    assert a, "corpus produced no closed sessions — test is vacuous"


@pytest.mark.parametrize("seed", [1, 2])
def test_dedup_batch_split_invariance(spark, tmp_path, seed):
    from niamoto_spark.streaming.dedup import dedup_stream

    rng = random.Random(seed)
    base = 1_700_000_000
    rows = []
    for i in range(40):
        text = f"doc {i % 25} body"       # 15 duplicate texts
        rows.append((i, base + i * 60, i % 5, text, 0.0))
    # every duplicate also re-arrives late within the 1h watermark
    late = [(100 + i, ts + 900, u, tx, v)
            for i, (eid, ts, u, tx, v) in enumerate(rows[:15])]
    allr = rows + late
    rng.shuffle(allr)

    single = _write_stream_dir(spark, tmp_path, "dsingle", [allr])
    split = _write_stream_dir(spark, tmp_path, "dsplit",
                              _split(allr, seed))

    def build(stream):
        return dedup_stream(
            stream.withColumnRenamed("event_type", "text"),
            text_col="text", ts_col="ts",
            watermark="1 hour").select("text")

    a = sorted(r["text"] for r in _drain(
        spark, single, build, f"inv_dd_a{seed}", max_files=99).collect())
    b = sorted(r["text"] for r in _drain(
        spark, split, build, f"inv_dd_b{seed}").collect())
    assert a == b, f"seed {seed}: dedup output differs under batch split"
    assert len(a) == len(set(a)), "duplicates survived dedup"


@pytest.mark.parametrize("seed", [1, 2])
def test_stream_upsert_replay_idempotence(spark, tmp_path, seed):
    """CDC sink (manifest.stream_upsert_to_table) across RESTART points
    (VERDICT r10 next-#7): (a) draining in two waves through one
    checkpoint equals one-shot; (b) re-running a fully-drained stream
    is a no-op; (c) replaying everything through a FRESH checkpoint
    (batch ids restart at 0) re-merges the same rows into the same
    state — exactly-once BY VALUE, not by batch id."""
    import shutil

    from niamoto_spark.sources import manifest as M

    rng = random.Random(seed)
    upd = []
    for i in range(30):
        # several updates per key across the stream; last-wins
        upd.append((i, rng.randrange(10), f"p{rng.randrange(3)}",
                    float(rng.randrange(1000))))
    rows = [(eid, key, pri, val) for eid, key, pri, val in upd]

    def write_wave(d, name, wave_rows, bump):
        import time as _time
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".mk")
        (spark.createDataFrame(
            wave_rows, "event_id long, k long, pri string, val double")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, part), os.path.join(d, name))
        shutil.rmtree(tmp)
        t = __import__("time").time() + bump
        os.utime(os.path.join(d, name), (t, t))

    def drain(src, tbl, ckpt):
        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = M.stream_upsert_to_table(stream, tbl, ckpt, "k")
        q.awaitTermination()

    def state(tbl):
        return sorted(tuple(r) for r in
                      M.read_table(spark, tbl).collect())

    base = str(tmp_path)
    # one-shot reference
    ref_src = os.path.join(base, "ref_src")
    write_wave(ref_src, "b0.parquet", rows, 0)
    drain(ref_src, os.path.join(base, "ref_tbl"),
          os.path.join(base, "ref_ckpt"))
    want = state(os.path.join(base, "ref_tbl"))

    # (a) two waves through ONE checkpoint (restart at a batch boundary)
    src = os.path.join(base, "src")
    tbl, ckpt = os.path.join(base, "tbl"), os.path.join(base, "ckpt")
    write_wave(src, "b0.parquet", rows[:17], 0)
    drain(src, tbl, ckpt)
    write_wave(src, "b1.parquet", rows[17:], 60)
    drain(src, tbl, ckpt)
    assert state(tbl) == want, (
        f"seed {seed}: restart at a batch boundary changed the table")

    # (b) re-running the drained stream is a no-op
    v_before = M.committed_version(tbl)
    drain(src, tbl, ckpt)
    assert state(tbl) == want
    assert M.committed_version(tbl) == v_before, (
        "re-draining a finished stream committed new versions")

    # (c) fresh checkpoint: batch ids restart at 0, rows re-merge to
    # the same final state (the batch-id guard must not BLOCK them —
    # it only dedups the LAST applied batch)
    drain(src, tbl, os.path.join(base, "ckpt2"))
    assert state(tbl) == want, (
        f"seed {seed}: replay through a fresh checkpoint corrupted "
        "the table (exactly-once-by-value broken)")


def test_left_outer_join_watermark_boundary(spark, tmp_path):
    """stream_left_outer_join at the exact window bound (VERDICT r10
    next-#7): a right row at left_ts + span_s is OUTSIDE the window
    (exclusive bound) while left_ts + span_s - 1 is inside; the
    never-matched left row is emitted with nulls EXACTLY ONCE, and a
    3-file split drain emits the identical set."""
    from niamoto_spark.streaming.joins import stream_left_outer_join

    base = 1_700_000_000
    span = 1800
    rows = [
        # purchase 1: click exactly AT the bound -> excluded, null row
        (1, base, 7, "purchase", 0.0),
        (2, base + span, 7, "click", 5.0),
        # purchase 3: click one second INSIDE the bound -> matched
        (3, base + 10_000, 7, "purchase", 0.0),
        (4, base + 10_000 + span - 1, 7, "click", 7.0),
        # purchase 5: no click at all -> null row at eviction
        (5, base + 20_000, 8, "purchase", 0.0),
    ]
    # end-of-stream flush pair far in the future, TWO staged batches
    # (watermark advances take effect one batch late — q220 recipe)
    flush1 = [(90, base + 40 * 86_400, -1, "purchase", 0.0),
              (91, base + 40 * 86_400, -1, "click", 0.0)]
    flush2 = [(92, base + 41 * 86_400, -1, "purchase", 0.0),
              (93, base + 41 * 86_400, -1, "click", 0.0)]

    def build(stream):
        purchases = (stream.where(F.col("event_type") == "purchase")
                     .select(F.col("event_id").alias("purchase_id"),
                             "user_id", F.col("ts").alias("p_ts")))
        clicks = (stream.where(F.col("event_type") == "click")
                  .select("user_id", F.col("ts").alias("c_ts"),
                          F.col("event_id").alias("click_id")))
        return stream_left_outer_join(
            purchases, clicks, on="user_id", left_ts="p_ts",
            right_ts="c_ts", span_s=span
        ).select("purchase_id", "click_id")

    single = _write_stream_dir(spark, tmp_path, "losingle",
                               [rows, flush1, flush2])
    split = _write_stream_dir(
        spark, tmp_path, "losplit",
        [rows[:2], rows[2:4], rows[4:], flush1, flush2])

    a = [tuple(r) for r in _drain(spark, single, build,
                                  "inv_lo_a").collect()]
    b = [tuple(r) for r in _drain(spark, split, build,
                                  "inv_lo_b").collect()]
    real_a = sorted(t for t in a if t[0] < 90)
    real_b = sorted(t for t in b if t[0] < 90)
    assert real_a == [(1, None), (3, 4), (5, None)], real_a
    assert real_b == real_a, (
        f"left-outer emissions differ under batch split: {real_a} vs "
        f"{real_b}")
    # exactly once: no duplicate null-emissions across eviction batches
    assert len(real_a) == len(set(real_a))


@pytest.mark.parametrize("seed", [1])
def test_stream_join_batch_split_invariance(spark, tmp_path, seed):
    from niamoto_spark.streaming.joins import stream_interval_join

    rows = _corpus(seed)
    single = _write_stream_dir(spark, tmp_path, "jsingle", [rows])
    split = _write_stream_dir(spark, tmp_path, "jsplit",
                              _split(rows, seed))

    def build(stream):
        purchases = (stream.where(F.col("event_type") == "purchase")
                     .select(F.col("event_id").alias("purchase_id"),
                             "user_id", F.col("ts").alias("p_ts")))
        clicks = (stream.where(F.col("event_type") == "click")
                  .select("user_id", F.col("ts").alias("c_ts"),
                          F.col("event_id").alias("click_id")))
        return stream_interval_join(
            clicks, purchases, on="user_id", point_ts="c_ts",
            interval_ts="p_ts", span_s=3600
        ).select("purchase_id", "click_id")

    a = {tuple(r) for r in _drain(spark, single, build,
                                  "inv_j_a", max_files=99).collect()}
    b = {tuple(r) for r in _drain(spark, split, build,
                                  "inv_j_b").collect()}
    assert a == b, ("stream-stream join pairs differ under batch split "
                    f"(only-single {a - b}, only-split {b - a})")
    assert a, "corpus produced no join pairs — test is vacuous"


def test_left_outer_join_live_mode_drop_contract(spark, tmp_path):
    """LIVE-mode lateness contract (VERDICT r12 next-#6): with a
    CONFIGURED watermark (not the q220 replay horizon), a click whose
    file arrives after the watermark has advanced past it is dropped —
    and the drop set must be (a) exactly the predicted rows, (b)
    deterministic across repeated drains of the same file sequence, and
    (c) explicitly DIFFERENT when the same bytes arrive in one file,
    which is the documented reason q220's REPLAY mode widens lateness
    to the historical span instead."""
    from niamoto_spark.streaming.joins import stream_left_outer_join

    base = 1_700_000_000
    span, late = 1800, 1800
    # file A: P1+C1 match; P2 awaiting its click; a clock PAIR at
    # base+10000 advances BOTH sides' watermarks (global wm policy is
    # min-across-nodes) to base+10000-late = base+8200 after batch A
    file_a = [(1, base, 7, "purchase", 0.0),
              (2, base + 100, 7, "click", 5.0),
              (3, base + 120, 8, "purchase", 0.0),
              (80, base + 10_000, -1, "purchase", 0.0),
              (81, base + 10_000, -1, "click", 0.0)]
    # file B: a second clock pair — during THIS batch the committed
    # watermark (base+8200) evicts P2's window as unmatched.  A late
    # row can still join live state (eviction runs after inputs), so
    # the drop only becomes observable one batch after eviction.
    file_b = [(82, base + 12_000, -1, "purchase", 0.0),
              (83, base + 12_000, -1, "click", 0.0)]
    # file C: C2 at base+150 arrives after P2's state is gone ->
    # contributes nothing, and P2's null row must not duplicate
    file_c = [(4, base + 150, 8, "click", 7.0)]
    flush1 = [(90, base + 40 * 86_400, -1, "purchase", 0.0),
              (91, base + 40 * 86_400, -1, "click", 0.0)]
    flush2 = [(92, base + 41 * 86_400, -1, "purchase", 0.0),
              (93, base + 41 * 86_400, -1, "click", 0.0)]

    def build(stream):
        purchases = (stream.where(F.col("event_type") == "purchase")
                     .select(F.col("event_id").alias("purchase_id"),
                             "user_id", F.col("ts").alias("p_ts")))
        clicks = (stream.where(F.col("event_type") == "click")
                  .select("user_id", F.col("ts").alias("c_ts"),
                          F.col("event_id").alias("click_id")))
        return stream_left_outer_join(
            purchases, clicks, on="user_id", left_ts="p_ts",
            right_ts="c_ts", span_s=span,
            watermark=f"{late} seconds"
        ).select("purchase_id", "click_id")

    def real(rows):
        return sorted(t for t in rows if t[0] is not None and t[0] < 80)

    split = _write_stream_dir(spark, tmp_path, "lv_split",
                              [file_a, file_b, file_c, flush1, flush2])
    got1 = real(tuple(r) for r in _drain(
        spark, split, build, "inv_lv_1").collect())
    # C2 arrives after eviction -> P2 resolved as the null row, exactly
    # once; the late click contributes nothing
    assert got1 == [(1, 2), (3, None)], got1

    # (b) deterministic: an independent drain of the same sequence
    got2 = real(tuple(r) for r in _drain(
        spark, split, build, "inv_lv_2").collect())
    assert got2 == got1

    # (c) same bytes, one file: C2 shares the batch with its purchase,
    # joins live state, and matches — the delivery-order sensitivity
    # that makes live mode's drop set a DELIVERY contract, not a data
    # one (and why q220's REPLAY mode widens lateness to the span)
    merged = _write_stream_dir(spark, tmp_path, "lv_merged",
                               [file_a + file_b + file_c, flush1, flush2])
    got3 = real(tuple(r) for r in _drain(
        spark, merged, build, "inv_lv_3").collect())
    assert got3 == [(1, 2), (3, 4)], got3
