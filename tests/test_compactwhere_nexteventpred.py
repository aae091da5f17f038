"""compact_where (sources/manifest.py) and next_event_baseline
(operators/timeseries.py)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from niamoto_spark.sources import manifest


@pytest.fixture()
def tpath():
    p = os.path.join(tempfile.gettempdir(), "niamoto_test_cw")
    shutil.rmtree(p, ignore_errors=True)
    yield p
    shutil.rmtree(p, ignore_errors=True)


class TestCompactWhere:
    def _seed(self, spark, tpath):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k long, v string")
        # two appends with disjoint ranges -> separable zone maps
        manifest.append_with_stats(df.where("k < 50").repartition(2),
                                   tpath, stats_cols=["k"])
        manifest.append_with_stats(df.where("k >= 50").repartition(2),
                                   tpath, stats_cols=["k"])
        return df

    def test_untouched_files_carry_by_reference(self, spark, tpath):
        self._seed(spark, tpath)
        v0 = manifest.committed_version(tpath)
        doc0 = manifest._read_manifest(tpath, v0)
        hi_files = [f for f in doc0["files"]
                    if doc0["stats"][f]["k"][0] >= 50]
        v1, rewritten, carried = manifest.compact_where(
            spark, tpath, "k", 0, 49, target_files=1)
        assert v1 == v0 + 1 and rewritten >= 1 and carried >= 1
        doc1 = manifest._read_manifest(tpath, v1)
        # the >=50 files are the same physical paths, stats intact
        for f in hi_files:
            assert f in doc1["files"]
            assert doc1["stats"][f] == doc0["stats"][f]

    def test_rows_identical_after_partial_compaction(self, spark,
                                                     tpath):
        df = self._seed(spark, tpath)
        manifest.compact_where(spark, tpath, "k", 0, 49)
        got = sorted(tuple(r) for r in
                     manifest.read_table(spark, tpath).collect())
        want = sorted(tuple(r) for r in df.collect())
        assert got == want

    def test_noop_outside_all_ranges(self, spark, tpath):
        self._seed(spark, tpath)
        v0 = manifest.committed_version(tpath)
        v1, rewritten, carried = manifest.compact_where(
            spark, tpath, "k", 1000, 2000)
        assert v1 == v0 and rewritten == 0  # no new version committed

    def test_clustering_tightens_pruning(self, spark, tpath):
        df = spark.createDataFrame([(i % 100, i) for i in range(1000)],
                                   "k long, i long")
        # interleaved appends: every file spans the whole key range
        for j in range(4):
            manifest.append_with_stats(
                df.where(F.col("i") % 4 == j).repartition(2),
                tpath, stats_cols=["k"])
        _, _, skipped_before = manifest.read_table_pruned(
            spark, tpath, "k", 0, 9)
        manifest.compact_where(spark, tpath, "k", 0, 100,
                               target_files=8)
        _, read_after, skipped_after = manifest.read_table_pruned(
            spark, tpath, "k", 0, 9)
        assert skipped_before == 0
        assert skipped_after > 0 and read_after < 8


class TestNextEventBaseline:
    def test_majority_successor(self, spark):
        from niamoto_spark.operators.timeseries import (
            next_event_baseline)

        rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
                (2, 1, "a"), (2, 2, "c")]
        df = spark.createDataFrame(rows, "u long, o long, e string")
        got = {r["state"]: r for r in
               next_event_baseline(df, "u", "o", "e").collect()}
        a = got["a"]
        assert a["predicted_next"] == "b"  # b twice, c once
        assert a["p_next"] == pytest.approx(2 / 3)
        assert a["n_transitions"] == 3

    def test_sequences_do_not_cross_users(self, spark):
        from niamoto_spark.operators.timeseries import (
            next_event_baseline)

        rows = [(1, 1, "a"), (2, 1, "b")]
        df = spark.createDataFrame(rows, "u long, o long, e string")
        assert next_event_baseline(df, "u", "o", "e").count() == 0

    def test_deterministic_tiebreak(self, spark):
        from niamoto_spark.operators.timeseries import (
            next_event_baseline)

        rows = [(1, 1, "s"), (1, 2, "z"), (2, 1, "s"), (2, 2, "a")]
        df = spark.createDataFrame(rows, "u long, o long, e string")
        r = next_event_baseline(df, "u", "o", "e").first()
        assert r["predicted_next"] == "a"  # tie broken alphabetically
