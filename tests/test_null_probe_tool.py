"""The NULL-injection harness itself must stay deterministic and
runnable — the 356-query differential sweep runs as a tool
(tools/null_probe.py), but its injection layer is pinned here so a
refactor can't silently change which cells go NULL (that would turn
every recorded probe result incomparable)."""

import duckdb

from tools.null_probe import first_diffs, inject_nulls


def test_first_diffs_points_at_the_missing_row_not_its_neighbors():
    # One missing row must print ITSELF — the old zip() pairing shifted
    # every subsequent pair, reporting the neighbors instead.
    ns = ["a", "b", "d", "e"]
    no = ["a", "b", "c", "d", "e"]
    s_only, o_only = first_diffs(ns, no)
    assert s_only == []
    assert o_only == ["c"]
    # duplicate-count-only differences still surface (multiset diff)
    s_only, o_only = first_diffs(["a", "a", "b"], ["a", "b", "b"])
    assert s_only == ["a"]
    assert o_only == ["b"]


def test_injection_is_deterministic_and_tracks_rate(tmp_path):
    con = duckdb.connect()
    src = tmp_path / "src"
    src.mkdir()
    con.execute(
        f"COPY (SELECT range AS a, 'x' || range AS b FROM range(2000)) "
        f"TO '{src}/lineitem.parquet' (FORMAT PARQUET)")
    # the tool iterates its TABLES list; give it just one real file by
    # symlinking the rest
    import tools.null_probe as np_tool
    orig_tables = np_tool.TABLES
    np_tool.TABLES = ["lineitem"]
    try:
        d1, d2 = tmp_path / "o1", tmp_path / "o2"
        inject_nulls(str(src), str(d1), rate=0.1, seed=42)
        inject_nulls(str(src), str(d2), rate=0.1, seed=42)
        r1 = con.execute(
            f"SELECT * FROM '{d1}/lineitem.parquet' ORDER BY a NULLS "
            "FIRST, b NULLS FIRST").fetchall()
        r2 = con.execute(
            f"SELECT * FROM '{d2}/lineitem.parquet' ORDER BY a NULLS "
            "FIRST, b NULLS FIRST").fetchall()
        assert r1 == r2, "same (src, rate, seed) must be byte-stable"
        n_null_a = con.execute(
            f"SELECT count(*) FROM '{d1}/lineitem.parquet' "
            "WHERE a IS NULL").fetchone()[0]
        n_null_b = con.execute(
            f"SELECT count(*) FROM '{d1}/lineitem.parquet' "
            "WHERE b IS NULL").fetchone()[0]
        assert 120 <= n_null_a <= 280, n_null_a   # ~10% of 2000
        assert 120 <= n_null_b <= 280, n_null_b
        # different seeds must null different cells
        d3 = tmp_path / "o3"
        inject_nulls(str(src), str(d3), rate=0.1, seed=43)
        r3 = con.execute(
            f"SELECT * FROM '{d3}/lineitem.parquet' ORDER BY a NULLS "
            "FIRST, b NULLS FIRST").fetchall()
        assert r3 != r1
    finally:
        np_tool.TABLES = orig_tables


def test_chain_mutations_threads_steps_and_cleans_tmps(tmp_path):
    """probe_common.chain_mutations: each step sees the previous
    step's output, the LAST step writes dst_dir, intermediates are
    removed."""
    import os

    from tools.probe_common import chain_mutations

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("0")
    dst = tmp_path / "out" / "final"
    (tmp_path / "out").mkdir()

    def bump(s, d):
        os.makedirs(d, exist_ok=True)
        v = int(open(os.path.join(s, "a.txt")).read())
        open(os.path.join(d, "a.txt"), "w").write(str(v + 1))

    chain_mutations(str(src), str(dst), [bump, bump, bump])
    assert open(dst / "a.txt").read() == "3"
    assert (src / "a.txt").read_text() == "0"        # src untouched
    leftovers = [p for p in os.listdir(tmp_path / "out")
                 if p.startswith("chain")]
    assert leftovers == []
