"""Round-9 session-3 review sweep regressions: table_diff's
null-position hash collision (the table_cdf bug's twin).
"""

import pandas as pd

from niamoto_spark.sources import manifest as mf


def test_table_diff_detects_null_position_shift(spark, tmp_path):
    """(x, NULL) -> (NULL, x) hashed identically under bare xxhash64
    (NULL args are a no-op), so table_diff omitted the changed row."""
    p = str(tmp_path / "t")
    a = spark.createDataFrame([(1, "p", None), (2, "q", "r")],
                              "k int, x string, y string")
    b = spark.createDataFrame([(1, None, "p"), (2, "q", "r")],
                              "k int, x string, y string")
    mf.append(a, p)
    mf.overwrite(b, p)
    rows = {r["k"]: r["change"] for r in
            mf.table_diff(spark, p, 0, 1, key_cols=["k"]).collect()}
    assert rows == {1: "changed"}
