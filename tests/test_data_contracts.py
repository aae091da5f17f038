"""Data-contract assertions the differential gate silently RELIES on
(ADVICE r11): lanes that rescale event values to integer cents (q185,
q214, q273, ...) assume values are exactly 2dp — if gate data ever
carried >2dp values, BOTH engines would compute stats of the rounded
data and the differential could not detect the semantic shift.  Pin
the assumption here, on the real gate bytes, so a testdata
regeneration that breaks it fails loudly instead of silently."""

import os

import duckdb
import pytest

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_value_is_exactly_2dp(sf_dir):
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet' "
        "WHERE value IS NOT NULL "
        "AND abs(value * 100 - round(value * 100)) > 1e-6").fetchone()[0]
    assert n == 0, (
        f"{n} events.value rows are not 2dp in {sf_dir}: the "
        "integer-cents rescaling lanes (q185/q214/q273) silently "
        "round — revisit their data contract")
