"""Distribution-drift metrics (operators/drift.py): PSI, two-sample KS,
chi-square independence — validated against naive Python."""

import math
import random

import pytest
from pyspark.sql import functions as F


def _psi_naive(ref, cur, bins):
    mn, mx = min(ref), max(ref)
    span = (mx - mn) or 1.0

    def hist(xs):
        h = [0] * bins
        for x in xs:
            b = min(max(int((x - mn) / span * bins), 0), bins - 1)
            h[b] += 1
        return h

    hr, hc = hist(ref), hist(cur)
    out = 0.0
    for r, c in zip(hr, hc):
        p = (r + 0.5) / (len(ref) + 0.5 * bins)
        q = (c + 0.5) / (len(cur) + 0.5 * bins)
        out += (p - q) * math.log(p / q)
    return out


def test_psi_matches_naive(spark):
    from niamoto_spark.operators.drift import population_stability

    rng = random.Random(3)
    ref = [rng.gauss(50, 10) for _ in range(500)]
    cur = [rng.gauss(58, 12) for _ in range(400)]
    dr = spark.createDataFrame([(x,) for x in ref], "x double")
    dc = spark.createDataFrame([(x,) for x in cur], "x double")
    out = population_stability(dr, dc, "x", n_bins=10)
    psi = out.agg(F.sum("contrib")).first()[0]
    assert psi == pytest.approx(_psi_naive(ref, cur, 10), abs=5e-3)
    assert out.count() == 10
    # shifted distribution must register as major drift
    assert psi > 0.25


def test_psi_identical_slices_near_zero(spark):
    from niamoto_spark.operators.drift import population_stability

    xs = [(float(i % 37),) for i in range(500)]
    d = spark.createDataFrame(xs, "x double")
    psi = (population_stability(d, d, "x", n_bins=8)
           .agg(F.sum("contrib")).first()[0])
    assert abs(psi) < 1e-6


def _ks_naive(a, b):
    vals = sorted(set(a) | set(b))
    best = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


def test_ks_matches_naive(spark):
    from niamoto_spark.operators.drift import ks_statistic

    rng = random.Random(5)
    a = [rng.randint(0, 60) for _ in range(300)]
    b = [rng.randint(10, 70) for _ in range(250)]
    da = spark.createDataFrame([(x,) for x in a], "x int")
    db = spark.createDataFrame([(x,) for x in b], "x int")
    row = ks_statistic(da, db, "x").first()
    assert row.n_a == 300 and row.n_b == 250
    assert row.ks_stat == pytest.approx(round(_ks_naive(a, b), 4))


def test_ks_identical_is_zero(spark):
    from niamoto_spark.operators.drift import ks_statistic

    d = spark.createDataFrame([(i % 9,) for i in range(90)], "x int")
    assert ks_statistic(d, d, "x").first().ks_stat == 0.0


def _chi2_naive(pairs):
    from collections import Counter
    obs = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    rb = Counter(b for _, b in pairs)
    n = len(pairs)
    stat = 0.0
    # iterate the FULL cross product: unobserved cells contribute
    # (0 - E)^2 / E, which an observed-cells-only loop drops
    for a in ra:
        for b in rb:
            o = obs.get((a, b), 0)
            e = ra[a] * rb[b] / n
            stat += (o - e) ** 2 / e
    return stat, (len(ra) - 1) * (len(rb) - 1)


def test_chi2_matches_naive(spark):
    from niamoto_spark.operators.drift import chi_square_independence

    rng = random.Random(9)
    pairs = [(rng.choice("xyz"), rng.choice("pqrs")) for _ in range(400)]
    # inject dependence
    pairs += [("x", "p")] * 60
    df = spark.createDataFrame(pairs, "a string, b string")
    row = chi_square_independence(df, "a", "b").first()
    ref_stat, ref_dof = _chi2_naive(pairs)
    assert row.chi2 == pytest.approx(round(ref_stat, 4), abs=1e-3)
    assert row.dof == ref_dof
    assert row.n == len(pairs)


def test_chi2_perfect_independence_zero(spark):
    from niamoto_spark.operators.drift import chi_square_independence

    # balanced product table: observed == expected everywhere
    pairs = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(pairs, "a string, b string")
    assert chi_square_independence(df, "a", "b").first().chi2 == 0.0


def test_chi2_sparse_table_counts_zero_cells(spark):
    """Perfectly-associated 2x2 with two unobserved cells: chi2 = n,
    not n/2 — the zero cells contribute (0-E)^2/E and the identity
    chi2 = n(sum o^2/(ra rb) - 1) accounts for them exactly."""
    from niamoto_spark.operators.drift import chi_square_independence

    df = spark.createDataFrame([("a", "x")] * 8 + [("b", "y")] * 8,
                               "a string, b string")
    row = chi_square_independence(df, "a", "b").first()
    assert row.chi2 == pytest.approx(16.0)
    ref_stat, ref_dof = _chi2_naive([("a", "x")] * 8 + [("b", "y")] * 8)
    assert row.chi2 == pytest.approx(round(ref_stat, 4))
    assert row.dof == ref_dof == 1
