"""Property tests: hypotests operators vs pure-Python references over
hypothesis-generated inputs. The unit tests pin hand cases; these sweep
the tie-heavy random space where rank conventions usually break.
Example counts are kept small — every example runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from big_data_graph_analysis_with_spark_spark.operators import hypotests, olap

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small positive cents values with deliberate tie mass
centss = st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=12)


def _doubled_ranks(values: list[int]) -> dict[int, int]:
    """value -> doubled tie-averaged pooled rank (2*cum_before + t + 1)."""
    out = {}
    seen = 0
    for v in sorted(set(values)):
        t = values.count(v)
        out[v] = 2 * seen + t + 1
        seen += t
    return out


def _orders_for(spark, cents_a, cents_b):
    rows = [(1, c / 100.0, "1970-01-01") for c in cents_a]
    rows += [(2, c / 100.0, "1970-01-01") for c in cents_b]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    )
    return df.withColumn("o_orderdate", F.col("d").cast("timestamp"))


@given(a=centss, b=centss)
@SET
def test_mwu_matches_python(spark, a, b):
    cust = spark.createDataFrame(
        [(1, 0.0, "BUILDING"), (2, 0.0, "MACHINERY")],
        "c_custkey long, c_acctbal double, c_mktsegment string",
    )
    r = hypotests.mann_whitney_u(_orders_for(spark, a, b), cust).collect()[0]
    pooled = a + b
    r2 = _doubled_ranks(pooled)
    exp_r2a = sum(r2[v] for v in a)
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert int(r["r2_a"]) == exp_r2a
    assert int(r["u2_a"]) == exp_r2a - len(a) * (len(a) + 1)
    assert int(r["u2_a"]) + int(r["u2_b"]) == 2 * len(a) * len(b)


@given(a=centss, b=centss)
@SET
def test_ks_matches_python(spark, a, b):
    docs = spark.createDataFrame(
        [(i, "src0", v) for i, v in enumerate(a)]
        + [(1000 + i, "src1", v) for i, v in enumerate(b)],
        "doc_id long, source string, n_chars long",
    )
    r = hypotests.ks_two_sample(docs).collect()[0]
    na, nb = len(a), len(b)
    best, at = -1, None
    ca = cb = 0
    for v in sorted(set(a + b)):
        ca += a.count(v)
        cb += b.count(v)
        d = abs(ca * nb - cb * na)
        if d > best:
            best, at = d, v
    assert int(r["d_num"]) == best
    assert r["at_chars"] == at


@given(xs=st.lists(st.integers(1, 5), min_size=2, max_size=10))
@SET
def test_mann_kendall_matches_python(spark, xs):
    rows = [
        (1, x / 100.0, f"1970-01-{d + 1:02d}") for d, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    r = hypotests.mann_kendall_trend(df).collect()[0]
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    ties = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    assert (r["n_days"], r["s_stat"], r["tie_term"]) == (len(xs), s, tt)


@given(xs=st.lists(st.integers(1, 4), min_size=2, max_size=10))
@SET
def test_runs_test_matches_python(spark, xs):
    rows = [
        (1, x / 100.0, f"1970-01-{d + 1:02d}") for d, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    r = hypotests.runs_test_inputs(df).collect()[0]
    med = sorted(xs)[(len(xs) - 1) // 2]
    signs = [x > med for x in xs if x != med]
    runs = 0
    prev = None
    for s in signs:
        if prev is None or s != prev:
            runs += 1
        prev = s
    assert r["n_above"] == sum(signs)
    assert r["n_below"] == len(signs) - sum(signs)
    assert r["n_runs"] == runs


@given(revs=st.lists(st.integers(0, 50), min_size=1, max_size=10))
@SET
def test_lorenz_monotone_and_total(spark, revs):
    cust = spark.createDataFrame(
        [(i, 0.0, "B") for i in range(len(revs))],
        "c_custkey long, c_acctbal double, c_mktsegment string",
    )
    rows = [
        (i, r / 100.0, "1970-01-01") for i, r in enumerate(revs) if r > 0
    ]
    orders = spark.createDataFrame(
        rows or [(99, 0.0, "1970-01-01")],
        "o_custkey long, o_totalprice double, d string",
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    if not rows:
        orders = orders.filter(F.lit(False))
    out = sorted(
        olap.lorenz_curve_points(orders, cust).collect(),
        key=lambda r: r["decile"],
    )
    assert out, "at least the 10th decile row must exist"
    total = sum(revs)
    cums = [r["cum_cents"] for r in out]
    assert all(x <= y for x, y in zip(cums, cums[1:]))
    assert out[-1]["decile"] == 10
    assert out[-1]["cum_cents"] == total
    assert all(r["total_cents"] == total for r in out)
    # exact check at each emitted decile against the sorted prefix sum
    srt = sorted(revs)
    for r in out:
        assert r["cum_cents"] == sum(srt[: r["k_customers"]])


@given(xs=st.lists(st.integers(1, 100), min_size=4, max_size=14))
@SET
def test_tukey_fences_match_python(spark, xs):
    li = spark.createDataFrame(
        [("A", x / 100.0) for x in xs],
        "l_returnflag string, l_extendedprice double",
    )
    r = olap.tukey_fence_census(li).collect()[0]
    srt = sorted(xs)
    n = len(xs)
    q1 = srt[(n - 1) // 4]
    q3 = srt[(3 * (n - 1)) // 4]
    assert (r["q1_cents"], r["q3_cents"]) == (q1, q3)
    assert r["n_low"] == sum(1 for x in xs if 4 * x < 10 * q1 - 6 * q3)
    assert r["n_high"] == sum(1 for x in xs if 4 * x > 10 * q3 - 6 * q1)


@given(a=centss, b=centss)
@SET
def test_cvm_matches_python(spark, a, b):
    rows = [(i, "purchase", v / 100.0) for i, v in enumerate(a)]
    rows += [(1000 + i, "click", v / 100.0) for i, v in enumerate(b)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    r = hypotests.cvm_two_sample(ev).collect()[0]
    na, nb = len(a), len(b)
    ca = cb = tot = 0
    for v in sorted(set(a + b)):
        ta, tb = a.count(v), b.count(v)
        ca += ta
        cb += tb
        tot += (ca * nb - cb * na) ** 2 * (ta + tb)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert int(r["sum_sq_dev"]) == tot


@given(
    xs=st.lists(st.integers(1, 4), min_size=2, max_size=8),
    ys=st.lists(st.integers(0, 3), min_size=2, max_size=8),
)
@SET
def test_spearman_matches_python(spark, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    cust = spark.createDataFrame(
        [(i, xs[i] / 100.0, "B") for i in range(n)],
        "c_custkey long, c_acctbal double, c_mktsegment string",
    )
    rows = []
    for i in range(n):
        rows += [(i, 1.0, "1970-01-01")] * ys[i]
    orders = spark.createDataFrame(
        rows or [(99, 1.0, "1970-01-01")],
        "o_custkey long, o_totalprice double, d string",
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    if not rows:
        orders = orders.filter(F.lit(False))
    r = hypotests.spearman_rank_corr(cust, orders).collect()[0]
    rx = _doubled_ranks(xs)
    ry = _doubled_ranks(ys)
    exp = sum((rx[xs[i]] - ry[ys[i]]) ** 2 for i in range(n))
    assert r["n"] == n
    assert int(r["sum_d2"]) == exp
    ties = {
        row["var"]: int(row["tie_sum"])
        for row in hypotests.spearman_tie_terms(cust, orders).collect()
    }

    def tie_sum(vals):
        return sum(
            t**3 - t
            for t in (vals.count(v) for v in set(vals))
        )

    assert ties == {"x": tie_sum(xs), "y": tie_sum(ys)}


@given(
    da=st.lists(st.integers(-3, 3), min_size=1, max_size=8),
)
@SET
def test_wilcoxon_matches_python(spark, da):
    # customer i: 1995 revenue = 10, 1996 revenue = 10 + d_i
    rows = []
    for i, d in enumerate(da):
        rows.append((i, 0.10, "1995-06-01"))
        rows.append((i, (10 + d) / 100.0, "1996-06-01"))
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    r = hypotests.wilcoxon_signed_rank(orders).collect()[0]
    nz = [d for d in da if d != 0]
    r2 = _doubled_ranks([abs(d) for d in nz])
    w2p = sum(r2[abs(d)] for d in nz if d > 0)
    w2n = sum(r2[abs(d)] for d in nz if d < 0)
    assert r["n_pairs"] == len(nz)
    assert r["n_zero"] == len(da) - len(nz)
    assert int(r["w2_pos"] or 0) == w2p
    assert int(r["w2_neg"] or 0) == w2n


@given(
    pts=st.lists(
        st.tuples(st.integers(1, 3), st.integers(1, 4)),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_kendall_matches_python_on_bands(spark, pts):
    # prices chosen so every distinct price is its own band cannot be
    # guaranteed; instead compute expected C/D on the SAME banding the
    # operator applies (rank-derived deciles over distinct price cents)
    part = spark.createDataFrame(
        [(s, p / 100.0) for s, p in pts],
        "p_size int, p_retailprice double",
    )
    r = hypotests.kendall_tau_band_inputs(part).collect()[0]
    prices = [p for _, p in pts]
    dist = sorted(set(prices))
    n = len(prices)
    # rank of a distinct value = count of strictly smaller + 1
    band_of = {}
    seen = 0
    for v in dist:
        rnk = seen + 1
        band_of[v] = min(9, ((rnk - 1) * 10) // max(n - 1, 1))
        seen += prices.count(v)
    pairs = [
        (pts[i], pts[j])
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
    ]
    c = d = 0
    for (s1, p1), (s2, p2) in pairs:
        if s1 == s2 or band_of[p1] == band_of[p2]:
            continue
        if (s2 - s1) * (band_of[p2] - band_of[p1]) > 0:
            c += 1
        else:
            d += 1
    assert r["n"] == len(pts)
    assert int(r["c_pairs"] or 0) == c
    assert int(r["d_pairs"] or 0) == d
