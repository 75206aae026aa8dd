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


@given(
    base=st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 9)),
        min_size=0,
        max_size=8,
    ),
    ops=st.lists(st.integers(0, 2), min_size=0, max_size=6),
    data=st.data(),
)
@SET
def test_ivm_equals_recompute(spark, base, ops, data):
    """maintain(aggregate(base), cdc) == aggregate(apply(base, cdc))
    for random bases and random I/U/D batches (merge.py IVM contract)."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    rows = list(base)
    cdc = []
    for o in ops:
        if o == 0:  # insert
            k = data.draw(st.integers(0, 3))
            v = data.draw(st.integers(1, 9))
            cdc.append(("I", k, None, v))
            rows.append((k, v))
        elif rows:  # update or delete an existing row
            i = data.draw(st.integers(0, len(rows) - 1))
            k, old = rows[i]
            if o == 1:
                new = data.draw(st.integers(1, 9))
                cdc.append(("U", k, old, new))
                rows[i] = (k, new)
            else:
                cdc.append(("D", k, old, None))
                rows.pop(i)
    state = (
        spark.createDataFrame(
            base or [(99, 0)], "key long, cents long"
        )
    )
    if not base:
        state = state.filter(F.lit(False))
    agg0 = state.groupBy("key").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    cdc_df = spark.createDataFrame(
        cdc or [("X", 0, None, None)],
        "op string, key long, old_cents long, new_cents long",
    )
    if not cdc:
        cdc_df = cdc_df.filter(F.lit(False))
    got = {
        r["key"]: (r["n"], r["sum_cents"])
        for r in merge.maintain_group_aggregate(agg0, cdc_df).collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for k, v in rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert got == want


@given(
    base=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3)),
        min_size=0,
        max_size=8,
    ),
    ops=st.lists(st.integers(0, 2), min_size=0, max_size=6),
    data=st.data(),
)
@SET
def test_distinct_ivm_equals_recompute(spark, base, ops, data):
    from big_data_graph_analysis_with_spark_spark.operators import merge

    rows = list(base)
    cdc = []
    for o in ops:
        if o == 0:
            k = data.draw(st.integers(0, 2))
            v = data.draw(st.integers(0, 3))
            cdc.append(("I", k, None, v))
            rows.append((k, v))
        elif rows:
            i = data.draw(st.integers(0, len(rows) - 1))
            k, old = rows[i]
            if o == 1:
                new = data.draw(st.integers(0, 3))
                cdc.append(("U", k, old, new))
                rows[i] = (k, new)
            else:
                cdc.append(("D", k, old, None))
                rows.pop(i)
    aux0_rows = {}
    for k, v in base:
        aux0_rows[(k, v)] = aux0_rows.get((k, v), 0) + 1
    aux0 = spark.createDataFrame(
        [(k, v, m) for (k, v), m in aux0_rows.items()] or [(9, 9, 1)],
        "key long, v long, m long",
    )
    if not aux0_rows:
        aux0 = aux0.filter(F.lit(False))
    cdc_df = spark.createDataFrame(
        cdc or [("X", 0, None, None)],
        "op string, key long, old_v long, new_v long",
    )
    if not cdc:
        cdc_df = cdc_df.filter(F.lit(False))
    aux1, view = merge.maintain_distinct_count(aux0, cdc_df)
    got_aux = {(r["key"], r["v"]): r["m"] for r in aux1.collect()}
    got_view = {r["key"]: r["n_distinct"] for r in view.collect()}
    want_aux: dict[tuple[int, int], int] = {}
    for k, v in rows:
        want_aux[(k, v)] = want_aux.get((k, v), 0) + 1
    want_view: dict[int, int] = {}
    for k, _ in want_aux:
        want_view[k] = want_view.get(k, 0) + 1
    assert got_aux == want_aux
    assert got_view == want_view


def test_poisson_bootstrap_python_mirror(spark):
    """Weights replay exactly from the md5 mirror; totals, effective
    sizes, and determinism across reruns all pin down."""
    import hashlib

    from big_data_graph_analysis_with_spark_spark.operators import sampling

    rows = [(i, float(i % 7) + 0.5) for i in range(1, 101)]
    ev = spark.createDataFrame(rows, "event_id long, value double")
    out = {
        r["b"]: (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in sampling.poisson_bootstrap_sums(ev, n_resamples=4).collect()
    }
    ts = sampling.poisson1_thresholds_56()

    def weight(b: int, eid: int) -> int:
        u = int(hashlib.md5(f"{b}:{eid}".encode()).hexdigest()[:14], 16)
        return sum(1 for t in ts if t <= u)

    for b in range(4):
        n_eff = sum(weight(b, i) for i, _ in rows)
        boot = sum(
            weight(b, i) * round(v * 100) for i, v in rows
        )
        assert out[b] == (100, n_eff, boot)
    # mean effective size ~ n (Poisson(1) mean 1): loose sanity band
    effs = [out[b][1] for b in range(4)]
    assert 50 <= sum(effs) / 4 <= 150
    again = {
        r["b"]: (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in sampling.poisson_bootstrap_sums(ev, n_resamples=4).collect()
    }
    assert again == out


def test_poisson_bootstrap_null_values_excluded(spark):
    """NULL-value (or NULL-id) rows are dropped BEFORE counting, the
    same convention as streaming_bootstrap_sums's isNotNull filter —
    otherwise n_rows counts rows whose weight*cents silently fell out
    of the sum and the stream ≡ batch-slice equivalence breaks on any
    NULL event (r9 ADVICE)."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    rows = [(i, float(i) + 0.5) for i in range(1, 51)]
    ev = spark.createDataFrame(rows, "event_id long, value double")
    with_nulls = ev.unionAll(
        spark.createDataFrame(
            [(1000, None), (None, 9.5)], "event_id long, value double"
        )
    )
    clean = {
        r["b"]: (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in sampling.poisson_bootstrap_sums(ev, n_resamples=4).collect()
    }
    dirty = {
        r["b"]: (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in sampling.poisson_bootstrap_sums(
            with_nulls, n_resamples=4
        ).collect()
    }
    assert dirty == clean
    assert all(v[0] == 50 for v in dirty.values())


def test_block_bootstrap_python_mirror(spark):
    import hashlib

    from big_data_graph_analysis_with_spark_spark.operators import sampling

    # daily cents 1..8 on 8 consecutive days
    rows = [(1, (d + 1) / 100.0, f"1970-01-{d + 1:02d}") for d in range(8)]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    out = {
        r["b"]: (r["n_blocks"], r["n_days_eff"], r["boot_cents"])
        for r in sampling.block_bootstrap_daily_sums(
            orders, n_resamples=5, block_len=3
        ).collect()
    }
    daily = list(range(1, 9))
    n = 8

    def start(b, j):
        return int(hashlib.md5(f"{b}:{j}".encode()).hexdigest()[:14], 16) % n

    for b in range(5):
        tot = 0
        for j in range(3):  # ceil(8/3) = 3 blocks
            s = start(b, j)
            tot += sum(daily[(s + k) % n] for k in range(3))
        assert out[b] == (3, 9, tot)


def test_table_profile_exact(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "a", None), (4, None, 2.5)],
        "id long, s string, x double",
    )
    out = {
        r["col_name"]: r
        for r in olap.table_profile(df, ["id", "s", "x"]).collect()
    }
    assert out["id"]["n"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 4
    assert (out["s"]["n_null"], out["s"]["n_distinct"]) == (1, 2)
    assert (out["s"]["min_str"], out["s"]["max_str"]) == ("a", "b")
    assert (out["x"]["n_null"], out["x"]["n_distinct"]) == (2, 2)
    assert out["x"]["min_str"] == "1.5"


@given(
    base=st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 6)),
        min_size=0,
        max_size=8,
    ),
    ops=st.lists(st.integers(0, 2), min_size=0, max_size=6),
    data=st.data(),
)
@SET
def test_histogram_ivm_quantiles_equal_recompute(spark, base, ops, data):
    """Maintained histogram -> exact median == median recomputed from
    the applied base rows, for every surviving key."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    rows = list(base)
    cdc = []
    for o in ops:
        if o == 0:
            k = data.draw(st.integers(0, 1))
            v = data.draw(st.integers(1, 6))
            cdc.append(("I", k, None, v))
            rows.append((k, v))
        elif rows:
            i = data.draw(st.integers(0, len(rows) - 1))
            k, old = rows[i]
            if o == 1:
                new = data.draw(st.integers(1, 6))
                cdc.append(("U", k, old, new))
                rows[i] = (k, new)
            else:
                cdc.append(("D", k, old, None))
                rows.pop(i)
    h0: dict[tuple[int, int], int] = {}
    for k, v in base:
        h0[(k, v)] = h0.get((k, v), 0) + 1
    hist0 = spark.createDataFrame(
        [(k, v, w) for (k, v), w in h0.items()] or [(9, 9, 1)],
        "key long, cents long, w long",
    )
    if not h0:
        hist0 = hist0.filter(F.lit(False))
    cdc_df = spark.createDataFrame(
        cdc or [("X", 0, None, None)],
        "op string, key long, old_cents long, new_cents long",
    )
    if not cdc:
        cdc_df = cdc_df.filter(F.lit(False))
    hist1 = merge.maintain_value_histogram(hist0, cdc_df)
    got = {
        r["key"]: (r["n"], r["q_cents"])
        for r in merge.quantile_from_histogram(hist1, 5).collect()
    }
    want = {}
    by_key: dict[int, list[int]] = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    for k, vs in by_key.items():
        vs.sort()
        want[k] = (len(vs), vs[((len(vs) - 1) * 5) // 10])
    assert got == want


def test_variant_stats_equal_json_path(spark):
    """The Spark-4 variant path produces exactly the classic
    get_json_object census, malformed payloads included."""
    from big_data_graph_analysis_with_spark_spark.operators import jsonops

    rows = [
        (1, "a", '{"k": 5}'),
        (2, "a", '{"k": 7}'),
        (3, "b", '{"k": null}'),
        (4, "b", "not json"),
        (5, "b", '{"other": 1}'),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    classic = {
        tuple(r) for r in jsonops.props_stats(ev).collect()
    }
    variant = {
        tuple(r) for r in jsonops.props_variant_stats(ev).collect()
    }
    assert variant == classic
    a = {r["event_type"]: r for r in jsonops.props_variant_stats(ev).collect()}
    assert (a["a"]["n_with_prop"], a["a"]["sum_k"]) == (2, 12)
    assert a["b"]["n_with_prop"] == 0


@given(xs=st.lists(st.integers(1, 5), min_size=2, max_size=10))
@SET
def test_pettitt_identity_vs_pairwise_definition(spark, xs):
    """The rank-identity implementation equals the O(n²) definition
    U_t = Σ_{i<=t} Σ_{j>t} sgn(x_i − x_j), ties and all."""
    rows = [
        (1, x / 100.0, f"1970-01-{d + 1:02d}") for d, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    r = hypotests.pettitt_changepoint(df).collect()[0]
    n = len(xs)

    def sgn(v):
        return (v > 0) - (v < 0)

    best, at = -1, None
    for t in range(1, n):  # t = size of the prefix, last excluded
        u = sum(
            sgn(xs[i] - xs[j]) for i in range(t) for j in range(t, n)
        )
        if abs(u) > best:
            best, at = abs(u), t - 1  # day index of prefix end
    assert r["n_days"] == n
    assert int(r["max_abs_u"]) == best
    assert r["at_day"] == at


@given(
    xs=st.lists(st.integers(1, 4), min_size=2, max_size=12),
)
@SET
def test_seasonal_mk_sums_match_python(spark, xs):
    # spread days across two months by alternating; compare per-month S
    rows = []
    days = []
    for i, x in enumerate(xs):
        month = 1 if i % 2 == 0 else 2
        day = i // 2 + 1
        rows.append((1, x / 100.0, f"1970-{month:02d}-{day:02d}"))
        days.append((month, x))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    out = {
        r["month_of_year"]: (r["n_days"], r["s_stat"], r["tie_term"])
        for r in hypotests.seasonal_mann_kendall(df).collect()
    }
    for m in (1, 2):
        series = [x for mm, x in days if mm == m]
        if not series:
            assert m not in out
            continue
        s = sum(
            (series[j] > series[i]) - (series[j] < series[i])
            for i in range(len(series))
            for j in range(i + 1, len(series))
        )
        ties = {}
        for x in series:
            ties[x] = ties.get(x, 0) + 1
        tt = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        assert out[m] == (len(series), s, tt)


@given(xs=st.lists(st.integers(1, 50), min_size=5, max_size=15))
@SET
def test_trimmed_sum_matches_python(spark, xs):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = spark.createDataFrame(
        [("A", x / 100.0) for x in xs],
        "l_returnflag string, l_extendedprice double",
    )
    r = olap.trimmed_sum_census(li).collect()[0]
    srt = sorted(xs)
    n = len(xs)
    lo = srt[((n - 1) * 1) // 10]
    hi = srt[((n - 1) * 9) // 10]
    kept = [x for x in xs if lo < x < hi]
    assert (r["lo_cents"], r["hi_cents"]) == (lo, hi)
    assert (r["kept_n"], r["kept_sum_cents"]) == (len(kept), sum(kept))


def test_measure_crossproducts_exact(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    rows = [("A", 2.0, 0.03, 0.10), ("A", 3.0, 0.05, 0.20), ("B", 1.0, 0.07, 0.00)]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_quantity double, l_extendedprice double, l_discount double",
    )
    out = {r["returnflag"]: r for r in olap.measure_crossproducts(li).collect()}
    a = out["A"]
    # q = (2,3), p cents = (3,5), d bps = (1000, 2000)
    assert (a["n"], a["sum_q"], a["sum_p"], a["sum_d"]) == (2, 5, 8, 3000)
    assert int(a["sqp"]) == 2 * 3 + 3 * 5
    assert int(a["spp"]) == 9 + 25
    assert int(a["sdd"]) == 1000**2 + 2000**2
    assert int(a["spd"]) == 3 * 1000 + 5 * 2000
    b = out["B"]
    assert (b["n"], int(b["sqq"])) == (1, 1)


def test_l_diversity_census(spark):
    from big_data_graph_analysis_with_spark_spark.operators import curation

    rows = [
        ("US", "A", 1), ("US", "A", 1), ("US", "A", 1),   # l=1, 3 rows
        ("US", "B", 1), ("US", "B", 2),                   # l=2, 2 rows
        ("DE", "A", 1), ("DE", "A", 2), ("DE", "A", 3),   # l=3, 3 rows
    ]
    df = spark.createDataFrame(rows, "nation string, seg string, s long")
    out = {
        r["l"]: (r["n_groups"], r["n_rows"])
        for r in curation.l_diversity_census(
            df, ["nation", "seg"], "s"
        ).collect()
    }
    assert out == {1: (1, 3), 2: (1, 2), 3: (1, 3)}


def test_zipf_points_match_python(spark):
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    docs = spark.createDataFrame(
        [(1, "a a a a b b b c c d"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    out = {
        r["decile"]: (r["rank"], r["freq"])
        for r in corpusstats.zipf_rank_freq_points(docs).collect()
    }
    # vocab: a:5 b:4 c:3 d:2 e:1 f:1 g:1 -> V=7, freq sorted desc
    freqs = [5, 4, 3, 2, 1, 1, 1]
    for q, (rank, freq) in out.items():
        want_rank = max(1, (7 * q) // 10)
        assert rank == want_rank
        assert freq == freqs[want_rank - 1]
    assert out[0] == (1, 5) and out[10] == (7, 1)


@given(a=centss, b=centss)
@SET
def test_dominance_census_matches_python(spark, a, b):
    cust = spark.createDataFrame(
        [(1, 0.0, "BUILDING"), (2, 0.0, "MACHINERY")],
        "c_custkey long, c_acctbal double, c_mktsegment string",
    )
    r = hypotests.dominance_census(_orders_for(spark, a, b), cust).collect()[0]
    pooled = sorted(set(a + b))
    na, nb = len(a), len(b)
    adom = bdom = ties = 0
    for v in pooled:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        if ca * nb > cb * na:
            adom += 1
        elif ca * nb < cb * na:
            bdom += 1
        else:
            ties += 1
    assert (r["n_values"], r["n_a"], r["n_b"]) == (len(pooled), na, nb)
    assert (r["a_dominated"], r["b_dominated"], r["cdf_ties"]) == (
        adom, bdom, ties,
    )


#: per-(month, priority) cent values — small grids with tie mass
page_cells = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # month
        st.integers(min_value=1, max_value=3),   # priority level
        st.integers(min_value=1, max_value=5),   # cents
    ),
    min_size=1,
    max_size=15,
)


@given(cells=page_cells)
@SET
def test_page_trend_matches_python(spark, cells):
    rows = [
        (1, c / 100.0, f"1970-0{m}-01", f"{p}-X")
        for (m, p, c) in cells
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string, o_orderpriority string"
    ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
    got = {
        r["priority"]: r for r in hypotests.page_trend_inputs(df).collect()
    }
    # python mirror: zero-filled month x priority sums, within-month
    # doubled tie-averaged ranks, per-priority sums
    months = sorted({m for m, _, _ in cells})
    prios = sorted({p for _, p, _ in cells})
    sums: dict[tuple[int, int], int] = {}
    for m, p, c in cells:
        sums[(m, p)] = sums.get((m, p), 0) + c
    exp_r2 = {p: 0 for p in prios}
    for m in months:
        vals = [sums.get((m, p), 0) for p in prios]
        r2 = _doubled_ranks(vals)
        for p in prios:
            exp_r2[p] += r2[sums.get((m, p), 0)]
    k = len(prios)
    assert set(got) == set(prios)
    for p in prios:
        assert got[p]["n_blocks"] == len(months)
        assert int(got[p]["r2_sum"]) == exp_r2[p]
        assert int(got[p]["l2_term"]) == p * exp_r2[p]
    assert sum(int(got[p]["r2_sum"]) for p in prios) == len(months) * k * (k + 1)
