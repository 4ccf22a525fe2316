"""Mirrored-oracle INTENT audit (r10, verdict task 2 — the qs230
lesson systematized).

The driver differential proves Spark ≡ DuckDB oracle, but a formula
that is wrong the same way on both sides stays green forever — qs230's
VaR selected MIN over the tail condition (the global minimum) and
passed every differential until a dependent query (Kupiec) screamed.

Each test here recomputes one named statistic INDEPENDENTLY — a pure
numpy/pandas textbook formulation over the raw sf0.001 parquet, written
from the statistic's definition, not from the query's SQL — and
compares it against the registered Spark query's output. The targeted
risk classes (BASELINE.md r10 sweep table):

- tail/extreme selectors (MIN/MAX-over-condition — the qs230 class)
- quantile/median index conventions (off-by-one, lower-vs-interpolated)
- rank statistics (midrank/tie handling)
- sign/direction conventions (slopes, correlations, one-sided z)
- moment conventions (population vs sample variance, pooled s)

Tolerances: columns the query ROUNDs to k decimals compare with
abs tol 2·10^-k (the independent float path may wobble the last
rounded digit); exact-integer columns compare exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from cds_etl_spark.plans import QUERIES


def _pd(sf_dir: str, table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _run(spark, sf_dir, name) -> pd.DataFrame:
    return QUERIES[name](spark, sf_dir).toPandas()


def _cents(s: pd.Series) -> np.ndarray:
    # Match the engine's exact integer-cents lift: round-half-up on
    # the double, which for TPC-H 2-dp values equals plain round.
    return np.round(s.to_numpy() * 100).astype(np.int64)


# -- tail / extreme selectors ----------------------------------------------


def test_intent_qs306_grubbs(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    t = (o["o_orderdate"].dt.year - 1992) * 12 + o["o_orderdate"].dt.month
    y = (
        pd.DataFrame({"t": t, "c": _cents(o["o_totalprice"])})
        .groupby("t")["c"]
        .sum()
        .to_numpy()
        .astype(np.float64)
    )
    g = np.max(np.abs(y - y.mean())) / y.std(ddof=1)
    got = _run(spark, sf_dir, "qs306_grubbs_outlier").iloc[0]
    assert got["n_months"] == len(y)
    assert got["g"] == pytest.approx(g, abs=2e-4)


def test_intent_qs346_dixon_q(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    c = _pd(sf_dir, "customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j["o_orderdate"].dt.year == 1996]
    daily = (
        pd.DataFrame(
            {
                "seg": j["c_mktsegment"],
                "d": j["o_orderdate"].dt.date,
                "x": _cents(j["o_totalprice"]),
            }
        )
        .groupby(["seg", "d"])["x"]
        .sum()
        .reset_index()
    )
    got = _run(spark, sf_dir, "qs346_dixon_q").set_index("segment")
    for seg, grp in daily.groupby("seg"):
        # Textbook Dixon r10 ratios on the DISTINCT-value gaps: the
        # engine's convention (documented in the query) takes the
        # nearest distinct neighbor of each extreme, which equals the
        # order statistic x(2) / x(n-1) whenever extremes are untied —
        # assert that precondition holds on this data, then the ratio.
        xs = np.sort(grp["x"].to_numpy())
        assert xs[0] != xs[1] and xs[-1] != xs[-2], seg
        q_low = (xs[1] - xs[0]) / (xs[-1] - xs[0])
        q_high = (xs[-1] - xs[-2]) / (xs[-1] - xs[0])
        assert got.loc[seg, "n"] == len(xs)
        assert got.loc[seg, "q_low"] == pytest.approx(q_low, abs=2e-6)
        assert got.loc[seg, "q_high"] == pytest.approx(q_high, abs=2e-6)


def test_intent_qs239_tukey_fences(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    v = pd.DataFrame(
        {"grp": li["l_returnflag"], "v": _cents(li["l_extendedprice"])}
    )
    got = _run(spark, sf_dir, "qs239_tukey_fences").set_index("grp")
    for g, grp in v.groupby("grp"):
        x = grp["v"].to_numpy()
        q1 = np.quantile(x, 0.25)  # linear interpolation = type 7
        q3 = np.quantile(x, 0.75)
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        n_out = int(np.sum((x < lo) | (x > hi)))
        assert got.loc[g, "q1"] == pytest.approx(q1, abs=2e-4)
        assert got.loc[g, "q3"] == pytest.approx(q3, abs=2e-4)
        assert got.loc[g, "lo_fence"] == pytest.approx(lo, abs=2e-4)
        assert got.loc[g, "hi_fence"] == pytest.approx(hi, abs=2e-4)
        assert got.loc[g, "n_outliers"] == n_out
        assert got.loc[g, "n"] == len(x)


# -- quantile / median index conventions -----------------------------------


def test_intent_qs183_weighted_median(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    df = pd.DataFrame(
        {
            "flag": li["l_returnflag"],
            "c": _cents(li["l_extendedprice"]),
            "q": li["l_quantity"].astype(np.int64),
        }
    )
    got = _run(spark, sf_dir, "qs183_weighted_median").set_index(
        "l_returnflag"
    )
    for flag, grp in df.groupby("flag"):
        s = grp.sort_values("c")
        cw = s["q"].cumsum().to_numpy()
        tot = int(cw[-1])
        # lower weighted median: first value whose cumulative weight
        # reaches half the total (2*cw >= tot)
        idx = int(np.argmax(2 * cw >= tot))
        wm = int(s["c"].to_numpy()[idx])
        assert got.loc[flag, "wmedian_cents"] == wm
        assert got.loc[flag, "total_qty"] == tot


def test_intent_qs304_moods_median(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    q = li["l_quantity"].astype(np.int64).to_numpy()
    flags = li["l_returnflag"].to_numpy()
    # lower median: (n+1)//2-th order statistic (1-based)
    m = int(np.sort(q)[(len(q) + 1) // 2 - 1])
    chi2 = 0.0
    n = len(q)
    above = q > m
    col_tot = {True: int(above.sum()), False: int(n - above.sum())}
    for flag in ("A", "N", "R"):
        sel = flags == flag
        row_tot = int(sel.sum())
        for side in (True, False):
            obs = int((sel & (above == side)).sum())
            exp = row_tot * col_tot[side] / n
            chi2 += (obs - exp) ** 2 / exp
    got = _run(spark, sf_dir, "qs304_moods_median").iloc[0]
    assert got["n"] == n
    assert got["median_qty"] == m
    assert got["chi2"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs323_hodges_lehmann(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    q = li["l_quantity"].astype(np.int64)
    a = q[li["l_returnflag"] == "N"].to_numpy()
    b = q[li["l_returnflag"] == "R"].to_numpy()
    diffs = np.sort((b[:, None] - a[None, :]).ravel())
    k = len(diffs)
    # median of the pairwise differences, lower+upper (hl2 = 2*median)
    hl2 = int(diffs[(k - 1) // 2]) + int(diffs[k // 2])
    got = _run(spark, sf_dir, "qs323_hodges_lehmann").iloc[0]
    assert got["n_pairs"] == k
    assert got["hl2"] == hl2


# -- rank statistics (midranks / ties) --------------------------------------


def test_intent_qs181_mannwhitney_auc(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    df = pd.DataFrame(
        {
            "cohort": (ev["user_id"] % 2).astype(np.int64),
            "c": _cents(ev["value"]),
        }
    )
    r = pd.Series(df["c"]).rank(method="average").to_numpy()
    m0 = df["cohort"].to_numpy() == 0
    n1, n2 = int(m0.sum()), int((~m0).sum())
    u1 = float(r[m0].sum()) - n1 * (n1 + 1) / 2
    auc = u1 / (n1 * n2)
    got = _run(spark, sf_dir, "qs181_mannwhitney_auc").iloc[0]
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["u1_x2"] == pytest.approx(2 * u1, abs=1e-9)
    assert got["auc_e6"] == round(auc * 1e6)


def test_intent_qs271_kruskal_wallis(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {
            "g": o["o_orderpriority"],
            "v": _cents(o["o_totalprice"]),
        }
    )
    r = df["v"].rank(method="average")
    n = len(df)
    h = 0.0
    for _g, idx in df.groupby("g").groups.items():
        rg = r.loc[idx]
        h += float(rg.sum()) ** 2 / len(rg)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _vals, counts = np.unique(df["v"].to_numpy(), return_counts=True)
    cf = 1.0 - float(np.sum(counts**3 - counts)) / (n**3 - n)
    got = _run(spark, sf_dir, "qs271_kruskal_wallis")
    row = got.iloc[0]
    assert row["h_raw"] == pytest.approx(h, abs=2e-4)
    assert row["h_stat"] == pytest.approx(h / cf, abs=2e-4)
    mr = got.set_index("priority")["mean_rank"]
    for g, idx in df.groupby("g").groups.items():
        assert mr[g] == pytest.approx(float(r.loc[idx].mean()), abs=2e-4)


# -- sign / direction / one-sided conventions --------------------------------


def test_intent_qs270_welch(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    g0 = _cents(c.loc[c["c_nationkey"] == 0, "c_acctbal"]).astype(float)
    g1 = _cents(c.loc[c["c_nationkey"] == 1, "c_acctbal"]).astype(float)
    se0 = g0.var(ddof=1) / len(g0)
    se1 = g1.var(ddof=1) / len(g1)
    t = (g0.mean() - g1.mean()) / math.sqrt(se0 + se1)
    df = (se0 + se1) ** 2 / (
        se0**2 / (len(g0) - 1) + se1**2 / (len(g1) - 1)
    )
    got = _run(spark, sf_dir, "qs270_welch_ttest").iloc[0]
    assert got["n0"] == len(g0) and got["n1"] == len(g1)
    assert got["mean0"] == pytest.approx(g0.mean() / 100, abs=2e-4)
    assert got["t_stat"] == pytest.approx(t, abs=2e-4)
    assert got["welch_df"] == pytest.approx(df, abs=2e-3)


def test_intent_qs303_durbin_watson(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    t = (
        (o["o_orderdate"].dt.year - 1992) * 12 + o["o_orderdate"].dt.month
    )
    m = t.value_counts().sort_index()
    x = m.index.to_numpy().astype(float)
    y = m.to_numpy().astype(float)
    slope, intercept = np.polyfit(x, y, 1)
    e = y - (slope * x + intercept)
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e**2))
    got = _run(spark, sf_dir, "qs303_durbin_watson").iloc[0]
    assert got["n_months"] == len(x)
    assert got["dw"] == pytest.approx(dw, abs=2e-4)
    assert got["rho1"] == pytest.approx(1 - dw / 2, abs=2e-4)


def test_intent_qs305_mann_kendall(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    t = (
        (o["o_orderdate"].dt.year - 1992) * 12 + o["o_orderdate"].dt.month
    )
    y = (
        pd.DataFrame({"t": t, "c": _cents(o["o_totalprice"])})
        .groupby("t")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(y)
    s_stat = int(np.sum(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)]))
    _v, counts = np.unique(y, return_counts=True)
    tt = int(np.sum(counts * (counts - 1) * (2 * counts + 5)))
    var = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var)
    else:
        z = 0.0
    got = _run(spark, sf_dir, "qs305_mann_kendall").iloc[0]
    assert got["n_months"] == n
    assert got["s"] == s_stat
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs302_runs_test(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    daily = (
        pd.DataFrame(
            {"day": ev["ts"].dt.date, "x": _cents(ev["value"])}
        )
        .groupby("day")["x"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(daily)
    m = int(np.sort(daily)[(n + 1) // 2 - 1])  # lower median
    hi = daily > m  # at-or-below goes to the 0 side (documented)
    r = 1 + int(np.sum(hi[1:] != hi[:-1]))
    n1, n0 = int(hi.sum()), int(n - hi.sum())
    mu = 1 + 2 * n1 * n0 / (n1 + n0)
    sig = math.sqrt(
        2 * n1 * n0 * (2 * n1 * n0 - n1 - n0)
        / ((n1 + n0) ** 2 * (n1 + n0 - 1))
    )
    got = _run(spark, sf_dir, "qs302_runs_test").iloc[0]
    assert got["n_runs"] == r
    assert got["n_above"] == n1 and got["n_at_or_below"] == n0
    assert got["expected_runs"] == pytest.approx(mu, abs=2e-4)
    assert got["z"] == pytest.approx((r - mu) / sig, abs=2e-4)


def test_intent_qs331_matthews_corr(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    y95 = o[o["o_orderdate"].dt.year == 1995]
    spend = (
        pd.DataFrame(
            {"cust": y95["o_custkey"], "c": _cents(y95["o_totalprice"])}
        )
        .groupby("cust")["c"]
        .sum()
    )
    resp = set(o.loc[o["o_orderdate"].dt.year == 1996, "o_custkey"])
    pred = spend >= 15_000_000
    actual = spend.index.isin(list(resp))
    tp = int((pred & actual).sum())
    fp = int((pred & ~actual).sum())
    fn = int((~pred & actual).sum())
    tn = int((~pred & ~actual).sum())
    mcc = (tp * tn - fp * fn) / (
        math.sqrt((tp + fp) * (tp + fn)) * math.sqrt((tn + fp) * (tn + fn))
    )
    got = _run(spark, sf_dir, "qs331_matthews_corr").iloc[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert got["mcc"] == pytest.approx(mcc, abs=2e-6)


# -- moment conventions (population vs sample, pooled) -----------------------


def test_intent_qs278_jarque_bera(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    v = np.round(o["o_totalprice"].to_numpy()).astype(np.int64).astype(
        float
    )
    n = len(v)
    m = v.mean()
    m2 = np.mean((v - m) ** 2)
    skew = np.mean((v - m) ** 3) / m2**1.5
    exk = np.mean((v - m) ** 4) / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    got = _run(spark, sf_dir, "qs278_jarque_bera").iloc[0]
    assert got["n"] == n
    assert got["skewness"] == pytest.approx(skew, abs=2e-4)
    assert got["ex_kurtosis"] == pytest.approx(exk, abs=2e-4)
    assert got["jb_stat"] == pytest.approx(jb, abs=2e-2)


def test_intent_qs290_cronbach_alpha(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    items = ["click", "error", "purchase", "signup", "view"]
    piv = (
        pd.DataFrame(
            {
                "u": ev["user_id"],
                "t": ev["event_type"],
                "c": _cents(ev["value"]),
            }
        )
        .pivot_table(
            index="u", columns="t", values="c", aggfunc="sum", fill_value=0
        )
        .reindex(columns=items, fill_value=0)
        .astype(float)
    )
    k = len(items)
    # alpha is invariant to the variance ddof (the factor cancels in
    # the ratio) — use sample variances as the textbook writes it.
    item_vars = piv.var(ddof=1).sum()
    total_var = piv.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - item_vars / total_var)
    got = _run(spark, sf_dir, "qs290_cronbach_alpha").iloc[0]
    assert got["n_users"] == len(piv)
    assert got["k_items"] == k
    assert got["cronbach_alpha"] == pytest.approx(alpha, abs=2e-4)


def test_intent_qs311_cohens_d(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    a = _cents(
        li.loc[li["l_returnflag"] == "A", "l_extendedprice"]
    ).astype(float)
    r = _cents(
        li.loc[li["l_returnflag"] == "R", "l_extendedprice"]
    ).astype(float)
    n1, n2 = len(a), len(r)
    sp = math.sqrt(
        ((n1 - 1) * a.var(ddof=1) + (n2 - 1) * r.var(ddof=1))
        / (n1 + n2 - 2)
    )
    d = (a.mean() - r.mean()) / sp
    g = d * (1 - 3 / (4 * (n1 + n2) - 9))
    got = _run(spark, sf_dir, "qs311_cohens_d").iloc[0]
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["cohens_d"] == pytest.approx(d, abs=2e-4)
    assert got["hedges_g"] == pytest.approx(g, abs=2e-4)


def test_intent_qs299_kendall_taub(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    x = o["o_orderpriority"].str[0].astype(int).to_numpy()
    y = (
        o["o_orderstatus"]
        .map({"F": 1, "P": 2})
        .fillna(3)
        .astype(int)
        .to_numpy()
    )
    # tau-b from its definition on the contingency table: concordant /
    # discordant weighted cell pairs, tie terms from the margins
    # (pandas' kendall needs scipy, absent here).
    n = len(x)
    xs, ys = np.unique(x), np.unique(y)
    tab = np.zeros((len(xs), len(ys)), dtype=np.int64)
    for i, xv in enumerate(xs):
        for j, yv in enumerate(ys):
            tab[i, j] = int(np.sum((x == xv) & (y == yv)))
    conc = disc = 0
    for i in range(len(xs)):
        for j in range(len(ys)):
            conc += tab[i, j] * tab[i + 1 :, j + 1 :].sum()
            disc += tab[i, j] * tab[i + 1 :, :j].sum()
    tx = sum(int(r) * (int(r) - 1) // 2 for r in tab.sum(axis=1))
    ty = sum(int(c) * (int(c) - 1) // 2 for c in tab.sum(axis=0))
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    got = _run(spark, sf_dir, "qs299_kendall_taub").iloc[0]
    assert got["n"] == n
    assert got["concordant"] == conc and got["discordant"] == disc
    assert got["tau_b"] == pytest.approx(tau, abs=2e-4)


def test_intent_qs310_cliffs_delta(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    q = li["l_quantity"].astype(np.int64)
    a = q[li["l_returnflag"] == "A"].to_numpy()
    r = q[li["l_returnflag"] == "R"].to_numpy()
    diff = np.sign(a[:, None] - r[None, :])
    delta = float(diff.sum()) / (len(a) * len(r))
    got = _run(spark, sf_dir, "qs310_cliffs_delta").iloc[0]
    assert got["n1"] == len(a) and got["n2"] == len(r)
    assert got["cliffs_delta"] == pytest.approx(delta, abs=2e-4)


def test_intent_qs205_theilsen_slope(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_partkey"] % 50,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        // 10000
    ).reset_index(name="y")
    got = _run(spark, sf_dir, "qs205_theilsen_slope").set_index("grp")
    for grp, g in m.groupby("grp"):
        t = g["t"].to_numpy()
        y = g["y"].to_numpy()
        slopes = []
        for i in range(len(t)):
            for j in range(i + 1, len(t)):
                lo, hi = (i, j) if t[i] < t[j] else (j, i)
                num = (int(y[hi]) - int(y[lo])) * 1_000_000
                den = int(t[hi]) - int(t[lo])
                # both engines' integer division truncates toward
                # zero (C-style), not Python's floor — the e6
                # quantization convention, found by this audit and
                # immaterial to the estimator (1e-6 on negative
                # slopes); mirror trunc here.
                qq, rem = divmod(num, den)
                slopes.append(qq + (1 if qq < 0 and rem != 0 else 0))
        slopes.sort()
        k = len(slopes)
        med = slopes[(k - 1) // 2]  # lower median
        assert got.loc[grp, "n_pairs"] == k
        assert got.loc[grp, "theil_sen_e6"] == med


def test_intent_qs216_did(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    treated = (o["o_custkey"] % 2).to_numpy()
    post = (o["o_orderdate"] >= "1998-01-01").to_numpy()
    cents = _cents(o["o_totalprice"]).astype(float)

    def mean(tr, po):
        sel = (treated == tr) & (post == po)
        return cents[sel].mean()

    did = (mean(1, True) - mean(1, False)) - (
        mean(0, True) - mean(0, False)
    )
    got = _run(spark, sf_dir, "qs216_did_estimator").iloc[0]
    assert got["n_treated_post"] == int(
        ((treated == 1) & post).sum()
    )
    assert got["did_cents"] == pytest.approx(did, abs=2e-4)


def test_intent_qs161_winsorized_mean(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {
            "st": o["o_orderstatus"],
            "cents": _cents(o["o_totalprice"]),
            "bucket": np.clip(
                np.floor(o["o_totalprice"].to_numpy() / 4096.0).astype(
                    np.int64
                ),
                0,
                127,
            ),
        }
    )
    got = _run(spark, sf_dir, "qs161_winsorized_mean").set_index(
        "o_orderstatus"
    )
    for st, g in df.groupby("st"):
        n = len(g)
        b = np.sort(g["bucket"].to_numpy())
        lo_b = int(b[math.ceil(n * 5 / 100) - 1])
        hi_b = int(b[math.ceil(n * 95 / 100) - 1])
        lo_c, hi_c = lo_b * 409600, (hi_b + 1) * 409600
        w = np.where(
            g["bucket"] < lo_b,
            lo_c,
            np.where(g["bucket"] > hi_b, hi_c, g["cents"]),
        )
        assert got.loc[st, "n"] == n
        assert got.loc[st, "lo_cents"] == lo_c
        assert got.loc[st, "hi_cents"] == hi_c
        assert got.loc[st, "winsorized_mean_cents"] == pytest.approx(
            w.mean(), abs=2e-4
        )


def test_intent_qs298_jonckheere(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    g = o["o_orderpriority"].str[0].astype(int).to_numpy()
    v = _cents(o["o_totalprice"])
    jt2 = 0
    for gi in range(1, 5):
        for gj in range(gi + 1, 6):
            a = v[g == gi]
            b = v[g == gj]
            cmpx = np.sign(b[:, None] - a[None, :])
            # 2*(#a<b) + #ties  (ties count half in JT)
            jt2 += int(2 * (cmpx > 0).sum() + (cmpx == 0).sum())
    n = len(v)
    counts = np.array([(g == k).sum() for k in range(1, 6)])
    e_jt2 = (n * n - int(np.sum(counts**2))) / 2
    got = _run(spark, sf_dir, "qs298_jonckheere_trend").iloc[0]
    assert got["jt2"] == jt2
    assert got["n"] == n
    assert got["e_jt2"] == pytest.approx(e_jt2, abs=0.11)
    assert got["trend_index"] == pytest.approx(
        (jt2 - e_jt2) / e_jt2, abs=2e-4
    )


def test_intent_qs324_siegel_tukey(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {
            "g": (o["o_custkey"] % 2).to_numpy(),
            "key": o["o_orderkey"].to_numpy(),
            "v": _cents(o["o_totalprice"]),
        }
    ).sort_values(["v", "key"], kind="mergesort")
    n = len(df)
    # textbook alternating-extreme assignment, two pointers: bottom
    # gets 1; then pairs alternate top (2,3), bottom (4,5), top (6,7)…
    scores = np.zeros(n, dtype=np.int64)
    lo, hi, rank = 0, n - 1, 1
    take_bottom, first = True, True
    while lo <= hi:
        k = 1 if first else 2
        for _ in range(k):
            if lo > hi:
                break
            if take_bottom:
                scores[lo] = rank
                lo += 1
            else:
                scores[hi] = rank
                hi -= 1
            rank += 1
        first = False
        take_bottom = not take_bottom
    garr = df["g"].to_numpy()
    w = int(scores[garr == 1].sum())
    n1, n0 = int((garr == 1).sum()), int((garr == 0).sum())
    z = (w - n1 * (n1 + n0 + 1) / 2) / math.sqrt(
        n1 * n0 * (n1 + n0 + 1) / 12
    )
    got = _run(spark, sf_dir, "qs324_siegel_tukey").iloc[0]
    assert got["w"] == w
    assert got["n1"] == n1 and got["n0"] == n0
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs320_pettitt(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    t = (o["o_orderdate"].dt.year - 1992) * 12 + o["o_orderdate"].dt.month
    m = (
        pd.DataFrame({"t": t, "c": _cents(o["o_totalprice"])})
        .groupby("t")["c"]
        .sum()
        .sort_index()
    )
    y = m.to_numpy()
    ts = m.index.to_numpy()
    n = len(y)
    # textbook U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)
    best_k, best_t = -1, None
    for cut in range(n):
        u = int(
            np.sign(y[: cut + 1, None] - y[None, cut + 1 :]).sum()
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), int(ts[cut])
    p = 2 * math.exp(-6 * best_k**2 / (n**3 + n**2))
    got = _run(spark, sf_dir, "qs320_pettitt_changepoint").iloc[0]
    assert got["n_months"] == n
    assert got["k_stat"] == best_k
    assert got["change_month"] == best_t
    assert got["p_approx"] == pytest.approx(p, abs=2e-6)


def test_intent_qs167_zscore_anomaly(spark, sf_dir):
    ev = _pd(sf_dir, "events").sort_values(["event_type", "ts", "event_id"])
    want = set()
    for _et, g in ev.groupby("event_type"):
        x = _cents(g["value"]).astype(float)
        ids = g["event_id"].to_numpy()
        for i in range(len(x)):
            win = x[max(0, i - 20) : i]
            if len(win) < 20:
                continue
            mu, sd = win.mean(), win.std(ddof=1)
            if sd > 0 and abs(x[i] - mu) > 3 * sd:
                want.add(int(ids[i]))
    got = _run(spark, sf_dir, "qs167_zscore_anomaly")
    assert set(got["event_id"].astype(int)) == want


def test_intent_qs230_var_cvar(spark, sf_dir):
    # The original mirrored-oracle sinner, now pinned independently:
    # historical VaR95 = the ceil(n/20)-th LARGEST value (top-5% tail
    # cutoff), CVaR95 = floor-mean of every value at or above it.
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {"prio": o["o_orderpriority"], "v": _cents(o["o_totalprice"])}
    )
    got = _run(spark, sf_dir, "qs230_var_cvar").set_index("prio")
    for prio, g in df.groupby("prio"):
        v = np.sort(g["v"].to_numpy())[::-1]
        k = math.ceil(len(v) / 20)
        var95 = int(v[k - 1])
        tail = v[v >= var95].astype(object)
        cvar = int(sum(tail)) // len(tail)
        assert got.loc[prio, "var95_cents"] == var95
        assert got.loc[prio, "cvar95_cents"] == cvar
        assert got.loc[prio, "n_tail"] == len(tail)


# -- wave 2: variance-homogeneity, blocked ranks, survival, proportions -----


def test_intent_qs309_bartlett(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    groups = [
        li.loc[li["l_returnflag"] == f, "l_quantity"]
        .astype(float)
        .to_numpy()
        for f in ("A", "N", "R")
    ]
    k = len(groups)
    n_tot = sum(len(g) for g in groups)
    vp = sum((len(g) - 1) * g.var(ddof=1) for g in groups) / (n_tot - k)
    num = (n_tot - k) * math.log(vp) - sum(
        (len(g) - 1) * math.log(g.var(ddof=1)) for g in groups
    )
    den = 1 + (
        sum(1 / (len(g) - 1) for g in groups) - 1 / (n_tot - k)
    ) / (3 * (k - 1))
    got = _run(spark, sf_dir, "qs309_bartlett_test").iloc[0]
    assert got["k"] == k and got["n"] == n_tot
    assert got["t_bartlett"] == pytest.approx(num / den, abs=2e-4)


def test_intent_qs291_brown_forsythe(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {"g": o["o_orderpriority"], "v": _cents(o["o_totalprice"])}
    )
    zs = []
    for _g, grp in df.groupby("g"):
        v = np.sort(grp["v"].to_numpy())
        med = v[(len(v) + 1) // 2 - 1]  # lower median (documented)
        zs.append(np.abs(grp["v"].to_numpy() - med).astype(float))
    k = len(zs)
    n_tot = sum(len(z) for z in zs)
    grand = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f = (ssb / (k - 1)) / (ssw / (n_tot - k))
    got = _run(spark, sf_dir, "qs291_brown_forsythe").iloc[0]
    assert got["k"] == k and got["n"] == n_tot
    assert got["bf_stat"] == pytest.approx(f, abs=2e-4)


def test_intent_qs289_friedman(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    wk = (
        pd.DataFrame(
            {
                "b": o["o_orderdate"]
                .dt.to_period("W-SUN")
                .dt.start_time,
                "t": o["o_orderpriority"],
                "c": _cents(o["o_totalprice"]),
            }
        )
        .groupby(["b", "t"])["c"]
        .sum()
        .unstack()
        .dropna()  # complete blocks only (all 5 treatments)
    )
    b, k = wk.shape
    ranks = wk.rank(axis=1, method="average")
    rj = ranks.sum(axis=0).to_numpy()
    chi2 = 12.0 / (b * k * (k + 1)) * float((rj**2).sum()) - 3 * b * (
        k + 1
    )
    got = _run(spark, sf_dir, "qs289_friedman_test").iloc[0]
    assert got["n_blocks"] == b
    assert got["dof"] == k - 1
    assert got["friedman_chi2"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs269_logrank(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    last = (
        pd.DataFrame(
            {"u": ev["user_id"], "g": ev["user_id"] % 2, "d": ev["ts"].dt.date}
        )
        .groupby("u")
        .agg(g=("g", "first"), day=("d", "max"))
    )
    days = sorted(last["day"].unique())
    n1 = int((last["g"] == 1).sum())
    n0 = int((last["g"] == 0).sum())
    obs1 = exp1 = var1 = 0.0
    for day in days:
        d1 = int(((last["g"] == 1) & (last["day"] == day)).sum())
        d0 = int(((last["g"] == 0) & (last["day"] == day)).sum())
        d, n = d1 + d0, n1 + n0
        if d > 0:
            obs1 += d1
            exp1 += d * n1 / n
            if n > 1:
                var1 += d * (n1 / n) * ((n - n1) / n) * ((n - d) / (n - 1))
        n1 -= d1
        n0 -= d0
    chi2 = (obs1 - exp1) ** 2 / var1
    got = _run(spark, sf_dir, "qs269_logrank_test").iloc[0]
    assert got["observed1"] == int(obs1)
    assert got["expected1"] == pytest.approx(exp1, abs=2e-4)
    assert got["variance1"] == pytest.approx(var1, abs=2e-4)
    assert got["logrank_chi2"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs234_wilson(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    g = pd.DataFrame(
        {
            "grp": li["l_partkey"] % 100,
            "r": (li["l_returnflag"] == "R").astype(int),
        }
    ).groupby("grp")["r"]
    got = _run(spark, sf_dir, "qs234_wilson_interval").set_index("grp")
    z2 = 3.84  # documented convention: z^2 = 3.84 folded constants
    for grp, s in g:
        n, k = int(s.count()), int(s.sum())
        center = (k + z2 / 2) / (n + z2)
        half = math.sqrt(z2) * math.sqrt(k * (n - k) / n + z2 / 4) / (
            n + z2
        )
        assert got.loc[grp, "n"] == n and got.loc[grp, "k"] == k
        assert got.loc[grp, "p_center"] == pytest.approx(
            center, abs=2e-4
        )
        assert got.loc[grp, "ci_lo"] == pytest.approx(
            center - half, abs=2e-4
        )
        assert got.loc[grp, "ci_hi"] == pytest.approx(
            center + half, abs=2e-4
        )


# -- wave 3: index numbers, entropy association, survival means, priors -----


def test_intent_qs287_fisher(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    g = (
        pd.DataFrame(
            {
                "grp": li["l_partkey"] % 100,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
                "q": li["l_quantity"].astype(np.int64),
            }
        )
        .groupby(["grp", "t"])
        .agg(c=("c", "sum"), q=("q", "sum"))
        .reset_index()
    )
    g = g[g["q"] > 0]
    g["p_e2"] = (g["c"] * 100) // g["q"]  # documented e2 unit-price floor
    base = (
        g[(g["t"] >= 13) & (g["t"] <= 24)]
        .groupby("grp")
        .agg(c=("c", "sum"), q0=("q", "sum"))
    )
    base["p0_e2"] = (base["c"] * 100) // base["q0"]
    j = g.merge(base[["p0_e2", "q0"]], on="grp")
    got = _run(spark, sf_dir, "qs287_fisher_index").set_index("t")
    for t, grp in j.groupby("t"):
        ld = float((grp["p0_e2"] * grp["q0"]).sum())
        pdn = float((grp["p0_e2"] * grp["q"]).sum())
        if ld <= 0 or pdn <= 0:
            continue
        lasp = float((grp["p_e2"] * grp["q0"]).sum()) / ld
        paas = float((grp["p_e2"] * grp["q"]).sum()) / pdn
        assert got.loc[t, "laspeyres"] == pytest.approx(lasp, abs=2e-6)
        assert got.loc[t, "paasche"] == pytest.approx(paas, abs=2e-6)
        assert got.loc[t, "fisher"] == pytest.approx(
            math.sqrt(lasp * paas), abs=2e-6
        )


def test_intent_qs301_theils_u(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    x = o["o_orderpriority"].to_numpy()
    y = o["o_orderstatus"].to_numpy()
    n = len(o)
    py = pd.Series(y).value_counts() / n
    hy = float(-(py * np.log(py)).sum())
    hyx = 0.0
    for xv in np.unique(x):
        sel = x == xv
        pxy = pd.Series(y[sel]).value_counts() / n
        pygx = pd.Series(y[sel]).value_counts() / sel.sum()
        hyx += float(-(pxy.to_numpy() * np.log(pygx.to_numpy())).sum())
    got = _run(spark, sf_dir, "qs301_theils_u").iloc[0]
    assert got["n"] == n
    assert got["h_y"] == pytest.approx(hy, abs=2e-4)
    assert got["h_y_given_x"] == pytest.approx(hyx, abs=2e-4)
    assert got["theils_u"] == pytest.approx((hy - hyx) / hy, abs=2e-4)


def test_intent_qs296_rmst(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    e0 = ev["ts"].dt.date.min()
    t = (
        pd.DataFrame({"u": ev["user_id"], "d": ev["ts"].dt.date})
        .groupby("u")["d"]
        .max()
        .map(lambda d: (d - e0).days)
        .to_numpy()
    )
    tau = 21
    n = len(t)
    times = np.sort(np.unique(t))
    s, at_risk = 1.0, n
    rmst = 0.0
    prev, s_at_tau = 0, 1.0
    for tt in times:
        seg_end = min(int(tt), tau)
        rmst += s * max(0, seg_end - prev)
        prev = seg_end
        d = int((t == tt).sum())
        s *= 1 - d / at_risk
        at_risk -= d
        if tt <= tau:
            s_at_tau = s
    rmst += s * max(0, tau - prev)
    got = _run(spark, sf_dir, "qs296_rmst").iloc[0]
    assert got["tau_days"] == tau and got["n_users"] == n
    assert got["rmst_days"] == pytest.approx(rmst, abs=2e-4)
    assert got["surv_at_tau"] == pytest.approx(s_at_tau, abs=2e-4)


def test_intent_qs229_eb_shrinkage(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    g = (
        pd.DataFrame(
            {"grp": li["l_partkey"] % 500, "c": _cents(li["l_extendedprice"])}
        )
        .groupby("grp")["c"]
        .agg(["count", "sum"])
    )
    grand = g["sum"].sum() / g["count"].sum()
    got = _run(spark, sf_dir, "qs229_eb_shrinkage").set_index("grp")
    for grp, row in g.iterrows():
        n, c = int(row["count"]), int(row["sum"])
        assert got.loc[grp, "n"] == n
        assert got.loc[grp, "raw_mean_cents"] == pytest.approx(
            c / n, abs=2e-4
        )
        assert got.loc[grp, "shrunk_mean_cents"] == pytest.approx(
            (c + 20 * grand) / (n + 20), abs=2e-4
        )


def test_intent_qs184_powerlaw(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    f = o["o_custkey"].value_counts().to_numpy()
    fit = f[f >= 5].astype(float)
    # discrete Hill/Clauset MLE approximation with x_min - 1/2
    alpha = 1 + len(fit) / float(np.log(fit / 4.5).sum())
    got = _run(spark, sf_dir, "qs184_powerlaw_fit").iloc[0]
    assert got["n_fit"] == len(fit)
    assert got["fmin"] == 5
    assert got["alpha"] == pytest.approx(alpha, abs=2e-4)


# -- wave 4: the r10 grading window's remaining named statistics ------------


def test_intent_qs322_pages_trend(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    wk = (
        pd.DataFrame(
            {
                "b": o["o_orderdate"].dt.to_period("W-SUN").dt.start_time,
                "t": o["o_orderpriority"].str[0].astype(int),
                "c": _cents(o["o_totalprice"]),
            }
        )
        .groupby(["b", "t"])["c"]
        .sum()
        .unstack()
        .dropna()
    )
    b, k = wk.shape
    ranks = wk.rank(axis=1, method="first")  # unique sums; tie by t
    ell = int((ranks * np.arange(1, k + 1)).to_numpy().sum())
    z = (ell - b * k * (k + 1) ** 2 / 4) / math.sqrt(
        b * k**2 * (k + 1) * (k**2 - 1) / 144
    )
    got = _run(spark, sf_dir, "qs322_pages_trend").iloc[0]
    assert got["nb"] == b
    assert got["l"] == ell
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs329_gmd(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    got = _run(spark, sf_dir, "qs329_gini_mean_difference").set_index(
        "flag"
    )
    for flag, grp in li.groupby("l_returnflag"):
        v = grp["l_quantity"].astype(np.int64).to_numpy()
        n = len(v)
        gmd = float(np.abs(v[:, None] - v[None, :]).sum()) / (
            n * (n - 1)
        )
        assert got.loc[flag, "n"] == n
        assert got.loc[flag, "gmd"] == pytest.approx(gmd, abs=2e-6)


def test_intent_qs335_zipf_slope(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    toks = pd.Series(
        [t for s in docs["text"] for t in s.lower().split(" ") if t]
    )
    f = toks.value_counts()
    top = f.sort_values(ascending=False).head(100)
    # rank ties broken by term, matching the documented (f desc, term)
    top = top.reset_index()
    top.columns = ["term", "f"]
    top = top.sort_values(["f", "term"], ascending=[False, True])
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(top["f"].to_numpy(dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    got = _run(spark, sf_dir, "qs335_zipf_slope").iloc[0]
    assert got["n_terms"] == len(top)
    assert got["zipf_slope"] == pytest.approx(slope, abs=2e-4)


def test_intent_qs350_theil(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    c = (
        pd.DataFrame(
            {"grp": li["l_partkey"] % 200, "c": _cents(li["l_extendedprice"])}
        )
        .groupby("grp")["c"]
        .sum()
        .to_numpy()
        .astype(float)
    )
    n = len(c)
    s = c / c.sum()
    theil_t = float((s * np.log(s * n)).sum())
    theil_l = float(-(np.log(s * n)).sum() / n)
    got = _run(spark, sf_dir, "qs350_theil_index").iloc[0]
    assert got["n_groups"] == n
    assert got["theil_t"] == pytest.approx(theil_t, abs=2e-6)
    assert got["theil_l"] == pytest.approx(theil_l, abs=2e-6)


def test_intent_qs343_kupiec(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {
            "prio": o["o_orderpriority"],
            "v": _cents(o["o_totalprice"]),
            "y": o["o_orderdate"].dt.year,
        }
    )
    got = _run(spark, sf_dir, "qs343_kupiec_pof").set_index("prio")
    for prio, g in df.groupby("prio"):
        v96 = np.sort(g.loc[g["y"] == 1996, "v"].to_numpy())[::-1]
        var95 = int(v96[math.ceil(len(v96) / 20) - 1])
        oos = g.loc[g["y"] == 1997, "v"].to_numpy()
        n, x = len(oos), int((oos >= var95).sum())
        lr = -2 * (
            (n - x) * math.log(0.95)
            + x * math.log(0.05)
            - (n - x) * math.log(1 - x / n)
            - (x * math.log(x / n) if x > 0 else 0.0)
        )
        assert got.loc[prio, "var95_cents"] == var95
        assert got.loc[prio, "n"] == n and got.loc[prio, "x"] == x
        assert got.loc[prio, "lr_pof"] == pytest.approx(lr, abs=2e-4)


def _bin_labels(sf_dir):
    c = _pd(sf_dir, "customer")
    o = _pd(sf_dir, "orders")
    has = c["c_custkey"].isin(set(o["o_custkey"]))
    b = np.clip(
        np.floor((c["c_acctbal"].to_numpy() + 1000) / 1100).astype(int),
        0,
        9,
    )
    return b, has.to_numpy().astype(int)


def test_intent_qs330_average_precision(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    y95 = o[o["o_orderdate"].dt.year == 1995]
    spend = (
        pd.DataFrame(
            {"cust": y95["o_custkey"], "c": _cents(y95["o_totalprice"])}
        )
        .groupby("cust")["c"]
        .sum()
        .reset_index()
    )
    resp = set(o.loc[o["o_orderdate"].dt.year == 1996, "o_custkey"])
    spend["rel"] = spend["cust"].isin(resp).astype(int)
    top = spend.sort_values(
        ["c", "cust"], ascending=[False, True]
    ).head(1000)
    rel = top["rel"].to_numpy()
    cum = np.cumsum(rel)
    rn = np.arange(1, len(rel) + 1)
    ap = float((cum[rel == 1] / rn[rel == 1]).sum()) / cum[-1]
    got = _run(spark, sf_dir, "qs330_average_precision").iloc[0]
    assert got["n_rel_retrieved"] == int(cum[-1])
    assert got["n_rel_total"] == int(spend["rel"].sum())
    assert got["ap"] == pytest.approx(ap, abs=2e-6)


def test_intent_qs332_brier_decomposition(spark, sf_dir):
    b, y = _bin_labels(sf_dir)
    n = len(y)
    obar = y.mean()
    rel = res = 0.0
    for k in range(10):
        sel = b == k
        nk = int(sel.sum())
        if nk == 0:
            continue
        ok = y[sel].mean()
        pk = (2 * k + 1) / 20
        rel += nk * (pk - ok) ** 2
        res += nk * (ok - obar) ** 2
    got = _run(spark, sf_dir, "qs332_brier_decomposition").iloc[0]
    assert got["n"] == n
    assert got["reliability"] == pytest.approx(rel / n, abs=2e-6)
    assert got["resolution"] == pytest.approx(res / n, abs=2e-6)
    assert got["uncertainty"] == pytest.approx(
        obar * (1 - obar), abs=2e-6
    )


def test_intent_qs333_binned_logloss(spark, sf_dir):
    b, y = _bin_labels(sf_dir)
    ll = 0.0
    for k in range(10):
        sel = b == k
        s, nk = int(y[sel].sum()), int(sel.sum())
        p = (2 * k + 1) / 20
        ll -= s * math.log(p) + (nk - s) * math.log(1 - p)
    got = _run(spark, sf_dir, "qs333_binned_logloss").iloc[0]
    assert got["n"] == len(y)
    assert got["logloss"] == pytest.approx(ll / len(y), abs=2e-6)


def test_intent_qs336_xyz(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    wk = (
        pd.DataFrame(
            {
                "grp": li["l_partkey"] % 200,
                "w": li["l_shipdate"].dt.to_period("W-SUN").dt.start_time,
                "q": li["l_quantity"].astype(np.int64),
            }
        )
        .groupby(["grp", "w"])["q"]
        .sum()
        .reset_index(name="x")
    )
    got = _run(spark, sf_dir, "qs336_xyz_classification").set_index("grp")
    for grp, g in wk.groupby("grp"):
        x = g["x"].to_numpy().astype(float)
        n = len(x)
        cv2 = x.var(ddof=0) / x.mean() ** 2  # population CV^2
        cls = "X" if cv2 <= 0.25 else ("Y" if cv2 <= 1.0 else "Z")
        assert got.loc[grp, "n"] == n
        # engine reports an e6 trunc of the same integer-exact ratio
        assert got.loc[grp, "cv2_e6"] == pytest.approx(
            cv2 * 1e6, abs=1.01
        )
        assert got.loc[grp, "xyz"] == cls


def test_intent_qs338_croston(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    li = li[li["l_partkey"] % 97 == 3]
    wk0 = pd.Timestamp("1995-01-02")
    dem = (
        pd.DataFrame(
            {
                "grp": li["l_partkey"] % 10,
                "w": (
                    li["l_shipdate"].dt.to_period("W-SUN").dt.start_time
                    - wk0
                ).dt.days
                // 7,
                "q": li["l_quantity"].astype(np.int64),
            }
        )
        .groupby(["grp", "w"])["q"]
        .sum()
        .reset_index(name="z")
    )
    got = _run(spark, sf_dir, "qs338_croston_forecast").set_index("grp")
    for grp, g in dem.groupby("grp"):
        g = g.sort_values("w")
        z = g["z"].to_numpy().astype(float)
        w = g["w"].to_numpy()
        gaps = np.concatenate([[1.0], np.diff(w).astype(float)])
        zh, ph = z[0], gaps[0]
        for j in range(1, len(z)):  # classic SES recursion, alpha=0.2
            zh = 0.2 * z[j] + 0.8 * zh
            ph = 0.2 * gaps[j] + 0.8 * ph
        assert got.loc[grp, "n_demands"] == len(z)
        assert got.loc[grp, "size_hat"] == pytest.approx(zh, abs=2e-4)
        assert got.loc[grp, "interval_hat"] == pytest.approx(
            ph, abs=2e-4
        )
        assert got.loc[grp, "croston_rate"] == pytest.approx(
            zh / ph, abs=2e-4
        )


def test_intent_qs326_bowker(spark, sf_dir):
    o = _pd(sf_dir, "orders").sort_values(["o_orderdate", "o_orderkey"])
    fp = o.groupby("o_custkey")["o_orderpriority"].first()
    lp = o.groupby("o_custkey")["o_orderpriority"].last()
    cats = sorted(o["o_orderpriority"].unique())
    chi2, dof = 0.0, 0
    for a in range(len(cats)):
        for b in range(a + 1, len(cats)):
            nab = int(((fp == cats[a]) & (lp == cats[b])).sum())
            nba = int(((fp == cats[b]) & (lp == cats[a])).sum())
            dof += 1
            if nab + nba > 0:
                chi2 += (nab - nba) ** 2 / (nab + nba)
    got = _run(spark, sf_dir, "qs326_bowker_symmetry").iloc[0]
    assert got["df"] == dof
    assert got["chi2"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs339_cucconi(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {
            "g": (o["o_custkey"] % 2).to_numpy(),
            "key": o["o_orderkey"].to_numpy(),
            "v": _cents(o["o_totalprice"]),
        }
    ).sort_values(["v", "key"], kind="mergesort")
    n = len(df)
    rk = np.arange(1, n + 1)
    sel = df["g"].to_numpy() == 1
    n1, n0 = int(sel.sum()), int(n - sel.sum())
    sr2 = float((rk[sel] ** 2).sum())
    ss2 = float(((n + 1 - rk[sel]) ** 2).sum())
    den = math.sqrt(n1 * n0 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    u = (6 * sr2 - n1 * (n + 1) * (2 * n + 1)) / den
    v = (6 * ss2 - n1 * (n + 1) * (2 * n + 1)) / den
    rho = 2 * (n**2 - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (u**2 + v**2 - 2 * rho * u * v) / (2 * (1 - rho**2))
    got = _run(spark, sf_dir, "qs339_cucconi_test").iloc[0]
    assert got["n1"] == n1 and got["n0"] == n0
    assert got["u"] == pytest.approx(u, abs=2e-4)
    assert got["v"] == pytest.approx(v, abs=2e-4)
    assert got["c_stat"] == pytest.approx(c, abs=2e-4)


def test_intent_qs347_weighted_kappa(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    i = o["o_orderpriority"].str[0].astype(int).to_numpy()
    j = np.minimum(
        5, 1 + np.floor(o["o_totalprice"].to_numpy() / 100000).astype(int)
    )
    n = len(i)
    # quadratic-disagreement-weight kappa: 1 - n*sum(w*obs)/sum(w*exp)
    wo = float(((i - j) ** 2).sum())
    wrc = 0.0
    for a in np.unique(i):
        for b in np.unique(j):
            wrc += (
                (a - b) ** 2
                * int((i == a).sum())
                * int((j == b).sum())
            )
    kappa = 1 - n * wo / wrc
    got = _run(spark, sf_dir, "qs347_weighted_kappa").iloc[0]
    assert got["n_orders"] == n
    assert got["weighted_kappa"] == pytest.approx(kappa, abs=2e-6)


def test_intent_qs348_entropy_profile(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    li = _pd(sf_dir, "lineitem")
    c = _pd(sf_dir, "customer")
    cols = {
        "o_orderpriority": o["o_orderpriority"],
        "o_orderstatus": o["o_orderstatus"],
        "l_returnflag": li["l_returnflag"],
        "c_mktsegment": c["c_mktsegment"],
    }
    got = _run(spark, sf_dir, "qs348_entropy_profile").set_index(
        "column_name"
    )
    for name, s in cols.items():
        p = s.value_counts(normalize=True).to_numpy()
        h = float(-(p * np.log(p)).sum())
        k = len(p)
        assert got.loc[name, "n"] == len(s)
        assert got.loc[name, "n_distinct"] == k
        assert got.loc[name, "entropy_nats"] == pytest.approx(
            h, abs=2e-6
        )
        assert got.loc[name, "normalized"] == pytest.approx(
            h / math.log(k), abs=2e-6
        )


def test_intent_qs349_page_hinkley(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    o = o[o["o_orderdate"].dt.year.isin([1996, 1997])]
    daily = (
        pd.DataFrame(
            {"d": o["o_orderdate"].dt.date, "c": _cents(o["o_totalprice"])}
        )
        .groupby("d")["c"]
        .sum()
        .sort_index()
        // 10000
    )
    x = daily.to_numpy().astype(float)
    days = daily.index.to_numpy()
    # online PH: m_T = sum_{s<=T} (x_s - running_mean_s - delta)
    m, sx, ms = 0.0, 0.0, []
    for t, xv in enumerate(x, start=1):
        sx += xv
        m += xv - sx / t - 5.0
        ms.append(m)
    ms = np.array(ms)
    got = _run(spark, sf_dir, "qs349_page_hinkley").iloc[0]
    assert got["n_days"] == len(x)
    assert got["ph_range"] == pytest.approx(
        float(ms.max() - ms.min()), abs=2e-4
    )
    assert got["peak_day"] == days[int(np.argmax(ms))]


def test_intent_qs327_ordinal_association(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    x = o["o_orderpriority"].str[0].astype(int).to_numpy()
    y = np.minimum(
        4, 1 + np.floor(o["o_totalprice"].to_numpy() / 150000).astype(int)
    )
    n = len(x)
    xs, ys = np.unique(x), np.unique(y)
    tab = np.zeros((len(xs), len(ys)), dtype=np.int64)
    for i, xv in enumerate(xs):
        for j, yv in enumerate(ys):
            tab[i, j] = int(((x == xv) & (y == yv)).sum())
    conc = disc = tx = ty = 0
    for i in range(len(xs)):
        for j in range(len(ys)):
            conc += tab[i, j] * tab[i + 1 :, j + 1 :].sum()
            disc += tab[i, j] * tab[i + 1 :, :j].sum()
            tx += tab[i, j] * tab[i, j + 1 :].sum()  # tied x, y differs
            ty += tab[i, j] * tab[i + 1 :, j].sum()  # tied y, x differs
    m = min(len(xs), len(ys))
    got = _run(spark, sf_dir, "qs327_ordinal_association").iloc[0]
    assert got["conc"] == conc and got["disc"] == disc
    assert got["gamma"] == pytest.approx(
        (conc - disc) / (conc + disc), abs=2e-6
    )
    assert got["somers_d_yx"] == pytest.approx(
        (conc - disc) / (conc + disc + ty), abs=2e-6
    )
    assert got["somers_d_xy"] == pytest.approx(
        (conc - disc) / (conc + disc + tx), abs=2e-6
    )
    # Kendall tau-c = 2m(C-D)/(n^2(m-1))
    assert got["tau_c"] == pytest.approx(
        2 * m * (conc - disc) / (n * n * (m - 1)), abs=2e-6
    )


def test_intent_qs328_quade(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    wk = (
        pd.DataFrame(
            {
                "b": o["o_orderdate"].dt.to_period("W-SUN").dt.start_time,
                "t": o["o_orderpriority"].str[0].astype(int),
                "c": _cents(o["o_totalprice"]),
            }
        )
        .groupby(["b", "t"])["c"]
        .sum()
        .unstack()
        .dropna()
    )
    nb, k = wk.shape
    ranks = wk.rank(axis=1, method="first").to_numpy()
    # block weights: rank of each block's sample range (ties broken by
    # block order — method="first" over the b-sorted frame)
    rng = (wk.max(axis=1) - wk.min(axis=1)).sort_index()
    qb = rng.rank(method="first").to_numpy()
    s = qb[:, None] * (ranks - (k + 1) / 2)
    a = float((s**2).sum())
    bstat = float((s.sum(axis=0) ** 2).sum()) / nb
    f = (nb - 1) * bstat / (a - bstat)
    got = _run(spark, sf_dir, "qs328_quade_test").iloc[0]
    assert got["nb"] == nb
    assert got["f_stat"] == pytest.approx(f, abs=2e-4)


def test_intent_qs337_association_metrics(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    basket = (
        pd.DataFrame(
            {"o": li["l_orderkey"], "item": li["l_partkey"] % 50}
        )
        .drop_duplicates()
    )
    nn = basket["o"].nunique()
    sup = basket.groupby("item")["o"].apply(set)
    got = _run(spark, sf_dir, "qs337_association_metrics").set_index(
        ["item_a", "item_b"]
    )
    checked = 0
    items = sorted(sup.index)
    for ai in range(len(items)):
        for bi in range(ai + 1, len(items)):
            a, b = items[ai], items[bi]
            s_ab = len(sup[a] & sup[b])
            if s_ab < 5:
                assert (a, b) not in got.index
                continue
            sa, sb = len(sup[a]), len(sup[b])
            lev = s_ab / nn - (sa / nn) * (sb / nn)
            conv = (
                (1 - sb / nn) / (1 - s_ab / sa)
                if sb < nn and s_ab < sa
                else None
            )
            zhang = (s_ab * nn - sa * sb) / max(
                s_ab * nn - s_ab * sb, sa * sb - s_ab * sb
            )
            row = got.loc[(a, b)]
            assert row["support"] == s_ab
            assert row["leverage"] == pytest.approx(lev, abs=2e-6)
            if conv is not None:
                assert row["conviction"] == pytest.approx(conv, abs=2e-6)
            assert row["zhang"] == pytest.approx(zhang, abs=2e-6)
            checked += 1
    assert checked == len(got)


def test_intent_qs340_temporal_conformance(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    o = _pd(sf_dir, "orders")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    lag = (j["l_shipdate"].dt.normalize() - j["o_orderdate"]).dt.days
    got = _run(spark, sf_dir, "qs340_temporal_conformance").set_index(
        "status"
    )
    for st, g in lag.groupby(j["o_orderstatus"]):
        assert got.loc[st, "n"] == len(g)
        assert got.loc[st, "n_violation"] == int((g < 0).sum())
        assert got.loc[st, "n_0_30"] == int(((g >= 0) & (g <= 30)).sum())
        assert got.loc[st, "n_31_90"] == int(((g > 30) & (g <= 90)).sum())
        assert got.loc[st, "n_gt_90"] == int((g > 90).sum())


def test_intent_qs315_dedup_cluster_stats(spark, sf_dir):
    import hashlib

    docs = _pd(sf_dir, "documents")
    h = docs["text"].map(
        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
    )
    sizes = h.value_counts().value_counts().sort_index()
    got = _run(spark, sf_dir, "qs315_dedup_cluster_stats").set_index(
        "cluster_size"
    )
    assert len(got) == len(sizes)
    for k, n_cl in sizes.items():
        assert got.loc[k, "n_clusters"] == n_cl
        assert got.loc[k, "n_docs"] == k * n_cl
        assert got.loc[k, "n_removable"] == (k - 1) * n_cl


# -- wave 5: remaining r10-window statistics ---------------------------------


def test_intent_qs321_kendalls_w(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    wk = (
        pd.DataFrame(
            {
                "b": o["o_orderdate"].dt.to_period("W-SUN").dt.start_time,
                "t": o["o_orderpriority"],
                "c": _cents(o["o_totalprice"]),
            }
        )
        .groupby(["b", "t"])["c"]
        .sum()
        .unstack()
        .dropna()
    )
    b, k = wk.shape
    ranks = wk.rank(axis=1, method="average")
    rj = ranks.sum(axis=0).to_numpy()
    s = float(((rj - b * (k + 1) / 2) ** 2).sum())
    tt = 0
    for _i, row in wk.iterrows():
        _v, counts = np.unique(row.to_numpy(), return_counts=True)
        tt += int((counts**3 - counts).sum())
    w = 12 * s / (b**2 * k * (k**2 - 1) - b * tt)
    got = _run(spark, sf_dir, "qs321_kendalls_w").iloc[0]
    assert got["n_blocks"] == b
    assert got["kendalls_w"] == pytest.approx(w, abs=2e-4)


def test_intent_qs318_ljung_box(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    t = (o["o_orderdate"].dt.year - 1992) * 12 + o["o_orderdate"].dt.month
    y = t.value_counts().sort_index().to_numpy().astype(float)
    n = len(y)
    e = y - y.mean()
    c0 = float((e * e).sum())
    q = 0.0
    for k in range(1, 13):
        rk = float((e[:-k] * e[k:]).sum()) / c0
        q += rk**2 / (n - k)
    q *= n * (n + 2)
    got = _run(spark, sf_dir, "qs318_ljung_box").iloc[0]
    assert got["n_months"] == n and got["m_lags"] == 12
    assert got["q_lb"] == pytest.approx(q, abs=2e-4)


def test_intent_qs319_cochran_q(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    f = np.stack(
        [
            (o["o_totalprice"] > 150000).to_numpy().astype(int),
            o["o_orderpriority"]
            .isin(["1-URGENT", "2-HIGH"])
            .to_numpy()
            .astype(int),
            (o["o_orderstatus"] == "F").to_numpy().astype(int),
        ],
        axis=1,
    )
    k = 3
    cj = f.sum(axis=0)
    ri = f.sum(axis=1)
    s = int(ri.sum())
    q = (
        k
        * (k - 1)
        * float(((cj - s / k) ** 2).sum())
        / (k * s - int((ri**2).sum()))
    )
    got = _run(spark, sf_dir, "qs319_cochran_q").iloc[0]
    assert got["n"] == len(f) and got["k"] == k
    assert got["q_cochran"] == pytest.approx(q, abs=2e-4)


def test_intent_qs316_partial_correlation(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    x = li["l_quantity"].astype(float).to_numpy()
    y = _cents(li["l_extendedprice"]).astype(float)
    z = np.round(li["l_discount"].to_numpy() * 100).astype(float)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    pc = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    got = _run(spark, sf_dir, "qs316_partial_correlation").iloc[0]
    assert got["n"] == len(x)
    assert got["r_xy"] == pytest.approx(rxy, abs=2e-4)
    assert got["r_xy_given_z"] == pytest.approx(pc, abs=2e-4)
    assert got["vif_x_on_z"] == pytest.approx(
        1 / (1 - rxz**2), abs=2e-4
    )


def test_intent_qs317_process_capability(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    o = _pd(sf_dir, "orders")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        (j["l_shipdate"].dt.normalize() - j["o_orderdate"]).dt.days
    ).to_numpy(dtype=float)
    mu, sd = lag.mean(), lag.std(ddof=1)
    cp = (120 - 0) / (6 * sd)
    cpk = min(120 - mu, mu - 0) / (3 * sd)
    got = _run(spark, sf_dir, "qs317_process_capability").iloc[0]
    assert got["n"] == len(lag)
    assert got["mean_lag_days"] == pytest.approx(mu, abs=2e-4)
    assert got["cp"] == pytest.approx(cp, abs=2e-4)
    assert got["cpk"] == pytest.approx(cpk, abs=2e-4)


def test_intent_qs307_gini(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    nat = _pd(sf_dir, "nation")
    c = c[c["c_acctbal"] > 0]
    df = pd.DataFrame(
        {
            "nk": c["c_nationkey"],
            "cents": _cents(c["c_acctbal"]),
        }
    ).merge(nat, left_on="nk", right_on="n_nationkey")
    got = _run(spark, sf_dir, "qs307_gini_balances").set_index("nation")
    for name, g in df.groupby("n_name"):
        x = np.sort(g["cents"].to_numpy()).astype(float)
        n = len(x)
        gini = (2 * float((np.arange(1, n + 1) * x).sum()) - (n + 1)
                * x.sum()) / (n * x.sum())
        assert got.loc[name, "n_customers"] == n
        assert got.loc[name, "gini"] == pytest.approx(gini, abs=2e-4)


def test_intent_qs312_anova_effect_sizes(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    df = pd.DataFrame(
        {"g": ev["event_type"], "v": _cents(ev["value"]).astype(float)}
    )
    n = len(df)
    k = df["g"].nunique()
    grand = df["v"].mean()
    ssb = sum(
        len(g) * (g["v"].mean() - grand) ** 2
        for _x, g in df.groupby("g")
    )
    sst = float(((df["v"] - grand) ** 2).sum())
    ssw = sst - ssb
    msw = ssw / (n - k)
    eta2 = ssb / sst
    omega2 = (ssb - (k - 1) * msw) / (sst + msw)
    got = _run(spark, sf_dir, "qs312_anova_effect_sizes").iloc[0]
    assert got["k"] == k and got["n"] == n
    assert got["eta2"] == pytest.approx(eta2, abs=2e-6)
    assert got["omega2"] == pytest.approx(omega2, abs=2e-6)


def test_intent_qs325_breslow_day(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    o = _pd(sf_dir, "orders")
    heavy = set(
        o.groupby("o_custkey").size().loc[lambda s: s >= 11].index
    )
    segs = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY")
    tabs = []
    for seg in segs:
        sel = c["c_mktsegment"] == seg
        x = (c.loc[sel, "c_acctbal"] > 5000).to_numpy()
        y = c.loc[sel, "c_custkey"].isin(heavy).to_numpy()
        tabs.append(
            (
                float((x & y).sum()),
                float((x & ~y).sum()),
                float((~x & y).sum()),
                float((~x & ~y).sum()),
            )
        )
    # Mantel-Haenszel common odds ratio
    orr = sum(a * d / (a + b + cc + d) for a, b, cc, d in tabs) / sum(
        b * cc / (a + b + cc + d) for a, b, cc, d in tabs
    )
    chi2 = 0.0
    for a, b, cc, d in tabs:
        n1, m1, n = a + b, a + cc, a + b + cc + d
        # fitted a under the common OR: the standard quadratic, minus
        # root (keeps all four fitted cells positive)
        A = orr - 1
        B = orr * (n1 + m1) + (n - n1 - m1)
        C = orr * n1 * m1
        atil = (B - math.sqrt(B * B - 4 * A * C)) / (2 * A)
        var = 1 / (
            1 / atil
            + 1 / (n1 - atil)
            + 1 / (m1 - atil)
            + 1 / (n - n1 - m1 + atil)
        )
        chi2 += (a - atil) ** 2 / var
    got = _run(spark, sf_dir, "qs325_breslow_day").iloc[0]
    assert got["df"] == len(segs) - 1
    assert got["common_or"] == pytest.approx(orr, abs=2e-6)
    assert got["bd_chi2"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs345_hurst(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    daily = (
        pd.DataFrame(
            {
                "t": (
                    o["o_orderdate"] - pd.Timestamp("1995-01-01")
                ).dt.days,
                "c": _cents(o["o_totalprice"]),
            }
        )
        .groupby("t")["c"]
        .sum()
        // 10000
    )
    xs, ys, nb_total = [], [], 0
    for w in (50, 100, 200, 400):
        blocks = daily.groupby(daily.index // w)
        rsvs = []
        for _b, g in blocks:
            if len(g) != w:
                continue
            y = g.sort_index().to_numpy().astype(float)
            d = y - y.mean()
            cum = np.cumsum(d)
            s = y.std(ddof=0)
            rsvs.append((cum.max() - cum.min()) / s)
        if rsvs:
            xs.append(math.log(w))
            ys.append(math.log(np.mean(rsvs)))
            nb_total += len(rsvs)
    k = len(xs)
    got = _run(spark, sf_dir, "qs345_hurst_exponent").iloc[0]
    assert got["n_windows"] == k
    if k < 2:
        # degenerate slope (0/1 usable windows at tiny SFs): the query
        # returns NULL — the textbook OLS is undefined there too
        assert pd.isna(got["hurst"])
        return
    assert got["n_blocks"] == nb_total
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    hurst = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert got["hurst"] == pytest.approx(hurst, abs=2e-4)


# -- wave 6: older-round named statistics (KS, ranks, kappa, ECE) -----------


def test_intent_qs227_ks(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    v = _cents(o["o_totalprice"])
    g = (o["o_custkey"] % 2).to_numpy()
    a = np.sort(v[g == 0])
    b = np.sort(v[g == 1])
    pooled = np.unique(v)
    f0 = np.searchsorted(a, pooled, side="right") / len(a)
    f1 = np.searchsorted(b, pooled, side="right") / len(b)
    d = float(np.max(np.abs(f0 - f1)))
    got = _run(spark, sf_dir, "qs227_ks_two_sample").iloc[0]
    assert got["n0"] == len(a) and got["n1"] == len(b)
    # engine reports an e6 floor of the exact rational D
    assert got["ks_d_e6"] == int(d * 1e6) or got[
        "ks_d_e6"
    ] == pytest.approx(d * 1e6, abs=1.01)


def test_intent_qs243_spearman(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    got = _run(spark, sf_dir, "qs243_spearman_corr").set_index("flag")
    for flag, g in li.groupby("l_returnflag"):
        rx = g["l_quantity"].rank(method="average").to_numpy()
        ry = (
            pd.Series(_cents(g["l_extendedprice"]))
            .rank(method="average")
            .to_numpy()
        )
        rho = np.corrcoef(rx, ry)[0, 1]
        assert got.loc[flag, "n"] == len(g)
        assert got.loc[flag, "spearman_rho"] == pytest.approx(
            rho, abs=2e-4
        )


def test_intent_qs244_cohens_kappa(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    stop = {
        "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it",
               "for"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein",
               "mit", "auf", "zu"},
        "es": {"el", "la", "de", "que", "y", "en", "un", "es", "no",
               "por"},
        "fr": {"le", "la", "de", "et", "un", "est", "pas", "que",
               "pour", "dans"},
    }
    import re as _re

    guesses, truths = [], []
    for _i, row in docs.iterrows():
        toks = _re.split(r"\s+", row["text"].lower())
        hits = {
            lang: sum(t in sw for t in toks) for lang, sw in stop.items()
        }
        best = max(hits.values())
        if best == 0:
            guess = "und"
        else:  # tie order en > de > es > fr (the documented CASE order)
            for lang in ("en", "de", "es", "fr"):
                if hits[lang] == best:
                    guess = lang
                    break
        guesses.append(guess)
        truths.append(row["lang"])
    g = np.array(guesses)
    t = np.array(truths)
    n = len(t)
    po = float((g == t).mean())
    labs = set(g) | set(t)
    pe = sum(
        float((t == L).sum()) * float((g == L).sum()) for L in labs
    ) / (n * n)
    kappa = (po - pe) / (1 - pe)
    got = _run(spark, sf_dir, "qs244_langid_kappa_eval").iloc[0]
    assert got["n_docs"] == n
    assert got["accuracy"] == pytest.approx(po, abs=2e-4)
    assert got["kappa"] == pytest.approx(kappa, abs=2e-4)


def test_intent_qs254_mcnemar(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    toks = docs["text"].str.split(" ")
    a = toks.map(len).between(50, 100000).astype(int)
    avg = toks.map(lambda ts: sum(len(t) for t in ts) / len(ts))
    b = avg.between(3.0, 10.0).astype(int)
    nb = int(((a == 1) & (b == 0)).sum())
    nc = int(((a == 0) & (b == 1)).sum())
    # UNcorrected McNemar chi2 (documented; no continuity correction)
    chi2 = 0.0 if nb + nc == 0 else (nb - nc) ** 2 / (nb + nc)
    got = _run(spark, sf_dir, "qs254_mcnemar_paired").iloc[0]
    assert got["only_a"] == nb and got["only_b"] == nc
    assert got["mcnemar_chi2"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs264_ece(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    y95 = o[o["o_orderdate"].dt.year == 1995]
    spend = (
        pd.DataFrame(
            {"ck": y95["o_custkey"], "s": _cents(y95["o_totalprice"])}
        )
        .groupby("ck")["s"]
        .sum()
        .reset_index()
    )
    resp = set(o.loc[o["o_orderdate"].dt.year == 1996, "o_custkey"])
    spend["y"] = spend["ck"].isin(resp).astype(int)
    train = spend[spend["ck"] % 2 == 1].sort_values(
        ["s", "ck"], ascending=[False, True]
    )
    test = spend[spend["ck"] % 2 == 0]
    n_tr = len(train)
    # NTILE(10): first (n mod 10) tiles get the extra row
    base, extra = divmod(n_tr, 10)
    tile_sizes = [base + (1 if i < extra else 0) for i in range(10)]
    tiles = np.repeat(np.arange(1, 11), tile_sizes)
    train = train.assign(d=tiles)
    model = train.groupby("d").agg(
        lo=("s", "min"), n_train=("s", "size"), r_train=("y", "sum")
    )
    los = model["lo"].to_numpy()

    def assign(s):
        ds = np.where(s >= los)[0]
        return int(ds.min()) + 1 if len(ds) else 10

    test = test.assign(d=test["s"].map(assign))
    nt = len(test)
    got = _run(spark, sf_dir, "qs264_calibration_ece").set_index(
        "decile"
    )
    for d, g in test.groupby("d"):
        conf = model.loc[d, "r_train"] / model.loc[d, "n_train"]
        acc = g["y"].mean()
        assert got.loc[d, "n_test"] == len(g)
        assert got.loc[d, "confidence"] == pytest.approx(conf, abs=2e-4)
        assert got.loc[d, "accuracy"] == pytest.approx(acc, abs=2e-4)
        assert got.loc[d, "ece_contrib"] == pytest.approx(
            abs(conf - acc) * len(g) / nt, abs=2e-6
        )


# -- wave 7: F / chi-square families, divergences, GOF -----------------------


def test_intent_qs272_anova_oneway(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {"g": o["o_orderstatus"], "v": _cents(o["o_totalprice"]).astype(float)}
    )
    n = len(df)
    k = df["g"].nunique()
    grand = df["v"].mean()
    ssb = sum(
        len(g) * (g["v"].mean() - grand) ** 2 for _x, g in df.groupby("g")
    )
    ssw = sum(
        float(((g["v"] - g["v"].mean()) ** 2).sum())
        for _x, g in df.groupby("g")
    )
    # the query reports mean squares in DOLLAR^2 (cents^2 / 1e4)
    msb, msw = ssb / (k - 1) / 1e4, ssw / (n - k) / 1e4
    got = _run(spark, sf_dir, "qs272_anova_oneway").iloc[0]
    assert got["k"] == k and got["n"] == n
    assert got["ms_between"] == pytest.approx(msb, rel=1e-6)
    assert got["ms_within"] == pytest.approx(msw, rel=1e-6)
    assert got["f_stat"] == pytest.approx(msb / msw, abs=2e-3)


def test_intent_qs273_cramers_v(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    li = _pd(sf_dir, "lineitem")
    pairs = {
        "orders_priority_status": (o["o_orderpriority"], o["o_orderstatus"]),
        "lineitem_flag_status": (li["l_returnflag"], li["l_linestatus"]),
    }
    got = _run(spark, sf_dir, "qs273_cramers_v").set_index("pair")
    for pair, (x, y) in pairs.items():
        tab = pd.crosstab(x, y).to_numpy().astype(float)
        n = tab.sum()
        exp = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
        chi2 = float(((tab - exp) ** 2 / exp).sum())
        r, c = tab.shape
        v = math.sqrt(chi2 / (n * (min(r, c) - 1)))
        assert got.loc[pair, "n"] == n
        assert got.loc[pair, "dof"] == (r - 1) * (c - 1)
        assert got.loc[pair, "chi2"] == pytest.approx(chi2, abs=2e-4)
        assert got.loc[pair, "cramers_v"] == pytest.approx(v, abs=2e-4)


def test_intent_qs274_js_divergence(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    dists = {}
    for src, g in docs.groupby("source"):
        toks = pd.Series(
            [t for s in g["text"] for t in s.lower().split(" ") if t]
        )
        dists[src] = toks.value_counts(normalize=True)
    got = _run(spark, sf_dir, "qs274_js_divergence").set_index(
        ["s1", "s2"]
    )
    srcs = sorted(dists)
    checked = 0
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            p = dists[srcs[i]]
            q = dists[srcs[j]]
            support = p.index.union(q.index)
            pv = p.reindex(support, fill_value=0.0).to_numpy()
            qv = q.reindex(support, fill_value=0.0).to_numpy()
            m = (pv + qv) / 2
            with np.errstate(divide="ignore", invalid="ignore"):
                jsd = 0.5 * float(
                    np.where(pv > 0, pv * np.log(pv / m), 0.0).sum()
                ) + 0.5 * float(
                    np.where(qv > 0, qv * np.log(qv / m), 0.0).sum()
                )
            assert got.loc[(srcs[i], srcs[j]), "jsd_nats"] == pytest.approx(
                jsd, abs=2e-4
            )
            assert got.loc[(srcs[i], srcs[j]), "jsd_bits"] == pytest.approx(
                jsd / math.log(2), abs=2e-4
            )
            checked += 1
    assert checked == len(got)


def test_intent_qs261_cochran_armitage(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    w = o["o_orderpriority"].str[0].astype(int).to_numpy()
    resp = (o["o_totalprice"] > 250000).to_numpy().astype(int)
    n = len(w)
    r = int(resp.sum())
    swr = float((w * resp).sum())
    swn = float(w.sum())
    swwn = float((w * w).sum())
    num = (n * swr - r * swn) ** 2 * n
    den = r * (n - r) * (n * swwn - swn**2)
    got = _run(spark, sf_dir, "qs261_cochran_armitage").iloc[0]
    assert got["n"] == n and got["responders"] == r
    assert got["ca_chi2"] == pytest.approx(num / den, abs=2e-4)


def test_intent_qs284_poisson_gof(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    kcounts = li.groupby("l_orderkey").size()
    obs = kcounts.value_counts().sort_index()
    n = int(obs.sum())
    lam = float(kcounts.mean())
    disp = float(kcounts.var(ddof=0)) / lam
    chi2 = 0.0
    for k, o_k in obs.items():
        e = n * math.exp(-lam) * lam**k / math.factorial(k)
        chi2 += (o_k - e) ** 2 / e
    got = _run(spark, sf_dir, "qs284_poisson_gof").iloc[0]
    assert got["n_orders"] == n
    assert got["lambda"] == pytest.approx(lam, abs=2e-4)
    assert got["dispersion_index"] == pytest.approx(disp, abs=2e-4)
    assert got["bins"] == len(obs)
    assert got["chi2"] == pytest.approx(chi2, abs=2e-3)


def test_intent_qs277_cmh(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    sad = sbc = sa = se = sv = 0.0
    n_tot = 0
    strata = 0
    for _p, g in o.groupby("o_orderpriority"):
        x = (g["o_custkey"] % 2 == 1).to_numpy()
        y = (g["o_orderstatus"] == "F").to_numpy()
        a = float((x & y).sum())
        b = float((x & ~y).sum())
        c = float((~x & y).sum())
        d = float((~x & ~y).sum())
        n = a + b + c + d
        sad += a * d / n
        sbc += b * c / n
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        n_tot += int(n)
        strata += 1
    or_cmh = sad / sbc
    chi2 = (abs(sa - se) - 0.5) ** 2 / sv  # continuity-corrected
    got = _run(spark, sf_dir, "qs277_cmh_odds").iloc[0]
    assert got["strata"] == strata and got["n"] == n_tot
    assert got["or_cmh"] == pytest.approx(or_cmh, abs=2e-4)
    assert got["chi2_cmh"] == pytest.approx(chi2, abs=2e-4)


def test_intent_qs182_kaplan_meier(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    last = ev.groupby("user_id")["ts"].max().dt.date
    days = last.value_counts().sort_index()
    at_risk = int(days.sum())
    s = 1.0
    got = _run(spark, sf_dir, "qs182_kaplan_meier").set_index("day")
    for day, d in days.items():
        srv = 0.0 if at_risk == d else s * (1 - d / at_risk)
        row = got.loc[day]
        assert row["deaths"] == d and row["at_risk"] == at_risk
        assert row["survival"] == pytest.approx(srv, abs=2e-4)
        s = srv if at_risk != d else 0.0
        at_risk -= d


def test_intent_qs174_benford(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    cents = _cents(o["o_totalprice"])
    first = np.array([int(str(c)[0]) for c in cents])
    n = len(first)
    got = _run(spark, sf_dir, "qs174_benford_audit").set_index("digit")
    for d in range(1, 10):
        obs = int((first == d).sum())
        exp = n * math.log10(1 + 1 / d)
        assert got.loc[d, "obs"] == obs
        assert got.loc[d, "exp_4dp"] == pytest.approx(exp, abs=2e-4)
        assert got.loc[d, "chi2_term_e4"] == pytest.approx(
            (obs - exp) ** 2 / exp * 10000, abs=0.51
        )


def test_intent_qs166_mutual_information(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    x = ev["event_type"].to_numpy()
    y = np.clip(
        np.floor(ev["value"].to_numpy() / 32.0).astype(int), 0, 15
    )
    n = len(x)
    mi = 0.0
    for xv in np.unique(x):
        for yv in np.unique(y):
            pxy = float(((x == xv) & (y == yv)).sum()) / n
            if pxy == 0:
                continue
            px = float((x == xv).sum()) / n
            py = float((y == yv).sum()) / n
            mi += pxy * math.log2(pxy / (px * py))
    got = _run(spark, sf_dir, "qs166_mutual_information").iloc[0]
    assert got["n"] == n
    assert got["mi_bits"] == pytest.approx(mi, abs=2e-4)


def test_intent_qs215_ndcg(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    tokens = {
        r["doc_id"]: set(t for t in r["text"].lower().split(" ") if t)
        for _i, r in docs.iterrows()
    }
    src = dict(zip(docs["doc_id"], docs["source"]))
    weights = [round(1e6 / math.log2(rk + 1)) for rk in range(1, 11)]
    got = _run(spark, sf_dir, "qs215_ndcg_retrieval_eval").set_index(
        "qid"
    )
    for qid in docs.loc[docs["doc_id"] % 50 == 0, "doc_id"]:
        qt = tokens[qid]
        cands = [
            (len(qt & tokens[cid]), cid)
            for cid in tokens
            if cid != qid and len(qt & tokens[cid]) > 0
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        dcg = sum(
            weights[rk]
            for rk, (_ov, cid) in enumerate(cands[:10])
            if src[cid] == src[qid]
        )
        n_rel = sum(
            1 for d2, s2 in src.items() if s2 == src[qid] and d2 != qid
        )
        idcg = sum(weights[: min(10, n_rel)])
        row = got.loc[qid]
        assert row["dcg_e6"] == dcg
        assert row["idcg_e6"] == idcg
        # e6 floor ratio of the two quantized sums
        assert row["ndcg_e6"] == dcg * 1_000_000 // idcg


# -- sweep-completeness gate --------------------------------------------------


def test_sweep_classification_is_complete():
    """Every registry query must carry an intent-audit class in
    tests/golden/intent_audit_classes.txt (the r10 task-2 sweep made
    permanent): new queries fail on arrival until classified, stale
    lines fail when queries are renamed/removed, and INTENT-TESTED
    claims are verified against this file's own test bodies."""
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    golden = os.path.join(here, "golden", "intent_audit_classes.txt")
    classes = {}
    pointers = {}
    for line in open(golden):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        parts = line.split("|")
        name, cls = parts[0], parts[1]
        classes[name] = cls
        if len(parts) > 2:
            pointers[name] = [p for p in parts[2].split(",") if p]

    allowed = {
        "INTENT-TESTED",
        "ANSI-STRUCTURAL",
        "TWO-ENGINE-BUILTIN",
        "EXACT-DEFINITIONAL",
        "COVERED-ELSEWHERE",
        "NAMED-STAT-REMAINING",
    }
    bad = {n: c for n, c in classes.items() if c not in allowed}
    assert not bad, f"unknown class(es): {bad}"

    registry = set(QUERIES)
    missing = sorted(registry - set(classes))
    assert not missing, (
        "unclassified registry quer"
        f"{'y' if len(missing) == 1 else 'ies'} — add to {golden}:\n"
        + "\n".join(missing)
    )
    stale = sorted(set(classes) - registry)
    assert not stale, f"stale classification line(s): {stale}"

    src = open(os.path.abspath(__file__)).read()
    mentioned = set(re.findall(r'"(qs\d+[a-z0-9_]*)"', src))
    unbacked = sorted(
        n
        for n, c in classes.items()
        if c == "INTENT-TESTED" and n not in mentioned
    )
    assert not unbacked, (
        f"classified INTENT-TESTED but not exercised here: {unbacked}"
    )

    # r14 (VERDICT r13 task 6): COVERED-ELSEWHERE delegates
    # verification to a named test elsewhere — the pointer is now part
    # of the golden line (name|COVERED-ELSEWHERE|file::test[,...]) and
    # resolved here, so a renamed or deleted target FAILS instead of
    # silently orphaning the claim.
    unpointed = sorted(
        n
        for n, c in classes.items()
        if c == "COVERED-ELSEWHERE" and not pointers.get(n)
    )
    assert not unpointed, (
        f"COVERED-ELSEWHERE without a test pointer: {unpointed}"
    )
    stray = sorted(n for n in pointers if classes[n] != "COVERED-ELSEWHERE")
    assert not stray, f"pointer field on a non-COVERED line: {stray}"
    repo = os.path.dirname(here)
    for n, ptrs in sorted(pointers.items()):
        for ptr in ptrs:
            fpath, _, tname = ptr.partition("::")
            assert tname, f"{n}: malformed pointer {ptr!r}"
            full = os.path.join(repo, fpath)
            assert os.path.exists(full), f"{n}: pointer file gone: {ptr}"
            body = open(full).read()
            assert re.search(rf"^def {re.escape(tname)}\(", body, re.M), (
                f"{n}: pointer target test gone: {ptr}"
            )


# -- wave 9: clearing the NAMED-STAT-REMAINING list --------------------------


def test_intent_qs168_ab_ztest(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    u = (
        pd.DataFrame(
            {
                "cohort": ev["user_id"] % 2,
                "conv": (ev["value"] >= 150).astype(int),
                "u": ev["user_id"],
            }
        )
        .groupby("u")
        .agg(cohort=("cohort", "first"), conv=("conv", "max"))
    )
    n1 = int((u["cohort"] == 0).sum())
    x1 = int(u.loc[u["cohort"] == 0, "conv"].sum())
    n2 = int((u["cohort"] == 1).sum())
    x2 = int(u.loc[u["cohort"] == 1, "conv"].sum())
    got = _run(spark, sf_dir, "qs168_ab_proportion_ztest").iloc[0]
    assert (got["n1"], got["x1"], got["n2"], got["x2"]) == (
        n1, x1, n2, x2,
    )
    if x1 + x2 in (0, n1 + n2):
        # pooled p is 0 or 1 -> z undefined; documented NULL branch
        # (every sf0.001 user converts)
        assert pd.isna(got["z"])
        return
    p = (x1 + x2) / (n1 + n2)
    z = (x1 / n1 - x2 / n2) / math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs202_ols_trend(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_partkey"] % 100,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        .reset_index(name="y")
    )
    got = _run(spark, sf_dir, "qs202_group_ols_trend").set_index("grp")
    for grp, g in m.groupby("grp"):
        slope, intercept = np.polyfit(
            g["t"].to_numpy(float), g["y"].to_numpy(float), 1
        )
        assert got.loc[grp, "n_months"] == len(g)
        assert got.loc[grp, "slope"] == pytest.approx(slope, abs=2e-4)
        assert got.loc[grp, "intercept"] == pytest.approx(
            intercept, rel=1e-6, abs=2e-4
        )


def test_intent_qs204_autocorrelation(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_suppkey"] % 10,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        // 10000
    ).reset_index(name="y")
    got = _run(spark, sf_dir, "qs204_autocorrelation").set_index("grp")
    for grp, g in m.groupby("grp"):
        y = g.sort_values("t")["y"].to_numpy(float)
        mu = y.mean()
        den = float(((y - mu) ** 2).sum())
        for k, col in ((1, "acf1"), (2, "acf2")):
            num = float(((y[:-k] - mu) * (y[k:] - mu)).sum())
            assert got.loc[grp, col] == pytest.approx(
                num / den, abs=2e-4
            )
        assert got.loc[grp, "n_months"] == len(y)


def test_intent_qs241_chi_square(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    tab = pd.crosstab(ev["event_type"], ev["user_id"] % 4).to_numpy(
        float
    )
    n = tab.sum()
    exp = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    chi2 = float(((tab - exp) ** 2 / exp).sum())
    r, c = tab.shape
    v = math.sqrt(chi2 / (n * (min(r, c) - 1)))
    got = _run(spark, sf_dir, "qs241_chi_square_independence").iloc[0]
    assert got["n"] == n
    assert got["dof"] == (r - 1) * (c - 1)
    assert got["chi2"] == pytest.approx(chi2, abs=2e-4)
    assert got["cramers_v"] == pytest.approx(v, abs=2e-4)


def test_intent_qs246_nelson_aalen(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    days = (
        ev.groupby("user_id")["ts"].max().dt.date.value_counts()
        .sort_index()
    )
    at_risk = int(days.sum())
    h = 0.0
    got = _run(spark, sf_dir, "qs246_nelson_aalen").set_index("day")
    for day, d in days.items():
        h += d / at_risk
        row = got.loc[day]
        assert row["deaths"] == d and row["at_risk"] == at_risk
        assert row["cum_hazard"] == pytest.approx(h, abs=2e-4)
        at_risk -= d


def test_intent_qs217_laspeyres(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    g = (
        pd.DataFrame(
            {
                "grp": li["l_partkey"] % 100,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
                "q": li["l_quantity"].astype(np.int64),
            }
        )
        .groupby(["grp", "t"])
        .agg(c=("c", "sum"), q=("q", "sum"))
        .reset_index()
    )
    g = g[g["q"] > 0]
    g["p_e2"] = (g["c"] * 100) // g["q"]
    base = (
        g[(g["t"] >= 13) & (g["t"] <= 24)]
        .groupby("grp")
        .agg(c=("c", "sum"), q0=("q", "sum"))
    )
    base["p0_e2"] = (base["c"] * 100) // base["q0"]
    j = g.merge(base[["p0_e2", "q0"]], on="grp")
    got = _run(spark, sf_dir, "qs217_laspeyres_index").set_index("t")
    for t, grp in j.groupby("t"):
        num = int((grp["p_e2"] * grp["q0"]).sum())
        den = int((grp["p0_e2"] * grp["q0"]).sum())
        if den <= 0:
            continue
        assert got.loc[t, "index_e6"] == num * 1_000_000 // den


def test_intent_qs208_quantile_normalization(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_suppkey"] % 10,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        .reset_index(name="y")
    )
    # global reference distribution sorted by (y, grp, t); each row
    # maps its in-group rank onto the global order by linear index
    glob = m.sort_values(["y", "grp", "t"]).reset_index(drop=True)
    big_n = len(glob)
    got = _run(spark, sf_dir, "qs208_quantile_normalization").set_index(
        ["grp", "t"]
    )
    for grp, g in m.groupby("grp"):
        g = g.sort_values(["y", "t"]).reset_index(drop=True)
        n = len(g)
        for rk0, row in g.iterrows():
            gi = rk0 * (big_n - 1) // (n - 1)
            want = int(glob.loc[gi, "y"])
            assert got.loc[(grp, row["t"]), "qnorm"] == want


def test_intent_qs212_readability(spark, sf_dir):
    import re as _re

    docs = _pd(sf_dir, "documents")
    docs = docs[(docs["doc_id"] % 10 == 0) & (docs["text"] != "")]
    got = _run(spark, sf_dir, "qs212_readability").set_index("doc_id")
    for _i, r in docs.iterrows():
        text = r["text"]
        words = text.lower().count(" ") + 1
        sentences = max(text.count("."), 1)
        # vowel-group syllable proxy: maximal [aeiouy]+ runs
        vgroups = max(len(_re.findall(r"[aeiouy]+", text.lower())), 1)
        wps_e4 = words * 10000 // sentences
        spw_e4 = vgroups * 10000 // words
        flesch_e3 = (
            206835 - 1015 * wps_e4 // 10000 - 84600 * spw_e4 // 10000
        )
        row = got.loc[r["doc_id"]]
        assert row["words"] == words
        assert row["sentences"] == sentences
        assert row["vgroups"] == vgroups
        # Flesch 206.835 - 1.015 wps - 84.6 spw, e3-quantized
        assert row["flesch_e3"] == flesch_e3


def test_intent_qs214_assortativity(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    key = list(zip(docs["lang"], docs["n_chars"]))
    groups = {}
    for d, k in zip(docs["doc_id"], key):
        groups.setdefault(k, []).append(d)
    xs, ys = [], []
    deg = {}
    edges = []
    for mem in groups.values():
        for i in range(len(mem)):
            for j in range(len(mem)):
                if i != j:
                    edges.append((mem[i], mem[j]))
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    for a, b in edges:
        xs.append(deg[a])
        ys.append(deg[b])
    r = np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1]
    got = _run(spark, sf_dir, "qs214_degree_assortativity").iloc[0]
    assert got["n_edge_ends"] == len(edges)
    assert got["assortativity"] == pytest.approx(r, abs=2e-4)


def test_intent_qs221_mase(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_suppkey"] % 10,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        // 10000
    ).reset_index(name="y")
    got = _run(spark, sf_dir, "qs221_mase_forecast_eval").set_index(
        "grp"
    )
    for grp, g in m.groupby("grp"):
        y = g.sort_values("t")["y"].to_numpy()
        es = np.abs(y[12:] - y[:-12])  # seasonal-naive errors
        e1 = np.abs(y[1:] - y[:-1])  # naive-1 errors
        if len(es) == 0 or e1.sum() == 0:
            continue
        # MASE = MAE_snaive / MAE_naive1, e6 floor on the int ratio
        mase_e6 = int(es.sum()) * len(e1) * 1_000_000 // (
            int(e1.sum()) * len(es)
        )
        assert got.loc[grp, "n_eval"] == len(es)
        assert got.loc[grp, "mase_e6"] == mase_e6


def test_intent_qs224_log_odds(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    rows = []
    for _i, r in docs.iterrows():
        for t in r["text"].lower().split(" "):
            if t:
                rows.append((r["source"], t))
    tc = pd.DataFrame(rows, columns=["source", "term"]).groupby(
        ["source", "term"]
    ).size()
    src_n = tc.groupby("source").sum()
    tot = tc.groupby("term").sum()
    n_all = int(tc.sum())
    v = tc.index.get_level_values("term").nunique()
    got = _run(spark, sf_dir, "qs224_log_odds_keywords")
    for (source, g) in got.groupby("source"):
        # monroe-style smoothed log-odds, top-5 by (delta_r desc, term)
        deltas = {}
        for term, y in tc.loc[source].items():
            yw = int(tot[term])
            d = math.log(
                (y + 1.0) / (src_n[source] + v - y - 1.0)
            ) - math.log((yw + 1.0) / (n_all + v - yw - 1.0))
            deltas[term] = round(d, 6)
        top = sorted(deltas.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want = {
            (term, rk + 1): dr for rk, (term, dr) in enumerate(top)
        }
        for _j, row in g.iterrows():
            assert (row["term"], row["rk"]) in want
            assert row["log_odds"] == pytest.approx(
                want[(row["term"], row["rk"])], abs=2e-6
            )


def test_intent_qs228_simpson(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_returnflag"],
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        // 10000
    ).reset_index(name="y")

    def slope_sign(g):
        t = g["t"].to_numpy(float)
        y = g["y"].to_numpy(float)
        return int(np.sign(len(t) * (t * y).sum() - t.sum() * y.sum()))

    overall = slope_sign(m)
    got = _run(spark, sf_dir, "qs228_simpson_detector").set_index("grp")
    for grp, g in m.groupby("grp"):
        s = slope_sign(g)
        assert got.loc[grp, "group_trend_sign"] == s
        assert got.loc[grp, "overall_trend_sign"] == overall
        assert got.loc[grp, "reverses"] == int(s != overall)


def test_intent_qs231_modularity(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    comm = {
        d: f"{la}|{nc % 7}"
        for d, la, nc in zip(
            docs["doc_id"], docs["lang"], docs["n_chars"]
        )
    }
    groups = {}
    for d, la, nc in zip(docs["doc_id"], docs["lang"], docs["n_chars"]):
        groups.setdefault((la, nc), []).append(d)
    edges = []
    for mem in groups.values():
        for i in range(len(mem)):
            for j in range(len(mem)):
                if i != j:
                    edges.append((mem[i], mem[j]))
    mm = len(edges)  # edge ends (2m)
    e_in = sum(1 for a, b in edges if comm[a] == comm[b])
    deg = {}
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    dsum = {}
    for node, d in deg.items():
        dsum[comm[node]] = dsum.get(comm[node], 0) + d
    sum_d2 = sum(v * v for v in dsum.values())
    # Newman modularity Q = e_in/2m - sum_c (d_c/2m)^2, e6 floor
    q_e6 = (e_in * mm - sum_d2) * 1_000_000 // (mm * mm)
    got = _run(spark, sf_dir, "qs231_modularity").iloc[0]
    assert got["edge_ends"] == mm
    assert got["within_ends"] == e_in
    assert got["modularity_e6"] == q_e6


def test_intent_qs232_xmr(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    o = o[
        (o["o_orderdate"] >= "1997-01-01")
        & (o["o_orderdate"] < "1997-07-01")
    ]
    daily = (
        pd.DataFrame(
            {"day": o["o_orderdate"].dt.date, "c": _cents(o["o_totalprice"])}
        )
        .groupby("day")["c"]
        .sum()
        .sort_index()
        // 10000
    )
    y = daily.to_numpy()
    n = len(y)
    sy = int(y.sum())
    mrs = np.abs(np.diff(y))
    smr, nmr = int(mrs.sum()), len(mrs)
    center = sy / n
    sigma = 2.66 * smr / nmr
    got = _run(spark, sf_dir, "qs232_xmr_control_chart").set_index(
        "day"
    )
    for day, yv in daily.items():
        row = got.loc[day]
        assert row["y"] == yv
        assert row["center"] == pytest.approx(center, abs=2e-4)
        assert row["ucl"] == pytest.approx(center + sigma, abs=2e-4)
        assert row["lcl"] == pytest.approx(center - sigma, abs=2e-4)
        # the exact-integer OOC rule both engines implement
        lim = 266 * n * smr // 100
        ooc = int(
            yv * n * nmr > sy * nmr + lim or yv * n * nmr < sy * nmr - lim
        )
        assert row["out_of_control"] == ooc


def test_intent_qs251_elasticity(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    part = _pd(sf_dir, "part")
    pp = (
        pd.DataFrame(
            {
                "pk": li["l_partkey"],
                "q": li["l_quantity"].astype(np.int64),
                "r": _cents(li["l_extendedprice"]),
            }
        )
        .groupby("pk")
        .agg(q=("q", "sum"), r=("r", "sum"))
        .reset_index()
    )
    j = pp.merge(part, left_on="pk", right_on="p_partkey")
    got = _run(spark, sf_dir, "qs251_price_elasticity").set_index(
        "brand"
    )
    for brand, g in j.groupby("p_brand"):
        x = np.log(g["r"].to_numpy(float) / g["q"].to_numpy(float) / 100)
        y = np.log(g["q"].to_numpy(float))
        slope = np.polyfit(x, y, 1)[0]
        assert got.loc[brand, "n_parts"] == len(g)
        assert got.loc[brand, "elasticity"] == pytest.approx(
            slope, abs=2e-4
        )


def test_intent_qs259_stump(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    bkt = _cents(o["o_totalprice"]) // 2_500_000
    yv = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    h = (
        pd.DataFrame({"bkt": bkt, "y": yv})
        .groupby("bkt")
        .agg(n=("y", "size"), pos=("y", "sum"))
        .sort_index()
    )
    tn, tp = int(h["n"].sum()), int(h["pos"].sum())
    best = None
    ln = lp = 0
    for b, row in h.iterrows():
        ln += int(row["n"])
        lp += int(row["pos"])
        rn, rp = tn - ln, tp - lp
        if ln == 0 or rn == 0:
            continue
        # weighted Gini split cost: n_side * Gini_side summed
        cost = (ln - (lp**2 + (ln - lp) ** 2) / ln) + (
            rn - (rp**2 + (rn - rp) ** 2) / rn
        )
        if best is None or cost < best[0] - 1e-12:
            best = (cost, b, ln, lp, rn, rp)
    cost, b, ln, lp, rn, rp = best
    got = _run(spark, sf_dir, "qs259_decision_stump").iloc[0]
    assert got["threshold_cents"] == (b + 1) * 2_500_000
    assert (got["n_left"], got["pos_left"]) == (ln, lp)
    assert (got["n_right"], got["pos_right"]) == (rn, rp)
    assert got["weighted_gini"] == pytest.approx(cost, abs=2e-4)


def test_intent_qs169_changepoint(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    daily = (
        pd.DataFrame(
            {
                "et": ev["event_type"],
                "day": ev["ts"].dt.date,
                "c": _cents(ev["value"]),
            }
        )
        .groupby(["et", "day"])["c"]
        .sum()
        .reset_index()
    )
    got = _run(spark, sf_dir, "qs169_changepoint_meanshift").set_index(
        "event_type"
    )
    for et, g in daily.groupby("et"):
        g = g.sort_values("day").reset_index(drop=True)
        x = g["c"].to_numpy(float)
        m = len(x)
        best = None
        for k in range(1, m):  # cut after position k (1-based)
            shift = round(
                abs(x[:k].mean() - x[k:].mean()) / 100, 4
            )
            cand = (-shift, g.loc[k - 1, "day"])
            if best is None or cand < best:
                best = cand
        assert got.loc[et, "n_days"] == m
        assert got.loc[et, "change_day"] == best[1]
        assert got.loc[et, "mean_shift"] == pytest.approx(
            -best[0], abs=2e-4
        )


def test_intent_qs209_seasonal_decompose(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": li["l_suppkey"] % 5,
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        // 10000
    ).reset_index(name="y")
    got = _run(spark, sf_dir, "qs209_seasonal_decompose").set_index(
        ["grp", "t"]
    )
    for grp, g in m.groupby("grp"):
        g = g.sort_values("t").reset_index(drop=True)
        y = g["y"].to_numpy()
        n = len(y)
        rows = []
        for i in range(6, n - 6):
            # classical centered 2x12 moving average, kept x24 integer
            trend24 = int(2 * y[i - 6 : i + 7].sum() - y[i - 6] - y[i + 6])
            det24 = 24 * int(y[i]) - trend24
            moy = (int(g.loc[i, "t"]) - 1) % 12
            rows.append((int(g.loc[i, "t"]), int(y[i]), trend24, det24, moy))
        smeans = {}
        for _t, _yv, _tr, det24, moy in rows:
            smeans.setdefault(moy, []).append(det24)
        for t, yv, trend24, det24, moy in rows:
            sbar = sum(smeans[moy]) / len(smeans[moy])
            row = got.loc[(grp, t)]
            assert row["y"] == yv and row["trend_x24"] == trend24
            assert row["seasonal"] == pytest.approx(
                sbar / 24, abs=2e-4
            )
            assert row["resid"] == pytest.approx(
                (det24 - sbar) / 24, abs=2e-4
            )


def test_intent_qs275_cuped(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    u = (
        pd.DataFrame(
            {
                "u": ev["user_id"],
                "arm": ev["user_id"] % 2,
                "p": np.where(
                    ev["ts"].dt.day <= 15, _cents(ev["value"]), 0
                ),
                "q": np.where(
                    ev["ts"].dt.day > 15, _cents(ev["value"]), 0
                ),
            }
        )
        .groupby("u")
        .agg(arm=("arm", "first"), p=("p", "sum"), q=("q", "sum"))
    )
    p = u["p"].to_numpy(float)
    q = u["q"].to_numpy(float)
    # CUPED: theta = cov(p,q)/var(p) (population), adjust each arm's
    # outcome mean by theta*(parm_mean - pooled p mean)
    theta = float(np.cov(p, q, bias=True)[0, 1]) / float(p.var())
    rho2 = float(np.corrcoef(p, q)[0, 1]) ** 2
    a0 = u["arm"] == 0
    lift_raw = (q[~a0].mean() - q[a0].mean()) / 100
    pbar = p.mean()
    adj1 = q[~a0].mean() - theta * (p[~a0].mean() - pbar)
    adj0 = q[a0].mean() - theta * (p[a0].mean() - pbar)
    got = _run(spark, sf_dir, "qs275_cuped_lift").iloc[0]
    assert got["n0"] == int(a0.sum()) and got["n1"] == int((~a0).sum())
    assert got["lift_raw"] == pytest.approx(lift_raw, abs=2e-4)
    assert got["lift_cuped"] == pytest.approx(
        (adj1 - adj0) / 100, abs=2e-4
    )
    assert got["theta"] == pytest.approx(theta, abs=2e-6)
    assert got["var_reduction_pct"] == pytest.approx(
        100 * rho2, abs=2e-2
    )


def _as_erfc_p_two(z):
    # the documented two-sided normal p: Abramowitz–Stegun 7.1.26
    # erfc approximation evaluated at |z|/sqrt(2)
    x = abs(z) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return poly * math.exp(-x * x)


def test_intent_qs276_bh_fdr(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    ua = ev[["user_id", "event_type"]].drop_duplicates()
    ua["arm"] = ua["user_id"] % 2
    users = ua[["user_id", "arm"]].drop_duplicates()
    n0 = int((users["arm"] == 0).sum())
    n1 = int((users["arm"] == 1).sum())
    ps = []
    for et, g in ua.groupby("event_type"):
        x0 = int((g["arm"] == 0).sum())
        x1 = int((g["arm"] == 1).sum())
        if x0 + x1 in (0, n0 + n1):
            z = 0.0
        else:
            pp = (x0 + x1) / (n0 + n1)
            z = (x1 / n1 - x0 / n0) / math.sqrt(
                pp * (1 - pp) * (1 / n0 + 1 / n1)
            )
        ps.append((et, x0 / n0, x1 / n1, z, _as_erfc_p_two(z)))
    ps.sort(key=lambda r: (r[4], r[0]))
    mvals = len(ps)
    kmax = max(
        (i + 1 for i in range(mvals) if ps[i][4] <= 0.05 * (i + 1) / mvals),
        default=0,
    )
    got = _run(spark, sf_dir, "qs276_bh_fdr").set_index("event_type")
    for i, (et, p0, p1, z, ptwo) in enumerate(ps):
        row = got.loc[et]
        assert row["conv0"] == pytest.approx(p0, abs=2e-4)
        assert row["conv1"] == pytest.approx(p1, abs=2e-4)
        assert row["z"] == pytest.approx(z, abs=2e-4)
        assert row["p_two"] == pytest.approx(ptwo, abs=2e-6)
        assert row["bh_rank"] == i + 1
        assert row["significant"] == int(i + 1 <= kmax)


def test_intent_qs279_granger(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    daily = (
        pd.DataFrame(
            {
                "day": ev["ts"].dt.date,
                "xc": (ev["event_type"] == "click").astype(int),
                "yc": (ev["event_type"] == "purchase").astype(int),
            }
        )
        .groupby("day")
        .sum()
        .sort_index()
    )
    y = daily["yc"].to_numpy(float)[1:]
    y1 = daily["yc"].to_numpy(float)[:-1]
    x1 = daily["xc"].to_numpy(float)[:-1]
    n = len(y)
    # restricted: y ~ y1; full: y ~ y1 + x1 (both with intercept)
    X_r = np.column_stack([np.ones(n), y1])
    X_f = np.column_stack([np.ones(n), y1, x1])
    b_r, *_ = np.linalg.lstsq(X_r, y, rcond=None)
    b_f, *_ = np.linalg.lstsq(X_f, y, rcond=None)
    rss_r = float(((y - X_r @ b_r) ** 2).sum())
    rss_f = float(((y - X_f @ b_f) ** 2).sum())
    f = (rss_r - rss_f) / (rss_f / (n - 3))
    got = _run(spark, sf_dir, "qs279_granger_lag").iloc[0]
    assert got["n_days"] == n
    assert got["b_lag_y"] == pytest.approx(b_f[1], abs=2e-6)
    assert got["b_lag_x"] == pytest.approx(b_f[2], abs=2e-6)
    assert got["f_stat"] == pytest.approx(f, abs=2e-4)
    assert got["rss_reduction_pct"] == pytest.approx(
        100 * (rss_r - rss_f) / rss_r, abs=2e-2
    )


def test_intent_qs280_matching_att(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    o = _pd(sf_dir, "orders")
    spend = (
        pd.DataFrame(
            {"ck": o["o_custkey"], "c": _cents(o["o_totalprice"])}
        )
        .groupby("ck")["c"]
        .sum()
    )
    bal = np.where(
        c["c_acctbal"] < 0, 0, np.where(c["c_acctbal"] < 5000, 1, 2)
    )
    df = pd.DataFrame(
        {
            "nk": c["c_nationkey"],
            "bal": bal,
            "treated": (c["c_mktsegment"] == "AUTOMOBILE").astype(int),
            "y": c["c_custkey"].map(spend).fillna(0).astype(np.int64),
        }
    )
    att_num = 0.0
    nt_matched = n_cells = 0
    for _k, g in df.groupby(["nk", "bal"]):
        t = g[g["treated"] == 1]
        ctl = g[g["treated"] == 0]
        if len(t) and len(ctl):
            n_cells += 1
            nt_matched += len(t)
            att_num += float(t["y"].sum()) - len(t) * ctl["y"].mean()
    naive = (
        df.loc[df["treated"] == 1, "y"].mean()
        - df.loc[df["treated"] == 0, "y"].mean()
    )
    got = _run(spark, sf_dir, "qs280_matching_att").iloc[0]
    assert got["n_cells"] == n_cells
    assert got["n_treated_matched"] == nt_matched
    assert got["att"] == pytest.approx(
        att_num / nt_matched / 100, abs=2e-2
    )
    assert got["naive_diff"] == pytest.approx(naive / 100, abs=2e-2)


def test_intent_qs288_dunn(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    df = pd.DataFrame(
        {"g": o["o_orderpriority"], "v": _cents(o["o_totalprice"])}
    )
    r = df["v"].rank(method="average")
    n = len(df)
    _vals, counts = np.unique(df["v"].to_numpy(), return_counts=True)
    ties = float(np.sum(counts.astype(float) ** 3 - counts))
    got = _run(spark, sf_dir, "qs288_dunn_posthoc").set_index(
        ["g1", "g2"]
    )
    groups = {g: r.loc[idx] for g, idx in df.groupby("g").groups.items()}
    names = sorted(groups)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = groups[names[i]], groups[names[j]]
            dmean = float(a.mean() - b.mean())
            z = dmean / math.sqrt(
                (n * (n + 1) / 12 - ties / (12 * (n - 1)))
                * (1 / len(a) + 1 / len(b))
            )
            row = got.loc[(names[i], names[j])]
            zcol = [c for c in got.columns if c.startswith("z")][0]
            assert row[zcol] == pytest.approx(z, abs=2e-4)


def test_intent_qs292_mde(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    u = (
        pd.DataFrame(
            {
                "et": ev["event_type"],
                "u": ev["user_id"],
                "c": _cents(ev["value"]),
            }
        )
        .groupby(["et", "u"])["c"]
        .sum()
        .reset_index()
    )
    got = _run(spark, sf_dir, "qs292_mde_power").set_index("event_type")
    for et, g in u.groupby("et"):
        x = g["c"].to_numpy(float)
        n = len(x)
        mu, sd = x.mean(), x.std(ddof=1)
        # (z_{0.975} + z_{0.8}) = 1.959964 + 0.841621 = 2.801585;
        # equal split n/2 per arm
        mde = 2.801585 * sd * math.sqrt(2 / (n / 2))
        row = got.loc[et]
        assert row["n_users"] == n
        assert row["mean_dollars"] == pytest.approx(mu / 100, abs=2e-2)
        assert row["sd_dollars"] == pytest.approx(sd / 100, abs=2e-2)
        assert row["mde_dollars"] == pytest.approx(mde / 100, abs=2e-2)
        assert row["mde_pct"] == pytest.approx(
            100 * mde / mu, abs=2e-2
        )


def test_intent_qs297_negbinomial(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    k = ev.groupby("user_id").size().to_numpy(float)
    n = len(k)
    mu = k.mean()
    var = k.var(ddof=1)
    got = _run(spark, sf_dir, "qs297_negbinomial_fit").iloc[0]
    assert got["n_users"] == n
    assert got["mean_events"] == pytest.approx(mu, abs=2e-4)
    assert got["var_events"] == pytest.approx(var, abs=2e-4)
    assert got["dispersion_index"] == pytest.approx(var / mu, abs=2e-4)
    # method-of-moments NB: r = mu^2/(var-mu), p = mu/var
    if var > mu:
        assert got["nb_r"] == pytest.approx(
            mu * mu / (var - mu), abs=2e-4
        )
        assert got["nb_p"] == pytest.approx(mu / var, abs=2e-4)


def test_intent_qs159_psi(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    df = pd.DataFrame(
        {
            "et": ev["event_type"],
            "period": np.where(ev["ts"].dt.day <= 15, 1, 2),
            "bin": np.clip(
                np.floor(ev["value"].to_numpy() / 32.0).astype(int),
                0,
                15,
            ),
        }
    )
    got = _run(spark, sf_dir, "qs159_psi_drift").set_index("event_type")
    for et, g in df.groupby("et"):
        c1 = np.array(
            [((g["period"] == 1) & (g["bin"] == b)).sum() for b in range(16)],
            dtype=float,
        )
        c2 = np.array(
            [((g["period"] == 2) & (g["bin"] == b)).sum() for b in range(16)],
            dtype=float,
        )
        t1, t2 = c1.sum(), c2.sum()
        # add-1 smoothed bin shares over the full 16-bin grid
        p1 = (c1 + 1) / (t1 + 16)
        p2 = (c2 + 1) / (t2 + 16)
        psi = float(((p1 - p2) * np.log(p1 / p2)).sum())
        assert got.loc[et, "n_before"] == int(t1)
        assert got.loc[et, "n_after"] == int(t2)
        assert got.loc[et, "psi"] == pytest.approx(psi, abs=2e-4)


def test_intent_qs173_ewma(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    daily = (
        pd.DataFrame(
            {
                "et": ev["event_type"],
                "day": ev["ts"].dt.date,
                "c": _cents(ev["value"]),
            }
        )
        .groupby(["et", "day"])["c"]
        .sum()
        .reset_index()
    )
    got = _run(spark, sf_dir, "qs173_ewma_smoothing").set_index(
        ["event_type", "day"]
    )
    for et, g in daily.groupby("et"):
        g = g.sort_values("day").reset_index(drop=True)
        x = g["c"].to_numpy(float)
        for i in range(len(x)):
            lo = max(0, i - 9)
            win = x[lo : i + 1][::-1]  # k = 0 (today) .. 9
            w = 0.3 * 0.7 ** np.arange(len(win))  # truncated EWMA
            val = float((win * w).sum() / w.sum()) / 100
            assert got.loc[(et, g.loc[i, "day"]), "ewma"] == pytest.approx(
                val, abs=2e-4
            )


# -- honesty pass over weak COVERED-ELSEWHERE claims --------------------------


def test_intent_qs179_bootstrap_ci(spark, sf_dir):
    import hashlib

    o = _pd(sf_dir, "orders")
    k = o["o_orderkey"].to_numpy()
    c = _cents(o["o_totalprice"])
    # cumulative Poisson(1) thresholds scaled to 2^32 (the documented
    # hash-uniform -> Poisson weight scheme); md5 recomputed with
    # hashlib, independently of both engines' md5
    import math as _m

    cum, acc = [], 0.0
    for j in range(9):
        acc += _m.exp(-1) / _m.factorial(j)
        cum.append(acc)
    thresholds = [int(round(p * 2**32)) for p in cum[:-1]]
    means = []
    for r in range(32):
        num = den = 0
        for ki, ci in zip(k, c):
            u = int(
                hashlib.md5(f"{ki}:{r}".encode()).hexdigest()[:8], 16
            )
            w = 0
            while w < 8 and u >= thresholds[w]:
                w += 1
            num += w * int(ci)
            den += w
        means.append(round(num / (den * 100.0), 4))
    means.sort()
    got = _run(spark, sf_dir, "qs179_bootstrap_ci").iloc[0]
    assert got["n_resamples"] == 32
    assert got["mean_full"] == pytest.approx(
        c.sum() / (len(c) * 100), abs=2e-4
    )
    # CI = 2nd / 31st order statistics of the resample means
    assert got["ci_lo"] == pytest.approx(means[1], abs=2e-4)
    assert got["ci_hi"] == pytest.approx(means[30], abs=2e-4)


def test_intent_qs163_prefix_filter_simjoin(spark, sf_dir):
    # r14 promotion from COVERED-ELSEWHERE (no dedicated test existed
    # — the orphan class the pointer gate now forbids). The prefix
    # filter's completeness THEOREM is the intent: the output must
    # equal the brute-force all-pairs Jaccard >= 0.9 set exactly.
    d = _pd(sf_dir, "documents")
    sets = {
        r.doc_id: {t for t in r.text.lower().split(" ") if t}
        for r in d.itertuples()
    }
    ids = sorted(sets)
    want = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            inter = len(sets[d1] & sets[d2])
            uni = len(sets[d1] | sets[d2])
            if 10 * inter >= 9 * uni:
                want[(d1, d2)] = 1_000_000 * inter // uni
    got = _run(spark, sf_dir, "qs163_prefix_filter_simjoin")
    assert {(r.d1, r.d2): r.jac_e6 for r in got.itertuples()} == want


def test_intent_qs178_sparse_cosine_neighbors(spark, sf_dir):
    # Textbook sparse cosine argmax over term-count vectors with the
    # documented df>50 head-term exclusion; round-before-rank with
    # neighbor-id tie-break, 0.2 floor.
    from collections import Counter

    d = _pd(sf_dir, "documents")
    cnt = {
        r.doc_id: Counter(t for t in r.text.lower().split(" ") if t)
        for r in d.itertuples()
    }
    df = Counter()
    for c in cnt.values():
        df.update(c.keys())
    kept = {
        did: {t: c for t, c in cd.items() if df[t] <= 50}
        for did, cd in cnt.items()
    }
    n2 = {did: sum(v * v for v in cd.values()) for did, cd in kept.items()}
    ids = sorted(kept)
    sims: dict[int, list] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = kept[a].keys() & kept[b].keys()
            if not shared:
                continue
            dot = sum(kept[a][t] * kept[b][t] for t in shared)
            cos = dot / (math.sqrt(n2[a] * 1.0) * math.sqrt(n2[b] * 1.0))
            sims.setdefault(a, []).append((cos, b))
            sims.setdefault(b, []).append((cos, a))
    want = {}
    for did, lst in sims.items():
        # round at 6dp BEFORE ranking, exactly as documented
        lst = sorted(((round(c, 6), nb) for c, nb in lst),
                     key=lambda x: (-x[0], x[1]))
        cos, nb = lst[0]
        if cos >= 0.2:
            want[did] = (nb, cos)
    got = _run(spark, sf_dir, "qs178_sparse_cosine_neighbors")
    got_d = {r.doc_id: (r.neighbor, r.cos) for r in got.itertuples()}
    assert set(got_d) == set(want)
    for did, (nb, cos) in want.items():
        assert got_d[did][0] == nb
        assert abs(got_d[did][1] - cos) <= 2e-6


def test_intent_qs218_dbscan_core_points(spark, sf_dir):
    # Textbook DBSCAN density roles by brute-force distance matrix
    # (the query's grid blocking is complete for eps = cell width =
    # 50000 on integer coords; this check does not rely on that).
    cu = _pd(sf_dir, "customer")
    k = cu["c_custkey"].to_numpy().astype(np.int64)
    lat = (k * 48271) % 1800000 - 900000
    lon = (k * 69621) % 3600000 - 1800000
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    nbr = d2 <= 2_500_000_000
    np.fill_diagonal(nbr, False)
    n_nbr = nbr.sum(axis=1)
    core = n_nbr >= 4
    border = (~core) & (nbr & core[None, :]).any(axis=1)
    got = _run(spark, sf_dir, "qs218_dbscan_core_points").set_index("id")
    assert len(got) == len(k)
    for i, kk in enumerate(k):
        assert got.loc[kk, "n_neighbors"] == n_nbr[i]
        role = "core" if core[i] else ("border" if border[i] else "noise")
        assert got.loc[kk, "role"] == role


def test_intent_qs233_blocking_recall_eval(spark, sf_dir):
    # Ground-truth recall of (lang, length-band) blocking, recomputed
    # from the definition: true pairs = within-lang trigram Jaccard
    # >= 0.3 (cross-multiplied integer test), found = those whose
    # length bands agree.
    d = _pd(sf_dir, "documents")
    sh = {}
    for r in d.itertuples():
        toks = r.text.split(" ")
        s = (
            {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else set()
        )
        sh[r.doc_id] = (r.lang, r.n_chars // 64, s)
    ids = sorted(sh)
    true_pairs = found = 0
    for i, a in enumerate(ids):
        la, ba, sa = sh[a]
        for b in ids[i + 1:]:
            lb, bb, sb = sh[b]
            if la != lb:
                continue
            inter = len(sa & sb)
            uni = len(sa | sb)
            if 10 * inter >= 3 * uni:
                true_pairs += 1
                found += int(ba == bb)
    got = _run(spark, sf_dir, "qs233_blocking_recall_eval").iloc[0]
    assert got["n_true_pairs"] == true_pairs
    assert got["n_found_by_band"] == found
    if true_pairs:
        assert got["recall_e6"] == found * 1_000_000 // true_pairs
    else:
        assert pd.isna(got["recall_e6"])


def test_intent_qs249_kcore(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    pairs = (
        li[["l_orderkey", "l_suppkey"]]
        .merge(li[["l_orderkey", "l_suppkey"]], on="l_orderkey")
        .query("l_suppkey_x < l_suppkey_y")
        .groupby(["l_suppkey_x", "l_suppkey_y"])
        .size()
    )
    edges = {tuple(e) for e, cnt in pairs.items() if cnt >= 3}
    # textbook 3-core: iteratively peel nodes with degree < 3 to the
    # FIXPOINT (the query unrolls 30 rounds; this reference proves the
    # unroll reaches the fixpoint on this data)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for node in list(adj):
            if len(adj[node]) < 3:
                for nb in adj.pop(node):
                    adj[nb].discard(node)
                changed = True
    got = _run(spark, sf_dir, "qs249_kcore_decomposition").set_index(
        "node"
    )
    assert set(got.index) == set(adj)
    for node, nbs in adj.items():
        assert got.loc[node, "degree"] == len(nbs)


def test_intent_qs257_rrf(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    toks = {
        r["doc_id"]: [t for t in r["text"].lower().split() if t]
        for _i, r in docs.iterrows()
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    terms = ("data", "query", "scan")
    tf = {
        t: {d: ts.count(t) for d, ts in toks.items() if t in ts}
        for t in terms
    }
    scores = {}
    for t in terms:
        df_t = len(tf[t])
        idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1)
        for d, f in tf[t].items():
            # BM25 with k1 = 1.2, b = 0.75
            scores[d] = scores.get(d, 0.0) + idf * f * 2.2 / (
                f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)
            )
    r1 = sorted(scores, key=lambda d: (-round(scores[d], 4), d))[:100]
    r2 = sorted(dl, key=lambda d: (-docs.set_index("doc_id").loc[d, "n_chars"], d))[:100]
    rrf = {}
    for rk, d in enumerate(r1, 1):
        rrf[d] = rrf.get(d, 0.0) + 1 / (60 + rk)
    for rk, d in enumerate(r2, 1):
        rrf[d] = rrf.get(d, 0.0) + 1 / (60 + rk)
    top = sorted(rrf.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[
        :15
    ]
    got = _run(spark, sf_dir, "qs257_rrf_fusion")
    assert list(got["doc_id"]) == [d for d, _s in top]
    for (d, s), (_i, row) in zip(top, got.iterrows()):
        assert row["rrf"] == pytest.approx(s, abs=2e-6)


def test_intent_qs294_rich_club(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    os_ = li[["l_orderkey", "l_suppkey"]].drop_duplicates()
    pairs = (
        os_.merge(os_, on="l_orderkey")
        .query("l_suppkey_x < l_suppkey_y")
        .groupby(["l_suppkey_x", "l_suppkey_y"])
        .size()
    )
    edges = [tuple(e) for e, cnt in pairs.items() if cnt >= 2]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = _run(spark, sf_dir, "qs294_rich_club").set_index("k")
    for k in (2, 4, 8, 16):
        club = {v for v, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        nk = len(club)
        phi = 2 * ek / (nk * (nk - 1)) if nk >= 2 else 0.0
        if k not in got.index:
            assert nk == 0
            continue
        assert got.loc[k, "n_nodes"] == nk
        assert got.loc[k, "n_edges"] == ek
        assert got.loc[k, "phi"] == pytest.approx(phi, abs=2e-4)


def test_intent_qs253_burrows_delta(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    rows = []
    for _i, r in docs.iterrows():
        for t in r["text"].lower().split():
            if t:
                rows.append((r["source"], t))
    tc = (
        pd.DataFrame(rows, columns=["source", "term"])
        .groupby(["source", "term"])
        .size()
    )
    tot = tc.groupby("source").sum()
    overall = tc.groupby("term").sum().reset_index()
    overall.columns = ["term", "c"]
    top = (
        overall.sort_values(["c", "term"], ascending=[False, True])
        .head(20)["term"]
        .tolist()
    )
    sources = sorted(tot.index)
    fr = pd.DataFrame(
        {
            s: [tc.get((s, t), 0) / tot[s] for t in top]
            for s in sources
        },
        index=top,
    )
    z = fr.sub(fr.mean(axis=1), axis=0).div(fr.std(axis=1, ddof=1), axis=0)
    z = z.fillna(0.0)
    got = _run(spark, sf_dir, "qs253_burrows_delta").set_index(
        ["s1", "s2"]
    )
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            delta = float(
                (z[sources[i]] - z[sources[j]]).abs().mean()
            )
            assert got.loc[
                (sources[i], sources[j]), "delta"
            ] == pytest.approx(delta, abs=2e-4)


def test_intent_qs265_neyman(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    g = pd.DataFrame(
        {"st": o["o_orderpriority"], "c": _cents(o["o_totalprice"])}
    ).groupby("st")["c"]
    stats = {st: (int(s.count()), float(s.std(ddof=1))) for st, s in g}
    tot = sum(n * sd for n, sd in stats.values())
    got = _run(spark, sf_dir, "qs265_neyman_allocation").set_index(
        "stratum"
    )
    for st, (n, sd) in stats.items():
        w = n * sd / tot
        assert got.loc[st, "n_stratum"] == n
        assert got.loc[st, "sigma_dollars"] == pytest.approx(
            sd / 100, abs=2e-2
        )
        assert got.loc[st, "weight"] == pytest.approx(w, abs=2e-6)
        assert got.loc[st, "alloc"] == math.floor(10000 * w)


def test_intent_qs267_markov_entropy(spark, sf_dir):
    ev = _pd(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    pairs = {}
    for _u, g in ev.groupby("user_id"):
        ets = g["event_type"].tolist()
        for a, b in zip(ets, ets[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    t = sum(pairs.values())
    ctx = {}
    for (a, _b), c in pairs.items():
        ctx[a] = ctx.get(a, 0) + c
    # entropy rate H(next | cur) = -sum p(cur,next) log2 p(next | cur)
    h_rate = -sum(
        (c / t) * math.log2(c / ctx[a]) for (a, _b), c in pairs.items()
    )
    h_joint = -sum((c / t) * math.log2(c / t) for c in pairs.values())
    got = _run(spark, sf_dir, "qs267_markov_entropy_rate").iloc[0]
    assert got["n_transitions"] == t
    assert got["entropy_rate_bits"] == pytest.approx(h_rate, abs=2e-4)
    assert got["joint_entropy_bits"] == pytest.approx(h_joint, abs=2e-4)


def test_intent_qs211_hhi(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    sup = _pd(sf_dir, "supplier")
    nat = _pd(sf_dir, "nation")
    j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    rev = (
        pd.DataFrame(
            {
                "nk": j["s_nationkey"],
                "supp": j["l_suppkey"],
                "c": _cents(j["l_extendedprice"]),
            }
        )
        .groupby(["nk", "supp"])["c"]
        .sum()
        .reset_index()
    )
    got = _run(spark, sf_dir, "qs211_herfindahl_index").set_index(
        "nation"
    )
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    for nk, g in rev.groupby("nk"):
        tot = int(g["c"].sum())
        # e4-floored shares BEFORE squaring (the documented quantized
        # HHI convention — exact integers end to end)
        sh = (g["c"] * 10000 // tot).astype(np.int64)
        hhi = int((sh * sh).sum())
        row = got.loc[names[nk]]
        assert row["n_suppliers"] == len(g)
        assert row["hhi_e8"] == hhi
        assert row["top_share_e4"] == int(sh.max())


def test_intent_qs235_burstiness(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    n = docs["doc_id"].nunique()
    counts = {}
    for _i, r in docs.iterrows():
        seen = {}
        for t in r["text"].lower().split(" "):
            if t:
                seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            counts.setdefault(t, []).append(c)
    got = _run(spark, sf_dir, "qs235_token_burstiness").set_index(
        "term"
    )
    checked = 0
    for t, xs in counts.items():
        sx = sum(xs)
        if sx < 50:
            continue
        sxx = sum(x * x for x in xs)
        # VMR over ALL docs (zeros included through n): var_pop/mean
        vmr_e6 = (n * sxx - sx * sx) * 1_000_000 // (n * sx)
        row = got.loc[t]
        assert row["total_count"] == sx
        assert row["docs_in"] == len(xs)
        assert row["vmr_e6"] == vmr_e6
        checked += 1
    assert checked == len(got)


def test_intent_qs240_lexical_diversity(spark, sf_dir):
    docs = _pd(sf_dir, "documents")
    docs = docs[docs["doc_id"] % 10 == 0]
    got = _run(spark, sf_dir, "qs240_lexical_diversity").set_index(
        "doc_id"
    )
    for _i, r in docs.iterrows():
        toks = [t for t in r["text"].lower().split(" ") if t]
        n, v = len(toks), len(set(toks))
        row = got.loc[r["doc_id"]]
        assert row["n_tokens"] == n and row["n_types"] == v
        assert row["ttr_e4"] == v * 10000 // n
        # root-TTR squared (V^2/N) keeps it integer-exact
        assert row["root_ttr_sq_e4"] == v * v * 10000 // n


def test_intent_qs282_price_dispersion(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    part = _pd(sf_dir, "part")
    # engines ROUND half-away-from-zero; np.round is half-to-even —
    # unit costs landing on exact .5 must round up here (positive)
    uc = np.floor(
        li["l_extendedprice"].to_numpy() * 100
        / li["l_quantity"].to_numpy()
        + 0.5
    ).astype(np.int64)
    sm = (
        pd.DataFrame(
            {"part": li["l_partkey"], "supp": li["l_suppkey"], "uc": uc}
        )
        .groupby(["part", "supp"])["uc"]
        .agg(["sum", "size"])
    )
    sm["m"] = sm["sum"] // sm["size"]
    got = _run(spark, sf_dir, "qs282_price_dispersion").set_index(
        "brand"
    )
    brand_of = dict(zip(part["p_partkey"], part["p_brand"]))
    acc = {}
    for pk, g in sm.groupby(level=0):
        m = g["m"].to_numpy(float)
        if len(m) < 3:
            continue
        cv = m.std(ddof=0) / m.mean()  # population CV (documented)
        spread = m.max() / m.min()
        acc.setdefault(brand_of[pk], []).append((cv, spread))
    for brand, rows in acc.items():
        cvs = [c for c, _s in rows]
        sps = [s for _c, s in rows]
        r = got.loc[brand]
        assert r["n_parts"] == len(rows)
        assert r["avg_cv"] == pytest.approx(np.mean(cvs), abs=2e-4)
        assert r["avg_spread"] == pytest.approx(np.mean(sps), abs=2e-4)
        assert r["n_dispersed"] == sum(1 for c in cvs if c > 0.05)


def test_intent_qs189_lorenz(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    rev = (
        pd.DataFrame(
            {"ck": o["o_custkey"], "c": _cents(o["o_totalprice"])}
        )
        .groupby("ck")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "ck"])
        .reset_index(drop=True)
    )
    n = len(rev)
    base, extra = divmod(n, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    rev["d"] = np.repeat(np.arange(1, 11), sizes)
    agg = rev.groupby("d")["c"].agg(["size", "sum"])
    tot = int(agg["sum"].sum())
    cum = 0
    got = _run(spark, sf_dir, "qs189_lorenz_deciles").set_index(
        "decile"
    )
    for d, row in agg.iterrows():
        cum += int(row["sum"])
        r = got.loc[d]
        assert r["n_cust"] == row["size"]
        assert r["rev_cents"] == row["sum"]
        assert r["cum_share_e6"] == round(cum * 1_000_000 / tot)


# -- wave 10: the round-11 diagnostics family (qs351+) -----------------------


def _round_away(v: np.ndarray) -> np.ndarray:
    # Engines ROUND half-away-from-zero; np.round is half-to-even
    # (the qs282 lesson).
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def test_intent_qs351_levene(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    x = pd.DataFrame(
        {"g": c["c_mktsegment"], "v": _cents(c["c_acctbal"]).astype(float)}
    )
    z = x.copy()
    z["z"] = x.groupby("g")["v"].transform(lambda s: np.abs(s - np.median(s)))
    n_tot = len(z)
    k = z["g"].nunique()
    zbar = z["z"].mean()
    num = sum(
        len(grp) * (grp["z"].mean() - zbar) ** 2 for _, grp in z.groupby("g")
    )
    den = sum(
        ((grp["z"] - grp["z"].mean()) ** 2).sum() for _, grp in z.groupby("g")
    )
    w = (n_tot - k) / (k - 1) * num / den
    got = _run(spark, sf_dir, "qs351_levene_test").iloc[0]
    assert got["n_rows"] == n_tot and got["n_groups"] == k
    assert got["levene_w"] == pytest.approx(w, abs=2e-4)


def test_intent_qs352_fleiss(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    tab = (
        li.groupby("l_orderkey")["l_returnflag"]
        .value_counts()
        .unstack(fill_value=0)
        .reindex(columns=["R", "N", "A"], fill_value=0)
    )
    tab = tab[tab.sum(axis=1) == 4]
    n_subj = len(tab)
    p_i = (np.square(tab.to_numpy()).sum(axis=1) - 4) / 12.0
    p_bar = p_i.mean()
    p_j = tab.to_numpy().sum(axis=0) / (4.0 * n_subj)
    p_e = float(np.square(p_j).sum())
    kappa = (p_bar - p_e) / (1.0 - p_e)
    got = _run(spark, sf_dir, "qs352_fleiss_kappa").iloc[0]
    assert got["n_subjects"] == n_subj
    assert got["p_bar"] == pytest.approx(p_bar, abs=2e-6)
    assert got["fleiss_kappa"] == pytest.approx(kappa, abs=2e-6)


def test_intent_qs353_turning_points(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    daily = (
        o.groupby(o["o_orderdate"].dt.date)
        .size()
        .sort_index()
        .to_numpy()
        .astype(np.int64)
    )
    n = len(daily)
    mid, prev, nxt = daily[1:-1], daily[:-2], daily[2:]
    t = int(
        (((mid > prev) & (mid > nxt)) | ((mid < prev) & (mid < nxt))).sum()
    )
    z = (t - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    got = _run(spark, sf_dir, "qs353_turning_points").iloc[0]
    assert got["n_days"] == n and got["t_points"] == t
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs354_periodogram(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    daily = (
        pd.DataFrame(
            {
                "t": (o["o_orderdate"].dt.normalize()
                      - pd.Timestamp("1995-01-01")).dt.days,
                "y": _cents(o["o_totalprice"]),
            }
        )
        .groupby("t")["y"]
        .sum()
    )
    t = daily.index.to_numpy().astype(float)
    y = daily.to_numpy().astype(float)
    yc = y - y.mean()
    n = len(y)
    got = _run(spark, sf_dir, "qs354_periodogram").set_index("period")
    for p in (7, 30, 91, 365):
        ang = 2 * np.pi * t / p
        cs = float((yc * np.cos(ang)).sum())
        sn = float((yc * np.sin(ang)).sum())
        want = (cs * cs + sn * sn) / (2.0 * n * float((yc * yc).sum()))
        assert 0.0 <= want <= 1.0
        assert got.loc[p, "norm_power"] == pytest.approx(want, abs=2e-6)


def test_intent_qs355_variance_ratio(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    y = (
        pd.DataFrame(
            {"d": o["o_orderdate"].dt.date, "y": _cents(o["o_totalprice"])}
        )
        .groupby("d")["y"]
        .sum()
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    r = np.diff(np.log(y))
    s5 = np.convolve(r, np.ones(5), mode="valid")
    vr = s5.var() / (5.0 * r.var())  # numpy var = population var
    got = _run(spark, sf_dir, "qs355_variance_ratio").iloc[0]
    assert got["n_returns"] == len(r) and got["n_windows"] == len(s5)
    assert got["vr5"] == pytest.approx(vr, abs=2e-4)


def test_intent_qs357_t_closeness(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    o = _pd(sf_dir, "orders")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["r"] = j["o_orderpriority"].str[0].astype(int)
    glob = j["r"].value_counts(normalize=True).reindex(
        range(1, 6), fill_value=0.0
    )
    emds = []
    for _, grp in j.groupby(["c_nationkey", "c_mktsegment"]):
        p = grp["r"].value_counts(normalize=True).reindex(
            range(1, 6), fill_value=0.0
        )
        d = (p - glob).to_numpy()
        emds.append(float(np.abs(np.cumsum(d)[:-1]).sum()) / 4.0)
    got = _run(spark, sf_dir, "qs357_t_closeness").iloc[0]
    assert got["n_classes"] == len(emds)
    assert got["t_closeness"] == pytest.approx(max(emds), abs=2e-6)
    assert got["avg_emd"] == pytest.approx(np.mean(emds), abs=2e-6)


def test_intent_qs358_breusch_pagan(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    daily = (
        pd.DataFrame(
            {
                "t": (o["o_orderdate"].dt.normalize()
                      - pd.Timestamp("1995-01-01")).dt.days,
                "y": _cents(o["o_totalprice"]),
            }
        )
        .groupby("t")["y"]
        .sum()
    )
    t = daily.index.to_numpy().astype(float)
    y = daily.to_numpy().astype(float)
    b = ((t - t.mean()) * (y - y.mean())).sum() / ((t - t.mean()) ** 2).sum()
    a = y.mean() - b * t.mean()
    u = (y - a - b * t) ** 2
    r2 = float(np.corrcoef(t, u)[0, 1]) ** 2
    got = _run(spark, sf_dir, "qs358_breusch_pagan").iloc[0]
    assert got["n_days"] == len(t)
    assert got["r2_aux"] == pytest.approx(r2, abs=2e-6)
    assert got["bp_lm"] == pytest.approx(len(t) * r2, abs=2e-4)


def test_intent_qs359_overdispersion(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    dd = (ev["ts"].dt.normalize() - pd.Timestamp("1995-01-01")).dt.days
    lo, hi = int(dd.min()), int(dd.max())
    got = _run(spark, sf_dir, "qs359_overdispersion").set_index("event_type")
    for typ, grp in dd.groupby(ev["event_type"]):
        c = (
            grp.value_counts()
            .reindex(range(lo, hi + 1), fill_value=0)
            .to_numpy()
            .astype(float)
        )
        r = got.loc[typ]
        assert r["n_days"] == hi - lo + 1
        assert r["mean_count"] == pytest.approx(c.mean(), abs=2e-4)
        assert r["dispersion"] == pytest.approx(
            c.var() / c.mean(), abs=2e-4
        )


def test_intent_qs361_gk_lambda(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    tab = pd.crosstab(c["c_nationkey"], c["c_mktsegment"]).to_numpy()
    n = tab.sum()
    lam_cg = (tab.max(axis=1).sum() - tab.sum(axis=0).max()) / (
        n - tab.sum(axis=0).max()
    )
    lam_rg = (tab.max(axis=0).sum() - tab.sum(axis=1).max()) / (
        n - tab.sum(axis=1).max()
    )
    got = _run(spark, sf_dir, "qs361_gk_lambda").iloc[0]
    assert got["n_rows"] == n
    assert got["lambda_seg_given_nat"] == pytest.approx(lam_cg, abs=2e-6)
    assert got["lambda_nat_given_seg"] == pytest.approx(lam_rg, abs=2e-6)


def test_intent_qs362_dagostino_skew(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    x = _round_away(c["c_acctbal"].to_numpy()).astype(float)
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    g1 = m3 / m2**1.5
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    b2 = (
        3.0
        * (n * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2.0 * (b2 - 1)) - 1.0
    delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2.0 / (w2 - 1))
    z = delta * math.asinh(y / alpha)
    got = _run(spark, sf_dir, "qs362_dagostino_skew").iloc[0]
    assert got["n_rows"] == n
    assert got["g1"] == pytest.approx(g1, abs=2e-6)
    assert got["z_skew"] == pytest.approx(z, abs=2e-4)


def test_intent_qs363_seasonal_strength(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    daily = (
        pd.DataFrame(
            {"d": o["o_orderdate"].dt.normalize(), "y": _cents(o["o_totalprice"])}
        )
        .groupby("d")["y"]
        .sum()
    )
    dense = daily.reindex(
        pd.date_range(daily.index.min(), daily.index.max()), fill_value=0
    ).astype(float)
    trend = dense.rolling(7, center=True).mean().dropna()
    dt = dense.loc[trend.index] - trend
    dow = (trend.index - pd.Timestamp("1995-01-01")).days % 7
    sea = dt.groupby(dow).mean()
    r = dt - sea.loc[dow].to_numpy()
    fs = max(0.0, 1.0 - r.var(ddof=0) / dt.var(ddof=0))
    got = _run(spark, sf_dir, "qs363_seasonal_strength").iloc[0]
    assert got["n_days"] == len(dt)
    assert got["seasonal_strength"] == pytest.approx(fs, abs=2e-4)


def test_intent_qs364_sprt(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    arm = ev[ev["user_id"] % 2 == 1]
    dd = (arm["ts"].dt.normalize() - pd.Timestamp("1995-01-01")).dt.days
    g = pd.DataFrame(
        {"dd": dd, "s": (arm["value"] >= 70.0).astype(int)}
    ).groupby("dd")["s"]
    days = g.count().sort_index()
    succ = g.sum().sort_index()
    la, lb = math.log(0.35 / 0.25), math.log(0.65 / 0.75)
    inc = succ * la + (days - succ) * lb
    cum = inc.cumsum()
    bound = math.log(19.0)
    hi = cum.index[cum >= bound]
    lo = cum.index[cum <= -bound]
    d_hi = int(hi[0]) if len(hi) else None
    d_lo = int(lo[0]) if len(lo) else None
    if d_hi is not None and (d_lo is None or d_hi <= d_lo):
        decision, cross = "reject_h0", d_hi
    elif d_lo is not None:
        decision, cross = "accept_h0", d_lo
    else:
        decision, cross = "continue", None
    got = _run(spark, sf_dir, "qs364_sprt_ab").iloc[0]
    assert got["n_days"] == len(days)
    assert got["final_llr"] == pytest.approx(float(inc.sum()), abs=2e-4)
    assert got["decision"] == decision
    if cross is None:
        assert pd.isna(got["cross_day"])
    else:
        assert got["cross_day"] == cross


def test_intent_qs365_pmi(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    uni, big = Counter(), Counter()
    for text in d["text"]:
        ws = [w for w in text.lower().split(" ") if w]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    nu = sum(uni.values())
    nb = sum(big.values())
    rows = []
    for (w1, w2), c12 in big.items():
        if c12 >= 5:
            pmi = math.log(c12 * nu * nu / (nb * uni[w1] * uni[w2]))
            rows.append((round(pmi, 6), w1, w2, c12))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = rows[:20]
    got = _run(spark, sf_dir, "qs365_pmi_collocations")
    assert len(got) == len(want)
    for grow, (pmi, w1, w2, c12) in zip(got.itertuples(index=False), want):
        assert (grow.w1, grow.w2, grow.c12) == (w1, w2, c12)
        assert grow.pmi == pytest.approx(pmi, abs=2e-6)


def test_intent_qs366_heaps(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    nd = int(d["doc_id"].max()) + 1
    pts = []
    for frac in (10, 4, 2, 1):
        cut = d[d["doc_id"] * frac < nd]
        toks, types = 0, set()
        for text in cut["text"]:
            ws = [w for w in text.lower().split(" ") if w]
            bgs = list(zip(ws, ws[1:]))
            toks += len(bgs)
            types.update(bgs)
        pts.append((toks, len(types)))
    lx = np.log([p[0] for p in pts])
    ly = np.log([p[1] for p in pts])
    beta = np.polyfit(lx, ly, 1)[0]
    got = _run(spark, sf_dir, "qs366_heaps_law").iloc[0]
    assert got["n_docs"] == nd
    assert (got["n_bigrams"], got["n_types"]) == pts[3]
    assert got["beta"] == pytest.approx(beta, abs=2e-4)


# -- wave 11: the round-11 batch-2 diagnostics (qs367+) ----------------------


def _daily_cents(sf_dir):
    o = _pd(sf_dir, "orders")
    return (
        pd.DataFrame(
            {"d": o["o_orderdate"].dt.date, "y": _cents(o["o_totalprice"])}
        )
        .groupby("d")["y"]
        .sum()
        .sort_index()
        .to_numpy()
        .astype(np.int64)
    )


def test_intent_qs367_cox_stuart(spark, sf_dir):
    y = _daily_cents(sf_dir)
    n = len(y)
    h, m = (n + 1) // 2, n // 2
    y1, y2 = y[:m], y[h:h + m]
    sp = int((y2 > y1).sum())
    npairs = int((y2 != y1).sum())
    z = (sp - npairs / 2.0) / math.sqrt(npairs / 4.0)
    got = _run(spark, sf_dir, "qs367_cox_stuart").iloc[0]
    assert (got["n_pairs"], got["s_plus"]) == (npairs, sp)
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs368_bartels(spark, sf_dir):
    y = _daily_cents(sf_dir)
    n = len(y)
    order = np.lexsort((np.arange(n), y))  # (y, day) tiebreak
    r = np.empty(n, dtype=np.int64)
    r[order] = np.arange(1, n + 1)
    nm = int((np.diff(r) ** 2).sum())
    den = float(((r - r.mean()) ** 2).sum())
    rvn = nm / den
    var = (
        4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)
        / (5.0 * n * (n + 1.0) * (n - 1) ** 2)
    )
    z = (rvn - 2.0) / math.sqrt(var)
    got = _run(spark, sf_dir, "qs368_bartels_rank").iloc[0]
    assert got["n_days"] == n
    assert got["rvn"] == pytest.approx(rvn, abs=2e-4)
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs369_hartley(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    v = (
        pd.DataFrame(
            {"g": c["c_mktsegment"], "x": _cents(c["c_acctbal"]).astype(float)}
        )
        .groupby("g")["x"]
        .var(ddof=1)
    )
    got = _run(spark, sf_dir, "qs369_hartley_fmax").iloc[0]
    assert got["n_groups"] == len(v)
    assert got["f_max"] == pytest.approx(v.max() / v.min(), abs=2e-4)


def _group_cents(sf_dir):
    li = _pd(sf_dir, "lineitem")
    return (
        pd.DataFrame(
            {
                "g": li["l_partkey"] % 200,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby("g")["c"]
        .sum()
        .to_numpy()
        .astype(float)
    )


def test_intent_qs370_hoover(spark, sf_dir):
    c = _group_cents(sf_dir)
    s = c / c.sum()
    h = 0.5 * np.abs(s - 1.0 / len(c)).sum()
    got = _run(spark, sf_dir, "qs370_hoover_index").iloc[0]
    assert got["n_groups"] == len(c)
    assert got["hoover"] == pytest.approx(h, abs=2e-6)


def test_intent_qs371_atkinson(spark, sf_dir):
    c = _group_cents(sf_dir)
    a = 1.0 - math.exp(np.log(c).mean()) / c.mean()
    got = _run(spark, sf_dir, "qs371_atkinson_index").iloc[0]
    assert got["n_groups"] == len(c)
    assert got["atkinson"] == pytest.approx(a, abs=2e-6)


def test_intent_qs372_source_kl(spark, sf_dir):
    from collections import Counter, defaultdict

    d = _pd(sf_dir, "documents")
    cnt, tot = defaultdict(Counter), Counter()
    vocab = set()
    for src, text in zip(d["source"], d["text"]):
        ws = [w for w in text.lower().split(" ") if w]
        cnt[src].update(ws)
        tot[src] += len(ws)
        vocab.update(ws)
    v = len(vocab)
    got = _run(spark, sf_dir, "qs372_source_kl_matrix").set_index(
        ["source_a", "source_b"]
    )
    srcs = sorted(cnt)
    assert len(got) == len(srcs) * (len(srcs) - 1)
    checked = 0
    for a in srcs:
        for b in srcs:
            if a == b:
                continue
            kl = sum(
                ((cnt[a][w] + 1.0) / (tot[a] + v))
                * math.log(
                    ((cnt[a][w] + 1.0) / (tot[a] + v))
                    / ((cnt[b][w] + 1.0) / (tot[b] + v))
                )
                for w in vocab
            )
            assert got.loc[(a, b), "kl_nats"] == pytest.approx(
                kl, abs=2e-6
            )
            checked += 1
    assert checked == len(got)


def _pair_counts(tab):
    a = tab.to_numpy().astype(np.int64)
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    sij = int(c2(a).sum())
    sa = int(c2(a.sum(axis=1)).sum())
    sb = int(c2(a.sum(axis=0)).sum())
    n = int(a.sum())
    return n, sij, sa, sb


def test_intent_qs373_ari(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    x = np.minimum(3, np.floor(o["o_totalprice"] / 125000)).astype(int)
    tab = pd.crosstab(x, o["o_orderpriority"])
    n, sij, sa, sb = _pair_counts(tab)
    e = sa * sb / (n * (n - 1) / 2)
    ari = (sij - e) / ((sa + sb) / 2 - e)
    got = _run(spark, sf_dir, "qs373_adjusted_rand").iloc[0]
    assert got["n_rows"] == n
    assert got["ari"] == pytest.approx(ari, abs=2e-6)


def test_intent_qs374_fm(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    tab = pd.crosstab(c["c_nationkey"], c["c_mktsegment"])
    n, sij, sa, sb = _pair_counts(tab)
    fm = sij / math.sqrt(sa * sb)
    ri = 1.0 - (sa + sb - 2 * sij) / (n * (n - 1) / 2)
    got = _run(spark, sf_dir, "qs374_fowlkes_mallows").iloc[0]
    assert got["n_rows"] == n
    assert got["fm"] == pytest.approx(fm, abs=2e-6)
    assert got["rand_index"] == pytest.approx(ri, abs=2e-6)


def test_intent_qs375_hosmer_lemeshow(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    ev = ev[ev["value"] < 100]
    p = 1.0 / (1.0 + np.exp(-(ev["value"] - 50.0) / 10.0))
    df = pd.DataFrame(
        {
            "bin": np.floor(ev["value"] / 10).astype(int),
            "p": p,
            "o": (ev["event_type"] == "purchase").astype(int),
        }
    )
    g = df.groupby("bin").agg(nb=("o", "size"), obs=("o", "sum"), e=("p", "sum"))
    hl = float(
        (((g["obs"] - g["e"]) ** 2) / (g["e"] * (1 - g["e"] / g["nb"]))).sum()
    )
    got = _run(spark, sf_dir, "qs375_hosmer_lemeshow").iloc[0]
    assert got["n_bins"] == len(g) and got["n_events"] == len(df)
    assert got["hl_chi2"] == pytest.approx(hl, abs=2e-4)


def test_intent_qs376_youden(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    ev = ev[ev["value"] < 100]
    band = np.floor(ev["value"] / 5).astype(int)
    pos = (ev["event_type"] == "purchase").astype(int)
    g = pd.DataFrame({"band": band, "p": pos}).groupby("band")["p"].agg(
        ["sum", "size"]
    )
    tp_tot = int(g["sum"].sum())
    tq_tot = int((g["size"] - g["sum"]).sum())
    best = None
    for b in sorted(g.index):
        cp = int(g.loc[g.index >= b, "sum"].sum())
        cq = int((g.loc[g.index >= b, "size"] - g.loc[g.index >= b, "sum"]).sum())
        row = (
            round(cp / tp_tot - cq / tq_tot, 6),
            -(b * 5),
            b * 5,
            round(cp / tp_tot, 6),
            round(cq / tq_tot, 6),
        )
        if best is None or row[:2] > best[:2]:
            best = row
    got = _run(spark, sf_dir, "qs376_youden_threshold").iloc[0]
    assert got["threshold"] == best[2]
    assert got["tpr"] == pytest.approx(best[3], abs=2e-6)
    assert got["fpr"] == pytest.approx(best[4], abs=2e-6)
    assert got["j"] == pytest.approx(best[0], abs=2e-6)


def test_intent_qs377_cvm(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    c = _pd(sf_dir, "customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    daily = (
        pd.DataFrame(
            {
                "seg": j["c_mktsegment"],
                "d": j["o_orderdate"].dt.date,
                "y": _cents(j["o_totalprice"]),
            }
        )
        .groupby(["seg", "d"])["y"]
        .sum()
        .reset_index()
        .sort_values(["y", "seg", "d"])
        .reset_index(drop=True)
    )
    daily["r"] = np.arange(1, len(daily) + 1)
    daily["i"] = daily.groupby("seg").cumcount() + 1
    x = daily[daily["seg"] == "BUILDING"]
    y = daily[daily["seg"] == "MACHINERY"]
    n, m = len(x), len(y)
    ux = int(((x["r"] - x["i"]) ** 2).sum())
    uy = int(((y["r"] - y["i"]) ** 2).sum())
    t = (n * ux + m * uy) / (n * m * (n + m)) - (4.0 * n * m - 1) / (
        6.0 * (n + m)
    )
    got = _run(spark, sf_dir, "qs377_cramer_von_mises").iloc[0]
    assert (got["n_x"], got["n_y"]) == (n, m)
    assert got["cvm_t"] == pytest.approx(t, abs=2e-6)


def test_intent_qs378_theil_decomposition(spark, sf_dir):
    c = _group_cents(sf_dir)
    g = np.arange(len(c))
    tc, ng = c.sum(), len(c)
    t_total = float(((c / tc) * np.log(c * ng / tc)).sum())
    t_within = t_between = 0.0
    for r in range(5):
        cr = c[g % 5 == r]
        sr = cr.sum() / tc
        tr = float(((cr / cr.sum()) * np.log(cr * len(cr) / cr.sum())).sum())
        t_within += sr * tr
        t_between += sr * math.log(sr * 5.0)
    got = _run(spark, sf_dir, "qs378_theil_decomposition").iloc[0]
    assert got["n_groups"] == ng
    assert got["t_total"] == pytest.approx(t_total, abs=2e-6)
    assert got["t_within"] == pytest.approx(t_within, abs=2e-6)
    assert got["t_between"] == pytest.approx(t_between, abs=2e-6)
    # the decomposition identity is exact by construction
    assert t_total == pytest.approx(t_within + t_between, abs=1e-9)


# -- wave 12: the round-11 mini-batch (qs379+) -------------------------------


def test_intent_qs379_quintile_shares(spark, sf_dir):
    c = np.sort(_group_cents(sf_dir))
    n = len(c)
    assert n == 200  # decile split is exact 20/20
    dec = np.repeat(np.arange(1, 11), n // 10)
    tot = c.sum()
    s80s20 = c[dec >= 9].sum() / c[dec <= 2].sum()
    palma = c[dec == 10].sum() / c[dec <= 4].sum()
    assert c[dec >= 9].sum() / tot <= 1.0
    got = _run(spark, sf_dir, "qs379_quintile_shares").iloc[0]
    assert got["n_groups"] == n
    assert got["s80_s20"] == pytest.approx(s80s20, abs=2e-6)
    assert got["palma"] == pytest.approx(palma, abs=2e-6)


def test_intent_qs380_gwet_ac1(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    tab = (
        li.groupby("l_orderkey")["l_returnflag"]
        .value_counts()
        .unstack(fill_value=0)
        .reindex(columns=["R", "N", "A"], fill_value=0)
    )
    tab = tab[tab.sum(axis=1) == 4].to_numpy()
    n = len(tab)
    pa = float(((np.square(tab).sum(axis=1) - 4) / 12.0).mean())
    pi = tab.sum(axis=0) / (4.0 * n)
    pe = float((pi * (1 - pi)).sum()) / 2.0
    ac1 = (pa - pe) / (1.0 - pe)
    got = _run(spark, sf_dir, "qs380_gwet_ac1").iloc[0]
    assert got["n_subjects"] == n
    assert got["pa"] == pytest.approx(pa, abs=2e-6)
    assert got["gwet_ac1"] == pytest.approx(ac1, abs=2e-6)


def test_intent_qs381_seasonal_mk(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    m = (
        pd.DataFrame(
            {
                "yr": o["o_orderdate"].dt.year,
                "season": o["o_orderdate"].dt.month,
                "y": _cents(o["o_totalprice"]),
            }
        )
        .groupby(["yr", "season"])["y"]
        .sum()
        .reset_index()
    )
    s_stat, var = 0, 0.0
    for _, grp in m.groupby("season"):
        y = grp.sort_values("yr")["y"].to_numpy()
        ns = len(y)
        for i in range(ns):
            for jj in range(i + 1, ns):
                s_stat += int(np.sign(y[jj] - y[i]))
        var += ns * (ns - 1) * (2 * ns + 5) / 18.0
    zc = s_stat - 1 if s_stat > 0 else (s_stat + 1 if s_stat < 0 else 0)
    z = zc / math.sqrt(var)
    got = _run(spark, sf_dir, "qs381_seasonal_mann_kendall").iloc[0]
    assert got["n_cells"] == len(m)
    assert got["s_stat"] == s_stat
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_intent_qs382_wilcoxon(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    o = o[o["o_orderdate"].dt.year.isin([1995, 1996])]
    cents = _cents(o["o_totalprice"])
    df = pd.DataFrame(
        {
            "grp": o["o_custkey"] % 100,
            "y95": np.where(o["o_orderdate"].dt.year == 1995, cents, 0),
            "y96": np.where(o["o_orderdate"].dt.year == 1996, cents, 0),
        }
    ).groupby("grp").sum()
    d = (df["y96"] - df["y95"])
    d = d[d != 0]
    order = np.lexsort((d.index.to_numpy(), np.abs(d.to_numpy())))
    r = np.empty(len(d), dtype=np.int64)
    r[order] = np.arange(1, len(d) + 1)
    w_plus = int(r[(d > 0).to_numpy()].sum())
    n = len(d)
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0
    )
    got = _run(spark, sf_dir, "qs382_wilcoxon_signed_rank").iloc[0]
    assert (got["n_pairs"], got["w_plus"]) == (n, w_plus)
    assert got["z"] == pytest.approx(z, abs=2e-4)


# -- wave 13 (r12): promote COVERED-ELSEWHERE classes to INTENT-TESTED ----
# Independent pure-python/numpy reimplementations of the similarity,
# retrieval, and graph family — written from each statistic's textbook
# definition over the raw parquet, not from the query's SQL.


def _emb(sf_dir):
    e = _pd(sf_dir, "embeddings")
    return (
        e["vec_id"].to_numpy(),
        np.stack([np.asarray(v, dtype=np.float64) for v in e["embedding"]]),
        e["label"].to_numpy(),
    )


def test_intent_qs52_cosine_topk(spark, sf_dir):
    ids, V, _ = _emb(sf_dir)
    q = V[ids == 0][0]
    mask = ids != 0
    sims = (V[mask] @ q) / (
        np.linalg.norm(V[mask], axis=1) * np.linalg.norm(q)
    )
    ref = dict(zip(ids[mask], sims))
    out = _run(spark, sf_dir, "qs52_cosine_topk")
    assert len(out) == 10
    for vid, sim in zip(out["vec_id"], out["sim"]):
        assert abs(ref[vid] - sim) <= 2e-4
    # nothing outside the returned set beats the worst returned sim
    floor = out["sim"].min()
    others = [s for v, s in ref.items() if v not in set(out["vec_id"])]
    assert max(others) <= floor + 2e-4


def test_intent_qs61_cosine_topk_pandas(spark, sf_dir):
    ids, V, _ = _emb(sf_dir)
    q = V[ids == 0][0]
    mask = ids != 0
    sims = (V[mask] @ q) / (
        np.linalg.norm(V[mask], axis=1) * np.linalg.norm(q)
    )
    ref = dict(zip(ids[mask], sims))
    out = _run(spark, sf_dir, "qs61_cosine_topk_pandas")
    assert len(out) == 10
    for vid, sim in zip(out["vec_id"], out["sim"]):
        assert abs(ref[vid] - sim) <= 2e-4


def test_intent_qs53_vector_group_agg(spark, sf_dir):
    ids, V, labels = _emb(sf_dir)
    out = _run(spark, sf_dir, "qs53_vector_group_agg")
    assert set(out["label"]) == set(labels)
    for _, r in out.iterrows():
        m = labels == r["label"]
        assert r["c"] == int(m.sum())
        assert abs((V[m] ** 2).sum(axis=1).mean() - r["avg_sqnorm"]) <= 2e-4


def test_intent_qs84_bm25(spark, sf_dir):
    # Okapi BM25, Robertson idf with +1 (k1=1.2, b=0.75), from the
    # textbook formula over whitespace-lowered tokens.
    d = _pd(sf_dir, "documents")
    toks = {r.doc_id: r.text.lower().split(" ") for r in d.itertuples()}
    N = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / N
    terms = ["hash", "join", "scan"]
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in terms
    }
    k1, b = 1.2, 0.75
    ref = {}
    for did, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(tk) / avgdl)
            )
        if s > 0.0:
            ref[did] = s
    out = _run(spark, sf_dir, "qs84_bm25")
    got = dict(zip(out["doc_id"], out["score"]))
    assert set(got) == set(ref)
    for did, s in ref.items():
        assert abs(got[did] - s) <= 2e-4


def _block_graph(sf_dir):
    """The qs51 blocking graph: undirected edges between documents
    sharing (lang, n_chars)."""
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in d.itertuples():
        blocks[(r.lang, r.n_chars)].append(r.doc_id)
    adj = defaultdict(set)
    for ids in blocks.values():
        for i in ids:
            for j in ids:
                if i != j:
                    adj[i].add(j)
    return adj


def test_intent_qs94_pagerank(spark, sf_dir):
    # Textbook power iteration: r' = 0.15/n + 0.85 * sum(r_u/deg_u),
    # 10 iterations from the uniform vector, over the blocking graph.
    adj = _block_graph(sf_dir)
    nodes = sorted(adj)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        nxt = {v: 0.15 / n for v in nodes}
        for u in nodes:
            share = 0.85 * rank[u] / len(adj[u])
            for v in adj[u]:
                nxt[v] += share
        rank = nxt
    out = _run(spark, sf_dir, "qs94_pagerank")
    got = dict(zip(out["node"], out["rank"]))
    assert set(got) == set(rank)
    for v in nodes:
        assert abs(got[v] - rank[v]) <= 2e-4
    # rank mass conservation (no dangling nodes in a symmetric graph)
    assert abs(sum(rank.values()) - 1.0) < 1e-9


def test_intent_qs120_graph_bfs(spark, sf_dir):
    # Multi-source BFS levels, classic frontier expansion, <=3 hops.
    adj = _block_graph(sf_dir)
    level = {v: 0 for v in adj if v % 20 == 0}
    frontier = set(level)
    for lvl in (1, 2, 3):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in level:
                    level[v] = lvl
                    nxt.add(v)
        frontier = nxt
    out = _run(spark, sf_dir, "qs120_graph_bfs")
    got = dict(zip(out["node"], out["level"]))
    assert got == level


def test_intent_qs156_robust_outliers(spark, sf_dir):
    # Median/MAD robust outlier rule: |x - med| > 4.4478 * MAD
    # (3 sigma with the 1.4826 normal-consistency factor), medians
    # linearly interpolated.
    o = _pd(sf_dir, "orders")
    cents = _cents(o["o_totalprice"])
    out = _run(spark, sf_dir, "qs156_robust_outliers")
    for _, r in out.iterrows():
        x = cents[(o["o_orderstatus"] == r["o_orderstatus"]).to_numpy()]
        med = np.percentile(x, 50, method="linear")
        d = np.abs(x - med)
        mad = np.percentile(d, 50, method="linear")
        assert r["n"] == len(x)
        assert abs(r["med_cents"] - med) <= 1e-6
        assert abs(r["mad_cents"] - mad) <= 1e-6
        assert r["n_outliers"] == int((d > 4.4478 * mad).sum())


def test_intent_qs172_weighted_sssp(spark, sf_dir):
    # Bellman-Ford, <=4 relaxation rounds, on the nation trade graph
    # with weight = 1 + 10^12 // volume_cents.
    li = _pd(sf_dir, "lineitem")
    o = _pd(sf_dir, "orders")
    c = _pd(sf_dir, "customer")
    s = _pd(sf_dir, "supplier")
    nat = _pd(sf_dir, "nation")
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))
    j = (
        li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    )
    j["src"] = j["s_nationkey"].map(nname)
    j["dst"] = j["c_nationkey"].map(nname)
    j = j[j["src"] != j["dst"]]
    j["cents"] = _cents(j["l_extendedprice"])
    vol = j.groupby(["src", "dst"])["cents"].sum()
    edges = {
        (a, b): 1 + 10**12 // int(v) for (a, b), v in vol.items()
    }
    # Path semantics: every path has >= 1 edge, so the source itself
    # is reported at its cheapest <=4-hop CYCLE cost (not 0).
    dist = {
        b: w for (a, b), w in edges.items() if a == "NATION_3"
    }
    for _ in range(3):
        nxt = dict(dist)
        for (a, b), w in edges.items():
            if a in dist and dist[a] + w < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w
        dist = nxt
    out = _run(spark, sf_dir, "qs172_weighted_shortest_path")
    got = dict(zip(out["n_name"], out["dist"]))
    assert got == dist


def test_intent_qs213_knn_accuracy(spark, sf_dir):
    # Leave-one-out 3-NN majority vote, the documented tie-breaks:
    # sims rounded to 6 before ranking, rank ties to smaller cid,
    # vote ties to smaller label; accuracy = floor(correct*1e4/n).
    ids, V, labels = _emb(sf_dir)
    lab = dict(zip(ids, labels))
    norm = np.linalg.norm(V, axis=1)
    per_label = {}
    for qi, qid in enumerate(ids):
        if qid % 5 != 0:
            continue
        sims = (V @ V[qi]) / (norm * norm[qi])
        cand = sorted(
            (
                (-round(float(sims[ci]), 6), int(cid))
                for ci, cid in enumerate(ids)
                if cid != qid
            ),
        )[:3]
        votes = {}
        for _s, cid in cand:
            votes[lab[cid]] = votes.get(lab[cid], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        n, k = per_label.get(lab[qid], (0, 0))
        per_label[lab[qid]] = (n + 1, k + (pred == lab[qid]))
    out = _run(spark, sf_dir, "qs213_knn_accuracy")
    assert len(out) == len(per_label)
    for _, r in out.iterrows():
        n, k = per_label[r["label"]]
        assert (r["n_queries"], r["n_correct"]) == (n, k)
        assert r["accuracy_e4"] == k * 10000 // n


def _two_layer_graph(sf_dir, window=None):
    """qs222/qs334 provenance graph: union of (lang, n_chars) and
    (source, n_chars%5) blocking layers; ``window`` = the qs334
    sorted-neighborhood W (pair only the W doc_id successors)."""
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    layers = [
        defaultdict(list),
        defaultdict(list),
    ]
    for r in d.itertuples():
        layers[0][(r.lang, r.n_chars)].append(r.doc_id)
        layers[1][(r.source, r.n_chars % 5)].append(r.doc_id)
    pairs = set()
    for blocks in layers:
        for ids_ in blocks.values():
            ids_ = sorted(ids_)
            for i, a in enumerate(ids_):
                hi = len(ids_) if window is None else min(
                    len(ids_), i + 1 + window
                )
                for b in ids_[i + 1 : hi]:
                    pairs.add((a, b))
    from collections import defaultdict as dd

    adj = dd(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    return pairs, adj


def test_intent_qs222_jaccard_link_prediction(spark, sf_dir):
    pairs, adj = _two_layer_graph(sf_dir)
    ref = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in pairs:
                continue
            common = len(adj[u] & adj[v])
            if common:
                ref[(u, v)] = (
                    common,
                    common * 1_000_000 // (len(adj[u]) + len(adj[v]) - common),
                )
    out = _run(spark, sf_dir, "qs222_jaccard_link_prediction")
    got = {
        (r["u"], r["v"]): (r["common_nbrs"], r["jaccard_e6"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs334_adamic_adar(spark, sf_dir):
    pairs, adj = _two_layer_graph(sf_dir, window=12)
    ref = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in pairs:
                continue
            common = adj[u] & adj[v]
            if common:
                aa = sum(1.0 / math.log(len(adj[z])) for z in common)
                ref[(u, v)] = (len(common), aa)
    out = _run(spark, sf_dir, "qs334_adamic_adar")
    got = {
        (r["u"], r["v"]): (r["common_nbrs"], r["adamic_adar"])
        for _, r in out.iterrows()
    }
    assert set(got) == set(ref)
    for k, (cn, aa) in ref.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - aa) <= 2e-4


def test_intent_qs285_clustering_coefficient(spark, sf_dir):
    # Supplier co-order graph with edge support >= 2; per-node
    # cc = 2t / d(d-1) over nodes with d >= 2; transitivity =
    # 3*triangles / wedges (both from first principles).
    li = _pd(sf_dir, "lineitem")
    os_ = li[["l_orderkey", "l_suppkey"]].drop_duplicates()
    from collections import defaultdict

    per_order = defaultdict(list)
    for r in os_.itertuples():
        per_order[r.l_orderkey].append(r.l_suppkey)
    support = defaultdict(int)
    for sup in per_order.values():
        sup = sorted(set(sup))
        for i, a in enumerate(sup):
            for b in sup[i + 1 :]:
                support[(a, b)] += 1
    edges = {p for p, n in support.items() if n >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri_per_node = defaultdict(int)
    n_tri = 0
    for a, b in edges:
        for z in adj[a] & adj[b]:
            if z > b:  # each triangle counted once via its max node
                n_tri += 1
                tri_per_node[a] += 1
                tri_per_node[b] += 1
                tri_per_node[z] += 1
    eligible = [v for v in adj if len(adj[v]) >= 2]
    ccs = [
        2.0 * tri_per_node[v] / (len(adj[v]) * (len(adj[v]) - 1))
        for v in eligible
    ]
    wedges2 = sum(len(adj[v]) * (len(adj[v]) - 1) for v in eligible)
    out = _run(spark, sf_dir, "qs285_clustering_coefficient").iloc[0]
    assert out["n_nodes"] == len(eligible)
    assert out["n_edges"] == len(edges)
    assert out["n_triangles"] == n_tri
    assert abs(out["avg_clustering"] - np.mean(ccs)) <= 2e-4
    assert abs(out["transitivity"] - 3.0 * n_tri / wedges2) <= 2e-4


# -- wave 14 (r12): dedup + hash-sampling family --------------------------
# The md5-keyed constructions (minhash slices, simhash votes, bucket
# keys, Efraimidis-Spirakis priorities) recomputed with hashlib from
# the documented definitions — independent of both engines' md5/expr
# trees.

import hashlib


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_intent_qs54_exact_dedup(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    ref = {}
    for r in d.itertuples():
        h = _md5(r.text)
        mn, n = ref.get(h, (r.doc_id, 0))
        ref[h] = (min(mn, r.doc_id), n + 1)
    out = _run(spark, sf_dir, "qs54_exact_dedup")
    got = {
        r["content_hash"]: (r["doc_id"], r["n_copies"])
        for _, r in out.iterrows()
    }
    assert got == ref


def _shingles(text, k=3, lower=False):
    toks = (text.lower() if lower else text).split(" ")
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_intent_qs55_minhash_lsh(spark, sf_dir):
    # 12 sliced-md5 minhashes -> 4 band keys -> bucket candidates ->
    # exact-Jaccard refine at 0.5, all rebuilt with hashlib.
    d = _pd(sf_dir, "documents")
    sh = {r.doc_id: _shingles(r.text) for r in d.itertuples()}
    sigs = {}
    for did, ss in sh.items():
        if not ss:
            continue
        sigs[did] = [
            min(
                _md5(f"p{j // 4}|" + s)[8 * (j % 4) : 8 * (j % 4) + 8]
                for s in ss
            )
            for j in range(12)
        ]
    from collections import defaultdict

    buckets = defaultdict(list)
    for did, sg in sigs.items():
        for b in range(4):
            key = _md5(",".join(sg[3 * b : 3 * b + 3]))
            buckets[(b, key)].append(did)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cands.add((a, b))
    ref = {}
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        jac = inter / union if union else 0.0
        if jac >= 0.5:
            ref[(a, b)] = jac
    out = _run(spark, sf_dir, "qs55_minhash_lsh_pairs")
    got = {(r["d1"], r["d2"]): r["jac"] for _, r in out.iterrows()}
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert abs(got[k] - v) <= 1e-9


def test_intent_qs56_simhash(spark, sf_dir):
    import re

    d = _pd(sf_dir, "documents")
    ref = {}
    for r in d.itertuples():
        toks = set(re.split(r"\s+", r.text.lower()))
        fp = 0
        for i in range(16):
            vote = sum(
                1 if (int(_md5(t)[:8], 16) >> i) & 1 else -1 for t in toks
            )
            if vote > 0:
                fp |= 1 << i
        ref[r.doc_id] = fp
    out = _run(spark, sf_dir, "qs56_simhash")
    got = dict(zip(out["doc_id"], out["simhash"]))
    assert got == ref


def test_intent_qs57_ngram_jaccard(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in d.itertuples():
        blocks[(r.lang, r.n_chars // 64)].append(
            (r.doc_id, _shingles(r.text))
        )
    ref = {}
    for ids in blocks.values():
        ids = sorted(ids)
        for i, (a, sa) in enumerate(ids):
            for b, sb in ids[i + 1 :]:
                union = len(sa | sb)
                jac = len(sa & sb) / union if union else 0.0
                if jac >= 0.5:
                    ref[(a, b)] = jac
    out = _run(spark, sf_dir, "qs57_ngram_jaccard_pairs")
    got = {(r["d1"], r["d2"]): r["jac"] for _, r in out.iterrows()}
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert abs(got[k] - v) <= 1e-9


def test_intent_qs58_embedding_neardup(spark, sf_dir):
    ids, V, labels = _emb(sf_dir)
    norm = np.linalg.norm(V, axis=1)
    ref = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and labels[i] == labels[j]:
                cos = float(V[i] @ V[j] / (norm[i] * norm[j]))
                if cos >= 0.4:
                    ref[(ids[i], ids[j])] = cos
    out = _run(spark, sf_dir, "qs58_embedding_neardup")
    got = {(r["d1"], r["d2"]): r["cos"] for _, r in out.iterrows()}
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert abs(got[k] - v) <= 2e-4


def _bucket(key, salt) -> int:
    return int(_md5(f"{key}|{salt}")[:8], 16) % 1_000_000


def test_intent_qs65_hash_sample(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    ref = sorted(
        did for did in d["doc_id"] if _bucket(did, "sample") < 100_000
    )
    out = _run(spark, sf_dir, "qs65_hash_sample")
    assert list(out["doc_id"]) == ref


def test_intent_qs66_hash_split(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    cents = _cents(o["o_totalprice"])
    agg = {}
    for k, c in zip(o["o_orderkey"], cents):
        bk = _bucket(k, "split")
        s = "train" if bk < 800_000 else ("val" if bk < 900_000 else "test")
        n, t = agg.get(s, (0, 0))
        agg[s] = (n + 1, t + int(c))
    out = _run(spark, sf_dir, "qs66_hash_split")
    got = {r["split"]: (r["n"], r["cents"]) for _, r in out.iterrows()}
    assert got == agg


def test_intent_qs67_stratified_sample(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    rate = {"en": 200_000, "de": 800_000, "zh": 800_000}
    ref = sorted(
        (r.doc_id, r.lang)
        for r in d.itertuples()
        if _bucket(r.doc_id, "strata") < rate.get(r.lang, 500_000)
    )
    out = _run(spark, sf_dir, "qs67_stratified_sample")
    assert [tuple(x) for x in out[["doc_id", "lang"]].to_numpy()] == ref


def test_intent_qs97_weighted_sample(spark, sf_dir):
    # Efraimidis-Spirakis: priority = u^(1/w), u = (bucket+0.5)/1e6.
    d = _pd(sf_dir, "documents")
    pri = [
        (
            -(((_bucket(r.doc_id, "ws") + 0.5) / 1e6) ** (1.0 / r.n_chars)),
            r.doc_id,
        )
        for r in d.itertuples()
        if r.n_chars > 0
    ]
    ref = [did for _p, did in sorted(pri)[:50]]
    out = _run(spark, sf_dir, "qs97_weighted_sample")
    assert sorted(out["doc_id"]) == sorted(ref)


def test_intent_qs82_sequence_packing(spark, sf_dir):
    # Concat-and-chunk at 256 tokens per language, docs in doc_id
    # order; one row per (doc, chunk) overlap.
    d = _pd(sf_dir, "documents").sort_values("doc_id")
    ref = set()
    cum = {}
    for r in d.itertuples():
        n = len(r.text.split(" "))
        if n <= 0:
            continue
        before = cum.get(r.lang, 0)
        cum[r.lang] = before + n
        for chunk in range(before // 256, (before + n - 1) // 256 + 1):
            ref.add((r.lang, r.doc_id, chunk, n, before))
    out = _run(spark, sf_dir, "qs82_sequence_packing")
    got = {
        (r["lang"], r["doc_id"], r["chunk_id"], r["n_tokens"], r["cum_before"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs83_decontaminate(spark, sf_dir):
    # Distinct 3-gram overlap of each corpus doc against the probe
    # set's shingle union (lowercase tokens), contaminated docs only.
    d = _pd(sf_dir, "documents")
    probe_sh = set()
    for r in d.itertuples():
        if r.doc_id % 101 == 0:
            probe_sh |= _shingles(r.text, lower=True)
    ref = {}
    for r in d.itertuples():
        if r.doc_id % 101 == 0:
            continue
        ss = _shingles(r.text, lower=True)
        shared = len(ss & probe_sh)
        if shared:
            ref[r.doc_id] = (shared, len(ss))
    out = _run(spark, sf_dir, "qs83_decontaminate")
    got = {
        r["doc_id"]: (r["n_shared"], r["n_shingles"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs105_cap_per_group(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    per = defaultdict(list)
    for r in d.itertuples():
        per[r.source].append((_md5(str(r.doc_id)), r.doc_id))
    ref = set()
    for src, lst in per.items():
        for pos, (_h, did) in enumerate(sorted(lst)[:5], start=1):
            ref.add((src, did, pos))
    out = _run(spark, sf_dir, "qs105_cap_per_group")
    got = {
        (r["source"], r["doc_id"], r["pos"]) for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs180_clamped_balance(spark, sf_dir):
    # The sequential definition b_t = max(0, b_{t-1} + d_t), stepped
    # row by row in python — the closed-form window formulation must
    # reproduce it exactly.
    e = _pd(sf_dir, "events")
    e = e[e["event_type"].isin(["purchase", "error"])].copy()
    e["d"] = np.where(
        (e["event_type"] == "purchase").to_numpy(),
        _cents(e["value"]),
        -_cents(e["value"]),
    )
    ref = {}
    for _uid, g in e.groupby("user_id"):
        bal = 0
        for r in g.sort_values(["ts", "event_id"]).itertuples():
            bal = max(0, bal + int(r.d))
            ref[r.event_id] = bal
    out = _run(spark, sf_dir, "qs180_clamped_balance")
    got = dict(zip(out["event_id"], out["balance_cents"]))
    assert got == ref


# -- wave 15 (r12): the qs383-qs392 additions ------------------------------


def _prio_status_cells_pd(sf_dir):
    o = _pd(sf_dir, "orders")
    x = o["o_orderpriority"].str[0].astype(int)
    y = o["o_orderstatus"].map({"F": 1, "O": 2}).fillna(3).astype(int)
    return pd.crosstab(x, y)


def _conc_disc_pd(ct):
    conc = disc = 0
    rows, cols = ct.index.to_list(), ct.columns.to_list()
    for xi in rows:
        for yi in cols:
            c = int(ct.loc[xi, yi])
            for xj in rows:
                for yj in cols:
                    if xj > xi:
                        if yj > yi:
                            conc += c * int(ct.loc[xj, yj])
                        elif yj < yi:
                            disc += c * int(ct.loc[xj, yj])
    return conc, disc


def test_intent_qs383_somers_d(spark, sf_dir):
    ct = _prio_status_cells_pd(sf_dir)
    conc, disc = _conc_disc_pd(ct)
    n = int(ct.values.sum())
    tx2 = int((ct.sum(axis=1) ** 2).sum())
    ty2 = int((ct.sum(axis=0) ** 2).sum())
    out = _run(spark, sf_dir, "qs383_somers_d").iloc[0]
    assert (out["concordant"], out["discordant"]) == (conc, disc)
    assert abs(out["d_yx"] - 2 * (conc - disc) / (n * n - tx2)) <= 2e-6
    assert abs(out["d_xy"] - 2 * (conc - disc) / (n * n - ty2)) <= 2e-6


def test_intent_qs384_stuart_tau_c(spark, sf_dir):
    ct = _prio_status_cells_pd(sf_dir)
    conc, disc = _conc_disc_pd(ct)
    n = int(ct.values.sum())
    m = min(ct.shape)
    out = _run(spark, sf_dir, "qs384_stuart_tau_c").iloc[0]
    assert abs(
        out["tau_c"] - 2 * m * (conc - disc) / (n * n * (m - 1))
    ) <= 2e-6


def test_intent_qs385_scott_pi(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    g = li.groupby("l_orderkey")
    two = g.filter(lambda x: len(x) == 2)
    two = two.copy()
    two["ok"] = two["l_linenumber"] * 4 + two["l_returnflag"].map(
        {"A": 0, "N": 1}
    ).fillna(2).astype(int)
    two = two.sort_values(["l_orderkey", "ok"], kind="mergesort")
    a = two.groupby("l_orderkey")["l_returnflag"].first()
    b = two.groupby("l_orderkey")["l_returnflag"].last()
    n = len(a)
    po = float((a.to_numpy() == b.to_numpy()).mean())
    pe = sum(
        ((a == f).sum() + (b == f).sum()) ** 2 for f in ("R", "N", "A")
    ) / (4.0 * n * n)
    out = _run(spark, sf_dir, "qs385_scott_pi").iloc[0]
    assert out["n_subjects"] == n
    assert abs(out["po"] - po) <= 2e-6
    assert abs(out["scott_pi"] - (po - pe) / (1 - pe)) <= 2e-6


def test_intent_qs386_yule_q(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    a = (o["o_totalprice"] >= 150000).to_numpy()
    b = (o["o_orderpriority"].str[0].astype(int) <= 2).to_numpy()
    n11 = int((a & b).sum())
    n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum())
    n00 = int((~a & ~b).sum())
    out = _run(spark, sf_dir, "qs386_yule_q").iloc[0]
    assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (
        n11, n10, n01, n00,
    )
    ad, bc = n11 * n00, n10 * n01
    assert abs(out["yule_q"] - (ad - bc) / (ad + bc)) <= 2e-6
    assert abs(out["odds_ratio"] - ad / bc) <= 2e-6
    # identity Q = (OR-1)/(OR+1)
    orr = out["odds_ratio"]
    assert abs(out["yule_q"] - (orr - 1) / (orr + 1)) <= 1e-4


def _daily_two_segments_pd(sf_dir):
    o = _pd(sf_dir, "orders")
    c = _pd(sf_dir, "customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    j["cents"] = _cents(j["o_totalprice"])
    d = (
        j.groupby(["c_mktsegment", j["o_orderdate"].dt.date])["cents"]
        .sum()
        .reset_index()
    )
    d.columns = ["seg", "d", "y"]
    return d


def test_intent_qs387_ansari_bradley(spark, sf_dir):
    d = _daily_two_segments_pd(sf_dir)
    d = d.sort_values(["y", "seg", "d"]).reset_index(drop=True)
    N = len(d)
    rk = np.arange(1, N + 1)
    scores = np.minimum(rk, N + 1 - rk)
    is1 = (d["seg"] == "BUILDING").to_numpy()
    n1, n2 = int(is1.sum()), int((~is1).sum())
    ab = int(scores[is1].sum())
    if N % 2 == 0:
        mean = n1 * (N + 2) / 4.0
        var = n1 * n2 * (N + 2) * (N - 2) / (48.0 * (N - 1))
    else:
        mean = n1 * (N + 1) ** 2 / (4.0 * N)
        var = n1 * n2 * (N + 1) * (3 + N * N) / (48.0 * N * N)
    out = _run(spark, sf_dir, "qs387_ansari_bradley").iloc[0]
    assert (out["n1"], out["n2"], out["ab_stat"]) == (n1, n2, ab)
    assert abs(out["z"] - (ab - mean) / math.sqrt(var)) <= 2e-4


def test_intent_qs388_ww_runs(spark, sf_dir):
    d = _daily_two_segments_pd(sf_dir)
    d = d.sort_values(["y", "seg", "d"]).reset_index(drop=True)
    segs = d["seg"].to_numpy()
    runs = 1 + int((segs[1:] != segs[:-1]).sum())
    n1 = int((segs == "BUILDING").sum())
    n2 = int((segs == "MACHINERY").sum())
    N = n1 + n2
    mean = 2.0 * n1 * n2 / N + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - N) / (N * N * (N - 1))
    out = _run(spark, sf_dir, "qs388_ww_runs").iloc[0]
    assert (out["n1"], out["n2"], out["runs"]) == (n1, n2, runs)
    assert abs(out["z"] - (runs - mean) / math.sqrt(var)) <= 2e-4


def test_intent_qs389_mrr(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    toks = {
        r.doc_id: set(t for t in r.text.lower().split(" ") if t)
        for r in d.itertuples()
    }
    src = dict(zip(d["doc_id"], d["source"]))
    qids = [i for i in d["doc_id"] if i % 50 == 0]
    sum_rr = h1 = h3 = h10 = 0
    for qid in qids:
        scored = sorted(
            (
                (-len(toks[qid] & toks[cid]), cid)
                for cid in d["doc_id"]
                if cid != qid and len(toks[qid] & toks[cid]) > 0
            ),
        )
        fr = None
        for rank, (_s, cid) in enumerate(scored, start=1):
            if src[cid] == src[qid]:
                fr = rank
                break
        if fr is not None:
            sum_rr += 1_000_000 // fr
            h1 += fr == 1
            h3 += fr <= 3
            h10 += fr <= 10
    out = _run(spark, sf_dir, "qs389_mrr_eval").iloc[0]
    assert out["n_queries"] == len(qids)
    assert (out["hits_at_1"], out["hits_at_3"], out["hits_at_10"]) == (
        h1, h3, h10,
    )
    assert out["mrr_e6"] == sum_rr // len(qids)


def test_intent_qs390_kpss(spark, sf_dir):
    # Plain float KPSS from the definition: partial sums of the
    # demeaned series over the Bartlett(l=4) long-run variance.
    o = _pd(sf_dir, "orders")
    t = (o["o_orderdate"].dt.year - 1992) * 12 + o["o_orderdate"].dt.month
    y = (
        pd.DataFrame({"t": t, "c": _cents(o["o_totalprice"])})
        .groupby("t")["c"]
        .sum()
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    N = len(y)
    e = y - y.mean()
    S = np.cumsum(e)
    lrv = (e @ e) / N
    for j in range(1, 5):
        lrv += 2 * (1 - j / 5.0) * (e[j:] @ e[:-j]) / N
    kpss = (S @ S) / (N * N * lrv)
    out = _run(spark, sf_dir, "qs390_kpss").iloc[0]
    assert out["n_months"] == N
    assert abs(out["kpss_stat"] - kpss) <= 2e-6


def test_intent_qs391_wasserstein(spark, sf_dir):
    d = _daily_two_segments_pd(sf_dir)
    x1 = np.sort(d[d["seg"] == "BUILDING"]["y"].to_numpy())
    x2 = np.sort(d[d["seg"] == "MACHINERY"]["y"].to_numpy())
    grid = np.unique(np.concatenate([x1, x2]))
    w1 = 0.0
    for lo, hi in zip(grid[:-1], grid[1:]):
        f1 = np.searchsorted(x1, lo, side="right") / len(x1)
        f2 = np.searchsorted(x2, lo, side="right") / len(x2)
        w1 += abs(f1 - f2) * (hi - lo)
    out = _run(spark, sf_dir, "qs391_wasserstein").iloc[0]
    assert (out["n1"], out["n2"]) == (len(x1), len(x2))
    assert abs(out["w1_dollars"] - w1 / 100.0) <= 2e-4


def test_intent_qs392_lorenz_asymmetry(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    x = np.sort(
        _cents(c[c["c_acctbal"] > 0]["c_acctbal"]).astype(float)
    )
    n, mu = len(x), x.mean()
    m = int((x < mu).sum())
    xm, xm1 = x[m - 1], x[m]
    delta = (mu - xm) / (xm1 - xm)
    lac = (m + delta) / n + (x[:m].sum() + delta * xm1) / x.sum()
    out = _run(spark, sf_dir, "qs392_lorenz_asymmetry").iloc[0]
    assert out["n"] == n
    assert out["n_below_mean"] == m
    assert abs(out["lorenz_asymmetry"] - lac) <= 2e-6


# -- wave 16 (r12): blocking/graph/streaming-batch family ------------------


def test_intent_qs51_dedup_blocking(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in d.itertuples():
        blocks[(r.lang, r.n_chars)].append(r.doc_id)
    pairs = []
    for ids in blocks.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                pairs.append((a, b))
    ref = sorted(pairs)[:100]
    out = _run(spark, sf_dir, "qs51_dedup_blocking")
    assert [tuple(x) for x in out[["d1", "d2"]].to_numpy()] == ref


def test_intent_qs64_salted_agg(spark, sf_dir):
    # The salted two-level aggregation must equal the plain groupby.
    o = _pd(sf_dir, "orders")
    g = o.groupby("o_custkey")
    ref = {
        k: (len(v), round(_cents(v["o_totalprice"]).sum() / 100.0, 2))
        for k, v in g
    }
    out = _run(spark, sf_dir, "qs64_salted_agg")
    got = {
        r["o_custkey"]: (r["n"], round(r["total"], 2))
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs81_connected_dedup(spark, sf_dir):
    # Union-find over the blocking graph; canonical id = component min.
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in d.itertuples():
        blocks[(r.lang, r.n_chars)].append(r.doc_id)
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for ids in blocks.values():
        if len(ids) < 2:
            continue
        for i in ids:
            parent.setdefault(i, i)
            nodes.add(i)
        root = ids[0]
        for i in ids[1:]:
            ra, rb = find(root), find(i)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    ref = {v: find(v) for v in nodes}
    out = _run(spark, sf_dir, "qs81_connected_dedup")
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == ref


def test_intent_qs89_repetition_signal(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import Counter

    ref = {}
    for r in d.itertuples():
        toks = r.text.lower().split(" ")
        if len(toks) < 2:
            continue
        c = Counter(
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        )
        top = max(c.values())
        n = sum(c.values())
        ref[r.doc_id] = (top, n, top / n)
    out = _run(spark, sf_dir, "qs89_repetition_signal")
    got = {
        r["doc_id"]: (r["top_cnt"], r["n_grams"], r["top_fraction"])
        for _, r in out.iterrows()
    }
    assert set(got) == set(ref)
    for k, (t, n, f) in ref.items():
        assert got[k][0] == t and got[k][1] == n
        assert abs(got[k][2] - f) <= 1e-12


def _supplier_edges_pd(sf_dir, min_support):
    li = _pd(sf_dir, "lineitem")
    from collections import defaultdict

    per_order = defaultdict(set)
    for r in li.itertuples():
        per_order[r.l_orderkey].add(r.l_suppkey)
    support = defaultdict(int)
    for sup in per_order.values():
        sup = sorted(sup)
        for i, a in enumerate(sup):
            for b in sup[i + 1 :]:
                support[(a, b)] += 1
    # NOTE: pair support counts co-ORDER rows; lineitem may repeat a
    # supplier inside an order — the queries count joined row pairs.
    support2 = defaultdict(int)
    per_order_rows = defaultdict(list)
    for r in li.itertuples():
        per_order_rows[r.l_orderkey].append(r.l_suppkey)
    for rows in per_order_rows.values():
        for i, a in enumerate(rows):
            for b in rows:
                if a < b:
                    support2[(a, b)] += 1
    return {p for p, n in support2.items() if n >= min_support}


def test_intent_qs108_triangle_count(spark, sf_dir):
    edges = _supplier_edges_pd(sf_dir, 3)
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for a, b in edges:
        for z in adj[a] & adj[b]:
            if z > b:
                tri[a] += 1
                tri[b] += 1
                tri[z] += 1
    out = _run(spark, sf_dir, "qs108_triangle_count")
    got = dict(zip(out["node"], out["triangles"]))
    assert got == dict(tri)


def test_intent_qs119_bigram_lm(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import Counter

    docs = {}
    cbg, cctx = Counter(), Counter()
    vocab = set()
    for r in d.itertuples():
        ts = [t for t in r.text.lower().split(" ") if t]
        vocab.update(ts)
        bgs = list(zip(ts, ts[1:]))
        docs[r.doc_id] = bgs
        for bg in bgs:
            cbg[bg] += 1
            cctx[bg[0]] += 1
    V = len(vocab)
    out = _run(spark, sf_dir, "qs119_bigram_lm")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for _, r in out.iterrows()
    }
    ref = {
        did: (
            len(bgs),
            np.mean(
                [math.log((cbg[bg] + 1.0) / (cctx[bg[0]] + V)) for bg in bgs]
            ),
        )
        for did, bgs in docs.items()
        if bgs
    }
    assert set(got) == set(ref)
    for k, (n, lp) in ref.items():
        assert got[k][0] == n
        assert abs(got[k][1] - lp) <= 2e-4


def test_intent_qs195_islands(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    mi = (
        li["l_shipdate"].dt.year * 12 + li["l_shipdate"].dt.month
    )
    months = set(zip(li["l_suppkey"], mi))
    from collections import defaultdict

    per = defaultdict(list)
    for s, m in months:
        per[s].append(m)
    ref = {}
    for s, ms in per.items():
        ms = sorted(ms)
        islands = []
        run = 1
        for a, b in zip(ms, ms[1:]):
            if b == a + 1:
                run += 1
            else:
                islands.append(run)
                run = 1
        islands.append(run)
        ref[s] = (len(islands), max(islands), sum(islands))
    out = _run(spark, sf_dir, "qs195_supplier_activity_islands")
    got = {
        r["l_suppkey"]: (
            r["n_islands"], r["longest_months"], r["active_months"],
        )
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs196_embedding_drift(spark, sf_dir):
    ids, V, labels = _emb(sf_dir)
    Ve6 = np.round(V * 1_000_000).astype(np.int64)
    out = _run(spark, sf_dir, "qs196_embedding_drift")
    for _, r in out.iterrows():
        m0 = (labels == r["label"]) & (ids % 2 == 0)
        m1 = (labels == r["label"]) & (ids % 2 == 1)
        assert (r["n0"], r["n1"]) == (int(m0.sum()), int(m1.sum()))
        diff = Ve6[m0].mean(axis=0) - Ve6[m1].mean(axis=0)
        assert abs(
            r["centroid_dist"] - math.sqrt((diff ** 2).sum()) / 1e6
        ) <= 2e-4


def test_intent_qs242_cusum(spark, sf_dir):
    e = _pd(sf_dir, "events")
    e = e.copy()
    e["day"] = e["ts"].dt.date
    e["x"] = _cents(e["value"])
    daily = e.groupby(["event_type", "day"])["x"].sum().reset_index()
    out = _run(spark, sf_dir, "qs242_cusum_drift")
    got = {
        r["event_type"]: (r["peak_day"], r["cusum_peak"])
        for _, r in out.iterrows()
    }
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        x = g["x"].to_numpy()
        n = len(x)
        tot = x.sum()
        cum = np.cumsum(x)
        i = np.arange(1, n + 1)
        t = np.abs(n * cum - i * tot)
        best = int(np.argmax(t))  # np.argmax returns FIRST max = earliest day
        peak_day, peak = got[et]
        assert str(peak_day) == str(g["day"].iloc[best])
        assert abs(peak - t[best] / (n * 100.0)) <= 0.02


def test_intent_qs248_kmeans_update(spark, sf_dir):
    ids, V, _ = _emb(sf_dir)
    cents = {int(i): V[ids == i][0] for i in ids if i < 8}
    norm = np.linalg.norm(V, axis=1)
    assign = {}
    for k, vi in enumerate(ids):
        best = min(
            (
                -round(
                    float(
                        V[k] @ cents[c]
                        / (norm[k] * np.linalg.norm(cents[c]))
                    ),
                    6,
                ),
                c,
            )
            for c in cents
        )
        assign.setdefault(best[1], []).append(k)
    out = _run(spark, sf_dir, "qs248_kmeans_update")
    assert len(out) == len(assign)
    for _, r in out.iterrows():
        rows = assign[r["cid"]]
        assert r["n_assigned"] == len(rows)
        for j, col in enumerate(("c1", "c2", "c3")):
            assert abs(V[rows, j].mean() - r[col]) <= 2e-4


def test_intent_qs260_hits(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    li = _pd(sf_dir, "lineitem")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    edges = set(zip(j["o_custkey"], j["l_suppkey"]))
    from collections import defaultdict

    a1 = defaultdict(int)
    for c, s in edges:
        a1[s] += 1
    h1 = defaultdict(int)
    for c, s in edges:
        h1[c] += a1[s]
    a2 = defaultdict(int)
    for c, s in edges:
        a2[s] += h1[c]
    top = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = _run(spark, sf_dir, "qs260_hits_scores")
    assert [
        (r["node"], r["authority"]) for _, r in out.iterrows()
    ] == top


def test_intent_qs68_interleave(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    web_srcs = {f"src{i}" for i in range(10)}
    ref = []
    for r in d.itertuples():
        if r.source in web_srcs:
            if _bucket(r.doc_id, "mix|web") < 250_000:
                ref.append((r.doc_id, "web"))
        else:
            ref.append((r.doc_id, "curated"))
    ref = sorted(ref)
    out = _run(spark, sf_dir, "qs68_interleave_sources")
    assert [
        tuple(x) for x in out[["doc_id", "source_ds"]].to_numpy()
    ] == ref


# -- wave 17 (r12): portable-sketch + containment + scorecard family -------
# The md5-derived sketch structures (CMS counters, HLL registers,
# hyperplane sign bits, minhash slices) recomputed with hashlib from
# their documented definitions.


def test_intent_qs110_cms_sketch(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import Counter

    ref = Counter()
    for text in d["text"]:
        for term in text.lower().split(" "):
            if term:
                for j in range(4):
                    ref[(j, int(_md5(f"{j}:{term}")[:8], 16) % 64)] += 1
    out = _run(spark, sf_dir, "qs110_cms_sketch")
    got = {
        (r["j"], r["bucket"]): r["cnt"] for _, r in out.iterrows()
    }
    assert got == dict(ref)


def test_intent_qs111_segment_dedup(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    docfreq = defaultdict(set)
    for r in d.itertuples():
        for seg in r.text.split(" "):
            if seg:
                docfreq[seg].add(r.doc_id)
    blocked = {s for s, docs in docfreq.items() if len(docs) >= 100}
    ref = {}
    for r in d.itertuples():
        kept = [s for s in r.text.split(" ") if s and s not in blocked]
        ref[r.doc_id] = (" ".join(kept), len(kept))
    out = _run(spark, sf_dir, "qs111_segment_dedup")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs122_minhash_signatures(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    ref = {}
    for r in d.itertuples():
        ss = _shingles(r.text)  # 3-token shingles, original case
        if not ss:
            continue
        sig = [
            min(
                _md5(f"p{j // 4}|" + s)[8 * (j % 4) : 8 * (j % 4) + 8]
                for s in ss
            )
            for j in range(12)
        ]
        ref[r.doc_id] = ",".join(sig)
    out = _run(spark, sf_dir, "qs122_minhash_signatures")
    got = dict(zip(out["doc_id"], out["sig_csv"]))
    assert got == ref


def _hll_estimate_py(values, p=10):
    m = 1 << p
    regs = {}
    for v in values:
        h = _md5(str(v))
        idx = int(h[:8], 16) % m
        w = int(h[8:16], 16)
        rank = 33 if w == 0 else 33 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rank)
    sp = sum(1 << (40 - r) for r in regs.values())
    v0 = m - len(regs)
    s_scaled = float(sp + v0 * (1 << 40))
    alpha_num = (0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << 40)
    e_raw = alpha_num / s_scaled
    if e_raw <= 2.5 * m and v0 > 0:
        return round(m * math.log(m / float(v0)))
    return round(e_raw)


def test_intent_qs90_hll_distinct(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    out = _run(spark, sf_dir, "qs90_hll_distinct_sketch")
    got = dict(zip(out["l_returnflag"], out["estimate"]))
    for flag, g in li.groupby("l_returnflag"):
        est = _hll_estimate_py(g["l_orderkey"].tolist())
        assert got[flag] == est
        # sketch sanity: p=10 standard error is ~3.25%; this draw's
        # worst flag sits at 10.8% — a 15% band catches gross breakage
        # without flaking on the tail
        true = g["l_orderkey"].nunique()
        assert abs(est - true) <= 0.15 * true


def test_intent_qs112_lsh_buckets(spark, sf_dir):
    # Hyperplane signs from md5 parity (seed:bit:dim first digest
    # byte & 1), bucket = sum of sign-projection bits.
    ids, V, _ = _emb(sf_dir)
    signs = np.array(
        [
            [
                1
                if hashlib.md5(f"0:{i}:{d}".encode()).digest()[0] & 1
                else -1
                for d in range(64)
            ]
            for i in range(8)
        ],
        dtype=np.float64,
    )
    from collections import defaultdict

    buckets = defaultdict(list)
    for k, vid in enumerate(ids):
        b = 0
        for i in range(8):
            # same left-to-right summation; float64 exactness is not
            # required for the sign at these magnitudes
            if float(signs[i] @ V[k]) >= 0:
                b |= 1 << i
        buckets[b].append(vid)
    out = _run(spark, sf_dir, "qs112_lsh_buckets")
    got = {
        r["bucket"]: (r["n"], r["min_id"]) for _, r in out.iterrows()
    }
    ref = {b: (len(v), min(v)) for b, v in buckets.items()}
    assert got == ref


def test_intent_qs137_heavy_hitters(spark, sf_dir):
    # CMS candidates over-approximate; the exact refine means the
    # final set IS the exact heavy-hitter set (cnt * 1000 >= N).
    d = _pd(sf_dir, "documents")
    from collections import Counter

    c = Counter()
    for text in d["text"]:
        for t in text.lower().split(" "):
            if t:
                c[t] += 1
    n = sum(c.values())
    ref = {t: k for t, k in c.items() if k * 1000 >= n}
    out = _run(spark, sf_dir, "qs137_sketch_heavy_hitters")
    got = dict(zip(out["tok"], out["cnt"]))
    assert got == ref


def test_intent_qs341_shingle_containment(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in d.itertuples():
        ss = _shingles(r.text)  # original-case trigrams
        if ss:
            blocks[(r.lang, r.n_chars // 64)].append((r.doc_id, ss))
    ref = {}
    for ids in blocks.values():
        ids.sort()
        for i, (a, sa) in enumerate(ids):
            for b, sb in ids[i + 1 : i + 1 + 48]:
                inter = len(sa & sb)
                if 2 * inter >= len(sa) or 2 * inter >= len(sb):
                    ref[(a, b)] = (
                        inter,
                        inter * 10000 // len(sa),
                        inter * 10000 // len(sb),
                    )
    out = _run(spark, sf_dir, "qs341_shingle_containment")
    got = {
        (r["d1"], r["d2"]): (r["n_common"], r["cont12_bp"], r["cont21_bp"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs300_scorecard(spark, sf_dir):
    import re

    o = _pd(sf_dir, "orders")
    li = _pd(sf_dir, "lineitem")
    c = _pd(sf_dir, "customer")
    d = _pd(sf_dir, "documents")
    out = _run(spark, sf_dir, "qs300_validation_scorecard").iloc[0]
    assert out["n_orders"] == len(o)
    assert out["n_lineitems"] == len(li)
    assert out["n_customers"] == len(c)
    okeys = set(o["o_orderkey"])
    assert out["orphan_lineitems"] == int(
        (~li["l_orderkey"].isin(okeys)).sum()
    )
    assert out["dup_order_keys"] == int(
        (o["o_orderkey"].value_counts() > 1).sum()
    )
    assert out["null_custkeys"] == int(o["o_custkey"].isna().sum())
    j = li.merge(
        o[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    assert out["ship_before_order"] == int(
        (j["l_shipdate"] < j["o_orderdate"]).sum()
    )
    pat = re.compile(r"[0-9]{3}-[0-9]{2}-[0-9]{4}")
    assert out["ssn_like_docs"] == sum(
        1 for t in d["text"] if pat.search(t)
    )
    assert out["negative_balances"] == int((c["c_acctbal"] < 0).sum())


# -- wave 18 (r12): sketch composition + leakage + anonymization -----------


def test_intent_qs143_hll_registers(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    ref = {}
    for flag, g in li.groupby("l_returnflag"):
        for v in g["l_orderkey"]:
            h = _md5(str(v))
            idx = int(h[:8], 16) % 256
            w = int(h[8:16], 16)
            r = 33 if w == 0 else 33 - w.bit_length()
            k = (flag, idx)
            ref[k] = max(ref.get(k, 0), r)
    out = _run(spark, sf_dir, "qs143_hll_register_table")
    got = {
        (r["l_returnflag"], r["idx"]): r["r"] for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs144_dsir_weights(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import Counter, defaultdict

    raw_b, tgt_b = Counter(), Counter()
    doc_b = defaultdict(Counter)
    n_raw = n_tgt = 0
    for r in d.itertuples():
        for t in r.text.lower().split(" "):
            if not t:
                continue
            b = int(_md5(t)[:8], 16) % 256
            raw_b[b] += 1
            n_raw += 1
            doc_b[r.doc_id][b] += 1
            if r.lang == "en":
                tgt_b[b] += 1
                n_tgt += 1
    lr = {
        b: round(
            math.log(
                ((tgt_b.get(b, 0) + 1) / (n_tgt + 256))
                / ((c + 1) / (n_raw + 256))
            )
            * 1_000_000
        )
        for b, c in raw_b.items()
    }
    out = _run(spark, sf_dir, "qs144_dsir_importance_weights")
    got = {
        r["doc_id"]: (r["weight_e6"], r["n_tokens"])
        for _, r in out.iterrows()
    }
    ref = {
        did: (
            sum(k * lr[b] for b, k in bs.items()),
            sum(bs.values()),
        )
        for did, bs in doc_b.items()
    }
    assert got == ref


def test_intent_qs170_hll_intersection(spark, sf_dir):
    e = _pd(sf_dir, "events")
    e = e[e["event_type"].isin(["click", "purchase"])].copy()
    e["ud"] = (
        e["user_id"].astype(str) + ":" + e["ts"].dt.date.astype(str)
    )
    a = set(e[e["event_type"] == "click"]["ud"])
    b = set(e[e["event_type"] == "purchase"]["ud"])
    ea = _hll_estimate_py(sorted(a))
    eb = _hll_estimate_py(sorted(b))
    eu = _hll_estimate_py(sorted(a | b))
    out = _run(spark, sf_dir, "qs170_hll_intersection").iloc[0]
    assert (out["est_a"], out["est_b"], out["est_union"]) == (ea, eb, eu)
    assert out["est_intersection"] == ea + eb - eu
    assert out["exact_intersection"] == len(a & b)


def test_intent_qs171_cms_join_size(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    from collections import Counter

    sk = [Counter() for _ in range(4)]
    for v in li["l_partkey"]:
        for j in range(4):
            sk[j][int(_md5(f"{j}:{v}")[:8], 16) % 4096] += 1
    est = min(sum(c * c for c in sk[j].values()) for j in range(4))
    exact = sum(c * c for c in Counter(li["l_partkey"]).values())
    out = _run(spark, sf_dir, "qs171_cms_join_size").iloc[0]
    assert (out["est_pairs"], out["exact_pairs"]) == (est, exact)
    assert est >= exact  # CMS inner products only over-estimate
    assert abs(
        out["overest_pct"] - round((est - exact) * 100.0 / exact, 2)
    ) <= 0.011


def test_intent_qs152_bloom(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    total_bits = 64 * 32
    member = set()
    probes = {}
    for r in d.itertuples():
        ss = _shingles(r.text)  # original-case trigrams
        if r.doc_id % 10 == 0:
            for s in ss:
                for j in range(3):
                    member.add(int(_md5(f"{j}:{s}")[:8], 16) % total_bits)
        else:
            probes[r.doc_id] = ss
    ref = {}
    for did, ss in probes.items():
        flagged = sum(
            1
            for s in ss
            if all(
                int(_md5(f"{j}:{s}")[:8], 16) % total_bits in member
                for j in range(3)
            )
        )
        if ss:
            ref[did] = (len(ss), flagged)
    out = _run(spark, sf_dir, "qs152_bloom_decontaminate")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs308_split_leakage(spark, sf_dir):
    # Recompute the full composition: minhash-LSH pairs (wave-14
    # machinery) x md5 hash-split folds -> per-fold-pair leakage.
    d = _pd(sf_dir, "documents")
    sh = {r.doc_id: _shingles(r.text) for r in d.itertuples()}
    sigs = {}
    for did, ss in sh.items():
        if not ss:
            continue
        sigs[did] = [
            min(
                _md5(f"p{j // 4}|" + s)[8 * (j % 4) : 8 * (j % 4) + 8]
                for s in ss
            )
            for j in range(12)
        ]
    from collections import defaultdict

    buckets = defaultdict(list)
    for did, sg in sigs.items():
        for b in range(4):
            buckets[(b, _md5(",".join(sg[3 * b : 3 * b + 3])))].append(did)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cands.add((a, b))
    split = {}
    for did in d["doc_id"]:
        bk = _bucket(did, "split")
        split[did] = (
            "train" if bk < 800_000 else ("val" if bk < 900_000 else "test")
        )
    agg = defaultdict(lambda: [0, 0])
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        jac = inter / union if union else 0.0
        if jac >= 0.5 and split[a] != split[b]:
            key = "|".join(sorted((split[a], split[b])))
            agg[key][0] += 1
            agg[key][1] += math.floor(jac * 10000)
    out = _run(spark, sf_dir, "qs308_split_leakage")
    got = {
        r["split_pair"]: (r["n_pairs"], r["sum_jac_bp"])
        for _, r in out.iterrows()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_intent_qs96_anonymize(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    out = _run(spark, sf_dir, "qs96_anonymize")
    got = {
        r["c_custkey"]: (r["name_h"], r["seg_m"], r["bal_band"])
        for _, r in out.iterrows()
    }
    for r in c.itertuples():
        h = hashlib.sha256(("pepper" + r.c_name).encode()).hexdigest()
        seg = r.c_mktsegment
        masked = "*" * max(len(seg) - 4, 0) + seg[-4:]
        band = int(math.floor(r.c_acctbal / 1000) * 1000)
        assert got[r.c_custkey] == (h, masked, band)


# -- wave 19 (r12): final stragglers ---------------------------------------


def test_intent_qs138_repetition_rowlocal(spark, sf_dir):
    # Same textbook reference as qs89 — the row-local strategy must
    # produce identical rows.
    d = _pd(sf_dir, "documents")
    from collections import Counter

    ref = {}
    for r in d.itertuples():
        toks = r.text.lower().split(" ")
        if len(toks) < 2:
            continue
        c = Counter(
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        )
        ref[r.doc_id] = (max(c.values()), sum(c.values()))
    out = _run(spark, sf_dir, "qs138_repetition_rowlocal")
    got = {
        r["doc_id"]: (r["top_cnt"], r["n_grams"])
        for _, r in out.iterrows()
    }
    assert got == ref


def test_intent_qs207_feature_hashing(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    from collections import Counter

    ref = Counter()
    for r in d.itertuples():
        if r.doc_id % 20 != 0:
            continue
        for t in r.text.lower().split(" "):
            if t:
                ref[(r.doc_id, int(_md5(t)[:8], 16) % 1024)] += 1
    out = _run(spark, sf_dir, "qs207_feature_hashing")
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"] for _, r in out.iterrows()
    }
    assert got == dict(ref)


def test_intent_qs293_threshold_sweep(spark, sf_dir):
    # Recompute the qs55 pair pipeline, then the 5-threshold curve.
    d = _pd(sf_dir, "documents")
    sh = {r.doc_id: _shingles(r.text) for r in d.itertuples()}
    sigs = {}
    for did, ss in sh.items():
        if not ss:
            continue
        sigs[did] = [
            min(
                _md5(f"p{j // 4}|" + s)[8 * (j % 4) : 8 * (j % 4) + 8]
                for s in ss
            )
            for j in range(12)
        ]
    from collections import defaultdict

    buckets = defaultdict(list)
    for did, sg in sigs.items():
        for b in range(4):
            buckets[(b, _md5(",".join(sg[3 * b : 3 * b + 3])))].append(did)
    pairs = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if (a, b) in pairs:
                    continue
                inter = len(sh[a] & sh[b])
                union = len(sh[a] | sh[b])
                jac = inter / union if union else 0.0
                if jac >= 0.5:
                    pairs[(a, b)] = jac
    n_docs = len(d)
    out = _run(spark, sf_dir, "qs293_dedup_threshold_sweep")
    assert len(out) == 5
    for _, r in out.iterrows():
        t = r["threshold"]
        sel = {p for p, j in pairs.items() if j >= t}
        docs = {x for p in sel for x in p}
        assert r["n_pairs"] == len(sel)
        assert r["n_docs_affected"] == len(docs)
        assert abs(
            r["affected_bp"] - round(10000.0 * len(docs) / n_docs, 2)
        ) <= 0.011


def test_intent_qs255_bm25_topk(spark, sf_dir):
    import re

    d = _pd(sf_dir, "documents")
    toks = {
        r.doc_id: [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in d.itertuples()
    }
    dl = {k: len(v) for k, v in toks.items() if v}
    N = len(dl)
    avgdl = sum(dl.values()) / N
    terms = ("data", "query", "scan")
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scored = {}
    for did, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl[did] / avgdl))
        if s > 0.0:
            scored[did] = round(s, 4)
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = _run(spark, sf_dir, "qs255_bm25_topk")
    got = [(r["doc_id"], r["bm25"]) for _, r in out.iterrows()]
    assert [g[0] for g in got] == [t[0] for t in top]
    for (gd, gs), (_td, ts) in zip(got, top):
        assert abs(gs - ts) <= 2e-4


def test_intent_qs59_ivf_topk(spark, sf_dir):
    # IVF from the documented deterministic construction: centroids =
    # first 8 vectors, assignment by 6dp cosine (cid tiebreak), probe
    # the 3 closest buckets, exact top-10 within (4dp, id tiebreak).
    ids, V, _ = _emb(sf_dir)
    norm = np.linalg.norm(V, axis=1)
    cents = {int(i): V[ids == i][0] for i in ids if i < 8}
    cnorm = {c: np.linalg.norm(v) for c, v in cents.items()}
    q = V[ids == 0][0]
    qn = np.linalg.norm(q)
    assign = {}
    for k, vid in enumerate(ids):
        best = min(
            (-round(float(V[k] @ cents[c] / (norm[k] * cnorm[c])), 6), c)
            for c in cents
        )
        assign[int(vid)] = best[1]
    probed = sorted(
        cents, key=lambda c: (-round(float(cents[c] @ q / (cnorm[c] * qn)), 6), c)
    )[:3]
    cand = [
        (int(vid), round(float(V[k] @ q / (norm[k] * qn)), 4))
        for k, vid in enumerate(ids)
        if assign[int(vid)] in probed
    ]
    top = sorted(cand, key=lambda kv: (-kv[1], kv[0]))[:10]
    out = _run(spark, sf_dir, "qs59_ivf_topk")
    got = [(r["vec_id"], r["sim"]) for _, r in out.iterrows()]
    assert [g[0] for g in got] == [t[0] for t in top]
    for (_gd, gs), (_td, ts) in zip(got, top):
        assert abs(gs - ts) <= 2e-4


# -- wave 20 (r13): the qs393 prefix-shortlist MRR composition --------------


def test_intent_qs393_mrr_prefix_shortlist(spark, sf_dir):
    # Independent pure-Python serving path: global df per term, each
    # query keeps its 3 rarest (df, term) tokens, candidates are docs
    # sharing any of them, ranked by full distinct-token overlap with
    # cid tiebreak, first same-source WITHIN the top-10 shortlist.
    d = _pd(sf_dir, "documents")
    toks = {
        r.doc_id: set(t for t in r.text.lower().split(" ") if t)
        for r in d.itertuples()
    }
    df_count: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            df_count[t] = df_count.get(t, 0) + 1
    src = dict(zip(d["doc_id"], d["source"]))
    qids = [i for i in d["doc_id"] if i % 50 == 0]
    sum_rr = h1 = h3 = h10 = 0
    for qid in qids:
        prefix = [
            t for _df, t in sorted((df_count[t], t) for t in toks[qid])[:3]
        ]
        cand = {
            cid
            for cid in d["doc_id"]
            if cid != qid and any(t in toks[cid] for t in prefix)
        }
        scored = sorted((-len(toks[qid] & toks[c]), c) for c in cand)
        fr = None
        for rank, (_s, cid) in enumerate(scored[:10], start=1):
            if src[cid] == src[qid]:
                fr = rank
                break
        if fr is not None:
            sum_rr += 1_000_000 // fr
            h1 += fr == 1
            h3 += fr <= 3
            h10 += fr <= 10
    out = _run(spark, sf_dir, "qs393_mrr_prefix_shortlist").iloc[0]
    assert out["n_queries"] == len(qids)
    assert (out["hits_at_1"], out["hits_at_3"], out["hits_at_10"]) == (
        h1, h3, h10,
    )
    assert out["mrr_e6"] == sum_rr // len(qids)


def test_qs393_shortlist_recall_vs_exact(spark, sf_dir):
    """The composition claim itself: the shortlist harness's hits@k can
    never EXCEED the exact harness's (candidates are a subset and the
    shortlist is truncated at 10), and on this corpus the measured
    recall stays within the documented band (BASELINE.md r13 cell)."""
    exact = _run(spark, sf_dir, "qs389_mrr_eval").iloc[0]
    short = _run(spark, sf_dir, "qs393_mrr_prefix_shortlist").iloc[0]
    assert short["n_queries"] == exact["n_queries"]
    for k in ("hits_at_1", "hits_at_3", "hits_at_10"):
        assert short[k] <= exact[k]
    assert short["mrr_e6"] <= exact["mrr_e6"]
    # Measured at both SFs when this landed: identical hits@k, MRR
    # >= 90% of exact — fail loudly if a data or plan change collapses
    # shortlist recall instead of silently shipping a worse ANN story.
    assert short["mrr_e6"] * 10 >= exact["mrr_e6"] * 9


# -- wave 21 (r13): retiring EXACT-DEFINITIONAL classes, oldest first ------


def _sorted_records(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(map(tuple, df.itertuples(index=False)), key=str)


def test_intent_qs99_funnel(spark, sf_dir):
    # Textbook per-user funnel walk: earliest view, earliest click
    # strictly after it within 7 days, earliest purchase after that.
    ev = _pd(sf_dir, "events")
    week = pd.Timedelta(days=7)
    rows = []
    for uid, g in ev.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        t_view = views.min()
        t_click = t_purchase = pd.NaT
        clicks = g.loc[
            (g["event_type"] == "click")
            & (g["ts"] > t_view)
            & (g["ts"] <= t_view + week),
            "ts",
        ]
        if not clicks.empty:
            t_click = clicks.min()
            purchases = g.loc[
                (g["event_type"] == "purchase")
                & (g["ts"] > t_click)
                & (g["ts"] <= t_click + week),
                "ts",
            ]
            if not purchases.empty:
                t_purchase = purchases.min()
        depth = 1 + pd.notna(t_click) + pd.notna(t_purchase)
        rows.append((uid, t_view, t_click, t_purchase, int(depth)))
    exp = pd.DataFrame(
        rows, columns=["user_id", "t_view", "t_click", "t_purchase", "depth"]
    )
    got = _run(spark, sf_dir, "qs99_funnel")
    assert len(got) == len(exp)
    g = got.sort_values("user_id").reset_index(drop=True)
    e = exp.sort_values("user_id").reset_index(drop=True)
    assert (g["user_id"].to_numpy() == e["user_id"].to_numpy()).all()
    assert (g["depth"].to_numpy() == e["depth"].to_numpy()).all()
    for col in ("t_view", "t_click", "t_purchase"):
        ge = pd.to_datetime(g[col])
        ee = pd.to_datetime(e[col])
        assert ((ge == ee) | (ge.isna() & ee.isna())).all(), col


def test_intent_qs115_tfidf_top_terms(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    tf: dict[tuple, int] = {}
    df_count: dict[str, set] = {}
    for r in d.itertuples():
        for t in r.text.lower().split(" "):
            if not t:
                continue
            tf[(r.doc_id, t)] = tf.get((r.doc_id, t), 0) + 1
            df_count.setdefault(t, set()).add(r.doc_id)
    n = len({doc for doc, _t in tf})
    import math as _m

    scored: dict[int, list] = {}
    for (doc, t), c in tf.items():
        s = round(c * _m.log(n / len(df_count[t])), 4)
        scored.setdefault(doc, []).append((-s, t))
    exp = set()
    for doc, lst in scored.items():
        for negs, t in sorted(lst)[:3]:
            exp.add((doc, t, -negs))
    got = _run(spark, sf_dir, "qs115_tfidf_top_terms")
    gset = {
        (r["doc_id"], r["term"], round(r["tfidf"], 4))
        for _, r in got.iterrows()
    }
    assert gset == exp


def test_intent_qs116_cohort_retention(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    f = ev.groupby("user_id")["ts"].min().rename("f_ts")
    j = ev.merge(f, on="user_id")
    cohort = (
        j["f_ts"] - pd.to_timedelta(j["f_ts"].dt.weekday, unit="D")
    ).dt.date
    offset = (
        (j["ts"].dt.normalize() - j["f_ts"].dt.normalize()).dt.days // 7
    )
    exp = (
        pd.DataFrame(
            {"cohort_week": cohort, "week_offset": offset, "u": j["user_id"]}
        )
        .groupby(["cohort_week", "week_offset"])["u"]
        .nunique()
        .reset_index(name="n_users")
    )
    got = _run(spark, sf_dir, "qs116_cohort_retention")
    gs = sorted(
        (str(r["cohort_week"]), int(r["week_offset"]), int(r["n_users"]))
        for _, r in got.iterrows()
    )
    es = sorted(
        (str(r["cohort_week"]), int(r["week_offset"]), int(r["n_users"]))
        for _, r in exp.iterrows()
    )
    assert gs == es


def test_intent_qs134_corpus_mixing_weights(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    g = d.groupby(["lang", "source"]).size().reset_index(name="cnt")
    total, n_groups = int(g["cnt"].sum()), len(g)
    g["weight_e6"] = (1_000_000 * total) // (n_groups * g["cnt"])
    got = _run(spark, sf_dir, "qs134_corpus_mixing_weights")
    gs = sorted(map(tuple, got[["lang", "source", "cnt", "weight_e6"]]
                    .itertuples(index=False)))
    es = sorted(map(tuple, g[["lang", "source", "cnt", "weight_e6"]]
                    .itertuples(index=False)))
    assert gs == es


def test_intent_qs147_gopher_quality_rules(spark, sf_dir):
    import re as _re

    d = _pd(sf_dir, "documents")
    stop = {"the", "and", "of", "to", "in", "a", "is", "that"}
    exp = {}
    for r in d.itertuples():
        toks = r.text.split(" ")  # the Rae-rule split, empties kept
        n = len(toks)
        words_ok = int(50 <= n <= 100_000)
        mean_len_ok = int(3.0 <= sum(len(t) for t in toks) / n <= 10.0)
        stopwords_ok = int(sum(t in stop for t in toks) >= 2)
        alpha_ok = int(
            sum(bool(_re.search("[a-zA-Z]", t)) for t in toks) / n >= 0.8
        )
        exp[r.doc_id] = (
            words_ok, mean_len_ok, stopwords_ok, alpha_ok,
            words_ok * mean_len_ok * stopwords_ok * alpha_ok,
        )
    got = _run(spark, sf_dir, "qs147_gopher_quality_rules")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["doc_id"]] == (
            r["words_ok"], r["mean_len_ok"], r["stopwords_ok"],
            r["alpha_ok"], r["passed"],
        ), r["doc_id"]


def test_intent_qs149_temperature_mixing(spark, sf_dir):
    import math as _m

    d = _pd(sf_dir, "documents")
    g = d.groupby("lang").size()
    mx = int(g.max())
    exp = {
        lang: (int(cnt), _m.floor(1_000_000.0 * _m.sqrt(cnt / mx)))
        for lang, cnt in g.items()
    }
    got = _run(spark, sf_dir, "qs149_temperature_mixing")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["lang"]] == (r["cnt"], r["weight_e6"])


def _ntile(keys: list, k: int) -> dict:
    """ANSI NTILE: first (n % k) tiles get ceil(n/k) rows, orderered
    by the provided sort keys (already sorted)."""
    n = len(keys)
    out = {}
    base, extra = divmod(n, k)
    i = 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= extra else 0)
        for key in keys[i : i + size]:
            out[key] = tile
        i += size
    return out


def test_intent_qs157_perplexity_buckets(spark, sf_dir):
    import math as _m

    d = _pd(sf_dir, "documents")
    toks = {
        r.doc_id: [t for t in r.text.lower().split(" ") if t]
        for r in d.itertuples()
    }
    lang = dict(zip(d["doc_id"], d["lang"]))
    cbg: dict[tuple, int] = {}
    cctx: dict[str, int] = {}
    vocab = set()
    bigrams: dict[int, list] = {}
    for doc, ts in toks.items():
        vocab.update(ts)
        bg = list(zip(ts, ts[1:]))
        bigrams[doc] = bg
        for w1, w2 in bg:
            cbg[(w1, w2)] = cbg.get((w1, w2), 0) + 1
            cctx[w1] = cctx.get(w1, 0) + 1
    v = len(vocab)
    lp = {
        doc: round(
            sum(_m.log((cbg[b] + 1.0) / (cctx[b[0]] + v)) for b in bg)
            / len(bg),
            4,
        )
        for doc, bg in bigrams.items()
        if bg
    }
    exp: dict[tuple, list] = {}
    for lg in sorted(set(lang.values())):
        docs = sorted(
            (doc for doc in lp if lang[doc] == lg),
            key=lambda doc: (-lp[doc], doc),
        )
        if not docs:
            continue
        tiles = _ntile(docs, 3)
        for doc in docs:
            name = {1: "head", 2: "middle", 3: "tail"}[tiles[doc]]
            exp.setdefault((lg, name), []).append(lp[doc])
    got = _run(spark, sf_dir, "qs157_perplexity_buckets")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        vals = exp[(r["lang"], r["tier"])]
        assert r["n_docs"] == len(vals)
        assert abs(r["mean_logp"] - round(sum(vals) / len(vals), 4)) <= 2e-4


def test_intent_qs160_token_entropy(spark, sf_dir):
    import math as _m
    from collections import Counter

    d = _pd(sf_dir, "documents")
    got = _run(spark, sf_dir, "qs160_token_entropy").set_index("doc_id")
    assert len(got) == len(d)
    for r in d.itertuples():
        c = Counter(t for t in r.text.lower().split(" ") if t)
        n = sum(c.values())
        ent = -sum((v / n) * _m.log2(v / n) for v in c.values())
        row = got.loc[r.doc_id]
        assert row["n_tokens"] == n and row["n_distinct"] == len(c)
        assert abs(row["entropy_bits"] - ent) <= 2e-4


def test_intent_qs187_basket_lift(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    basket = set(
        zip(li["l_orderkey"], (li["l_partkey"] % 50).astype(int))
    )
    n_orders = len({o for o, _i in basket})
    sup: dict[int, int] = {}
    per_order: dict[int, list] = {}
    for o, item in basket:
        sup[item] = sup.get(item, 0) + 1
        per_order.setdefault(o, []).append(item)
    s_ab: dict[tuple, int] = {}
    for items in per_order.values():
        items = sorted(items)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                p = (items[i], items[j])
                s_ab[p] = s_ab.get(p, 0) + 1
    scored = [
        (-round(c * n_orders / (sup[a] * sup[b]), 4), a, b, c)
        for (a, b), c in s_ab.items()
        if c >= 5
    ]
    exp = [
        (a, b, c, -neg) for neg, a, b, c in sorted(scored)[:20]
    ]
    got = _run(spark, sf_dir, "qs187_basket_lift")
    gs = [
        (int(r["item_a"]), int(r["item_b"]), int(r["support"]),
         round(r["lift"], 4))
        for _, r in got.iterrows()
    ]
    assert gs == exp


def test_intent_qs192_cohort_ltv(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    m = o["o_orderdate"].dt.to_period("M")
    c = _cents(o["o_totalprice"])
    base = pd.DataFrame({"cust": o["o_custkey"], "m": m, "c": c})
    m0 = base.groupby("cust")["m"].min().rename("m0")
    j = base.merge(m0, on="cust")
    j["offset"] = (j["m"] - j["m0"]).apply(lambda x: x.n)
    rev = (
        j.groupby([j["m0"], "offset"])["c"].sum().reset_index(name="rev")
    )
    rev = rev.sort_values(["m0", "offset"])
    rev["cum"] = rev.groupby("m0")["rev"].cumsum()
    rev = rev[rev["offset"] <= 6]
    exp = sorted(
        (str(r["m0"].start_time.date()), int(r["offset"]), int(r["cum"]))
        for _, r in rev.iterrows()
    )
    got = _run(spark, sf_dir, "qs192_cohort_ltv")
    gs = sorted(
        (str(r["cohort_month"]), int(r["month_offset"]),
         int(r["cum_rev_cents"]))
        for _, r in got.iterrows()
    )
    assert gs == exp


def test_intent_qs210_rfm_segments(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    anchor = pd.Timestamp("2001-09-01")
    g = o.groupby("o_custkey").agg(
        last=("o_orderdate", "max"), freq=("o_orderdate", "size")
    )
    g["cents"] = o.assign(c=_cents(o["o_totalprice"])).groupby(
        "o_custkey"
    )["c"].sum()
    g["recency_days"] = (anchor - g["last"].dt.normalize()).dt.days
    custs = list(g.index)
    r_tiles = _ntile(
        sorted(custs, key=lambda cst: (-g.loc[cst, "recency_days"], cst)), 5
    )
    f_tiles = _ntile(
        sorted(custs, key=lambda cst: (g.loc[cst, "freq"], cst)), 5
    )
    m_tiles = _ntile(
        sorted(custs, key=lambda cst: (g.loc[cst, "cents"], cst)), 5
    )

    def seg(r, f):
        if r >= 4 and f >= 4:
            return "champion"
        if r >= 4:
            return "recent"
        if f >= 4:
            return "loyal"
        if r <= 2 and f <= 2:
            return "at_risk"
        return "regular"

    got = _run(spark, sf_dir, "qs210_rfm_segments").set_index("cust")
    assert len(got) == len(g)
    for cst in custs:
        row = got.loc[cst]
        assert row["recency_days"] == g.loc[cst, "recency_days"]
        assert row["freq"] == g.loc[cst, "freq"]
        assert row["cents"] == g.loc[cst, "cents"]
        assert (row["r_score"], row["f_score"], row["m_score"]) == (
            r_tiles[cst], f_tiles[cst], m_tiles[cst],
        ), cst
        assert row["segment"] == seg(r_tiles[cst], f_tiles[cst])


def test_intent_qs245_gains_lift_deciles(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    o95 = o[o["o_orderdate"].dt.year == 1995]
    spend = (
        o95.assign(c=_cents(o95["o_totalprice"]))
        .groupby("o_custkey")["c"]
        .sum()
    )
    resp = set(o.loc[o["o_orderdate"].dt.year == 1996, "o_custkey"])
    order = sorted(spend.index, key=lambda cst: (-spend[cst], cst))
    tiles = _ntile(order, 10)
    agg: dict[int, list] = {}
    for cst in order:
        agg.setdefault(tiles[cst], []).append(int(cst in resp))
    tn = len(order)
    tr = sum(cst in resp for cst in order)
    cn = cr = 0
    exp = {}
    for dec in sorted(agg):
        n, r = len(agg[dec]), sum(agg[dec])
        cn += n
        cr += r
        exp[dec] = (
            n, r, round(r / n, 4), round((cr * tn) / (cn * tr), 4),
        )
    got = _run(spark, sf_dir, "qs245_gains_lift_deciles")
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        n, r, rate, lift = exp[row["decile"]]
        assert (row["n_cust"], row["responders"]) == (n, r)
        assert abs(row["resp_rate"] - rate) <= 2e-4
        assert abs(row["cum_lift"] - lift) <= 2e-4


# -- wave 22 (r13): the qs394-qs401 additions -------------------------------


def _seg_daily_pd(sf_dir):
    """(seg, d, y-cents) day grid for BUILDING/MACHINERY and the
    pooled (y, seg, d)-tiebroken order — the qs377 rank convention,
    rebuilt independently."""
    o = _pd(sf_dir, "orders")
    c = _pd(sf_dir, "customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    daily = (
        pd.DataFrame(
            {
                "seg": j["c_mktsegment"],
                "d": j["o_orderdate"].dt.date,
                "c": _cents(j["o_totalprice"]),
            }
        )
        .groupby(["seg", "d"])["c"]
        .sum()
        .reset_index(name="y")
    )
    return daily.sort_values(
        ["y", "seg", "d"], kind="mergesort"
    ).reset_index(drop=True)


def test_intent_qs394_kuiper(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    v = _cents(o["o_totalprice"])
    grp = (o["o_custkey"] % 2).to_numpy()
    x = np.sort(v[grp == 0])
    y = np.sort(v[grp == 1])
    grid = np.unique(v)
    f0 = np.searchsorted(x, grid, side="right") / len(x)
    f1 = np.searchsorted(y, grid, side="right") / len(y)
    dplus = max(0.0, np.max(f0 - f1))
    dminus = max(0.0, np.max(f1 - f0))
    got = _run(spark, sf_dir, "qs394_kuiper").iloc[0]
    assert got["n0"] == len(x) and got["n1"] == len(y)
    assert abs(got["kuiper_e6"] / 1e6 - (dplus + dminus)) <= 2e-6
    assert abs(got["dplus_num"] / (len(x) * len(y)) - dplus) <= 1e-12
    assert abs(got["dminus_num"] / (len(x) * len(y)) - dminus) <= 1e-12


def test_intent_qs395_anderson_darling(spark, sf_dir):
    daily = _seg_daily_pd(sf_dir)
    isx = (daily["seg"] == "BUILDING").to_numpy()
    N, m = len(daily), int(isx.sum())
    Mi = np.cumsum(isx)
    i = np.arange(1, N + 1)
    sel = i < N
    a2 = np.sum(
        (Mi[sel] * N - i[sel] * m) ** 2.0 / (i[sel] * (N - i[sel]))
    ) / (m * (N - m))
    got = _run(spark, sf_dir, "qs395_anderson_darling").iloc[0]
    assert got["n_x"] == m and got["n_y"] == N - m
    assert abs(got["a2"] - a2) <= 2e-6


def test_intent_qs396_brunner_munzel(spark, sf_dir):
    daily = _seg_daily_pd(sf_dir)
    r = np.arange(1, len(daily) + 1, dtype=np.float64)
    isx = (daily["seg"] == "BUILDING").to_numpy()
    rx, ry = r[isx], r[~isx]
    n1, n2 = len(rx), len(ry)
    # placements: overall rank minus within-sample rank
    px = rx - np.arange(1, n1 + 1)
    py = ry - np.arange(1, n2 + 1)
    s1 = px.var(ddof=1)
    s2 = py.var(ddof=1)
    w = (
        n1 * n2 * (ry.mean() - rx.mean())
        / ((n1 + n2) * np.sqrt(n1 * s1 + n2 * s2))
    )
    p_hat = py.sum() / (n1 * n2)
    got = _run(spark, sf_dir, "qs396_brunner_munzel").iloc[0]
    assert got["n_x"] == n1 and got["n_y"] == n2
    assert got["p_hat_e6"] == int(py.sum()) * 1_000_000 // (n1 * n2)
    assert 0.0 <= p_hat <= 1.0
    assert abs(got["w_bm"] - w) <= 2e-6


def test_intent_qs397_lepage(spark, sf_dir):
    daily = _seg_daily_pd(sf_dir)
    N = len(daily)
    r = np.arange(1, N + 1)
    isx = (daily["seg"] == "BUILDING").to_numpy()
    n1 = int(isx.sum())
    n2 = N - n1
    w = int(r[isx].sum())
    c = int(np.minimum(r[isx], N + 1 - r[isx]).sum())
    ew = n1 * (N + 1) / 2
    vw = n1 * n2 * (N + 1) / 12
    if N % 2 == 0:
        ec = n1 * (N + 2) / 4
        vc = n1 * n2 * (N + 2) * (N - 2) / (48 * (N - 1))
    else:
        ec = n1 * (N + 1) ** 2 / (4 * N)
        vc = n1 * n2 * (N + 1) * (3 + N * N) / (48 * N * N)
    lepage = (w - ew) ** 2 / vw + (c - ec) ** 2 / vc
    got = _run(spark, sf_dir, "qs397_lepage").iloc[0]
    assert got["n_x"] == n1 and got["n_y"] == n2
    assert got["wilcoxon_w"] == w and got["ansari_c"] == c
    assert abs(got["lepage_l"] - lepage) <= 2e-6


def _prio_crosstab(sf_dir):
    o = _pd(sf_dir, "orders")
    x = o["o_orderpriority"].str[0].astype(int)
    y = o["o_orderstatus"].map({"F": 1, "O": 2}).fillna(3).astype(int)
    return pd.crosstab(x, y)


def test_intent_qs398_g_test(spark, sf_dir):
    ct = _prio_crosstab(sf_dir)
    n = ct.to_numpy().sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    obs = ct.to_numpy().astype(float)
    mask = obs > 0
    g = 2 * np.sum(obs[mask] * np.log(obs[mask] / e[mask]))
    got = _run(spark, sf_dir, "qs398_g_test").iloc[0]
    assert got["n"] == n
    assert got["df"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(got["g_stat"] - g) <= 2e-4


def test_intent_qs399_empty_cell_grid(spark, tmp_path):
    # The r14 ADVICE medium: the old per-cell expansion
    # Σ_{O>0}(O·n−r·c)²/(n·r·c) equals χ² − Σ_{O=0}E, so both engines
    # silently undercounted whenever a priority×status cell was absent
    # — and the differential could never catch it because the oracle
    # shared the form. This fixture DELIBERATELY leaves cells empty
    # (priority 1 orders are all 'F', priority 2 all 'O') and checks
    # BOTH the Spark plan and the DuckDB oracle against the full-grid
    # textbook χ² including the E of the empty cells.
    import duckdb

    rows = (
        [("1-URGENT", "F")] * 40
        + [("2-HIGH", "O")] * 25
        + [("3-MEDIUM", "F")] * 10
        + [("3-MEDIUM", "O")] * 5
        + [("3-MEDIUM", "P")] * 20
    )
    o = pd.DataFrame(rows, columns=["o_orderpriority", "o_orderstatus"])
    o.to_parquet(tmp_path / "orders.parquet")

    ct = pd.crosstab(
        o["o_orderpriority"].str[0].astype(int),
        o["o_orderstatus"].map({"F": 1, "O": 2}).fillna(3).astype(int),
    )
    obs = ct.to_numpy().astype(float)
    assert (obs == 0).sum() == 4  # the fixture's whole point
    n = obs.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = np.sum((obs - e) ** 2 / e)
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))

    got = _run(spark, str(tmp_path), "qs399_cramers_v").iloc[0]
    assert got["n"] == n
    assert abs(got["phi2"] - chi2 / n) <= 2e-6
    assert abs(got["cramers_v"] - v) <= 2e-6

    from cds_etl_spark.plans import ORACLE_SQL

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'orders.parquet'}')"
    )
    ora = con.sql(ORACLE_SQL["qs399_cramers_v"]).df().iloc[0]
    assert ora["n"] == n
    assert abs(ora["phi2"] - chi2 / n) <= 2e-6
    assert abs(ora["cramers_v"] - v) <= 2e-6


def test_intent_qs241_qs273_empty_cell_grids(spark, tmp_path):
    # r14 sweep of the qs399 bug class: qs241 and qs273 used the same
    # observed-cells-only χ² and undercounted by Σ_{O=0}E on sparse
    # grids. Deliberately sparse fixtures, checked against the
    # full-grid textbook χ² (numpy over pd.crosstab, zeros included).
    def full_chi2(ct):
        obs = ct.to_numpy().astype(float)
        nn = obs.sum()
        e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / nn
        return nn, float(np.sum((obs - e) ** 2 / e)), ct.shape

    # qs241: events where segment user_id%4==3 only ever clicks.
    rows = (
        [("click", 3)] * 30
        + [("click", 0)] * 10
        + [("view", 0)] * 25
        + [("view", 1)] * 15
        + [("error", 1)] * 8
        + [("error", 2)] * 12
    )
    ev = pd.DataFrame(rows, columns=["event_type", "user_id"])
    ev.to_parquet(tmp_path / "events.parquet")
    ct = pd.crosstab(ev["event_type"], ev["user_id"] % 4)
    assert (ct.to_numpy() == 0).sum() >= 5
    nn, chi2, shape = full_chi2(ct)
    got = _run(spark, str(tmp_path), "qs241_chi_square_independence").iloc[0]
    assert got["n"] == nn
    assert got["dof"] == (shape[0] - 1) * (shape[1] - 1)
    assert abs(got["chi2"] - chi2) <= 2e-4
    assert abs(
        got["cramers_v"] - math.sqrt(chi2 / (nn * (min(shape) - 1)))
    ) <= 2e-4

    # qs273: sparse orders grid + (dense is fine) lineitem grid.
    od = pd.DataFrame(
        [("1-URGENT", "F")] * 20
        + [("2-HIGH", "O")] * 30
        + [("3-MEDIUM", "F")] * 5
        + [("3-MEDIUM", "P")] * 15,
        columns=["o_orderpriority", "o_orderstatus"],
    )
    od.to_parquet(tmp_path / "orders.parquet")
    li = pd.DataFrame(
        [("R", "F")] * 9 + [("N", "O")] * 11 + [("A", "F")] * 7
        + [("A", "O")] * 3,
        columns=["l_returnflag", "l_linestatus"],
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    got = _run(spark, str(tmp_path), "qs273_cramers_v").set_index("pair")
    for pair, frame, xc, yc in (
        ("orders_priority_status", od, "o_orderpriority", "o_orderstatus"),
        ("lineitem_flag_status", li, "l_returnflag", "l_linestatus"),
    ):
        nn, chi2, shape = full_chi2(pd.crosstab(frame[xc], frame[yc]))
        r = got.loc[pair]
        assert r["n"] == nn
        assert r["dof"] == (shape[0] - 1) * (shape[1] - 1)
        assert abs(r["chi2"] - chi2) <= 2e-4
        assert abs(
            r["cramers_v"] - math.sqrt(chi2 / (nn * (min(shape) - 1)))
        ) <= 2e-4


def test_intent_qs174_unobserved_digit_owes_its_term(spark, tmp_path):
    # r14: a digit that never occurs must still emit its row with
    # obs=0 and chi2 term (0-E)^2/E = E — previously the row was
    # silently absent and the terms no longer summed to chi-square.
    o = pd.DataFrame({"o_totalprice": [11.0] * 40 + [220.0] * 25 + [3300.0] * 35})
    o.to_parquet(tmp_path / "orders.parquet")
    got = _run(spark, str(tmp_path), "qs174_benford_audit").set_index("digit")
    assert sorted(got.index) == list(range(1, 10))
    n = 100
    for d in range(1, 10):
        exp = n * math.log10(1 + 1 / d)
        obs = {1: 40, 2: 25, 3: 35}.get(d, 0)
        assert got.loc[d, "obs"] == obs
        assert abs(got.loc[d, "exp_4dp"] - exp) <= 2e-4
        assert got.loc[d, "chi2_term_e4"] == round((obs - exp) ** 2 / exp * 10000)


def test_intent_qs399_cramers_v(spark, sf_dir):
    ct = _prio_crosstab(sf_dir)
    obs = ct.to_numpy().astype(float)
    n = obs.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = np.sum((obs - e) ** 2 / e)
    v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    got = _run(spark, sf_dir, "qs399_cramers_v").iloc[0]
    assert got["n"] == n
    assert abs(got["phi2"] - chi2 / n) <= 2e-6
    assert abs(got["cramers_v"] - v) <= 2e-6


def test_intent_qs400_lsh_band_occupancy(spark, sf_dir):
    # Independent pure-hashlib rebuild of the qs55 portable signature
    # family: k=3 word shingles, hash j = 8-hex slice j%4 of
    # md5('p<j//4>|' + shingle), band key = md5 of 3 comma-joined
    # signature slices.
    import hashlib
    from collections import Counter

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    d = _pd(sf_dir, "documents")
    occ = Counter()
    for r in d.itertuples():
        toks = r.text.split(" ")
        shingles = list(
            dict.fromkeys(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
        )
        if not shingles:
            continue
        sig = [
            min(
                md5hex(f"p{j // 4}|" + s)[8 * (j % 4) : 8 * (j % 4) + 8]
                for s in shingles
            )
            for j in range(12)
        ]
        for b in range(4):
            key = md5hex(",".join(sig[3 * b : 3 * b + 3]))
            occ[(b + 1, key)] += 1
    hist: dict[tuple, list] = {}
    for (b, _k), n in occ.items():
        bucket = math.ceil(math.log2(n)) if n > 1 else 0
        hist.setdefault((b, bucket), []).append(n)
    got = _run(spark, sf_dir, "qs400_lsh_band_occupancy")
    assert len(got) == len(hist)
    for _, row in got.iterrows():
        ns = hist[(row["band_idx"], row["occ_bucket"])]
        assert row["n_keys"] == len(ns)
        assert row["max_occ"] == max(ns)


def test_intent_qs401_moran_i_daily(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    daily = (
        pd.DataFrame(
            {"d": o["o_orderdate"].dt.date, "c": _cents(o["o_totalprice"])}
        )
        .groupby("d")["c"]
        .sum()
        .sort_index()
        .to_numpy()
        .astype(float)
    )
    n = len(daily)
    z = daily - daily.mean()
    moran = (n / (n - 1)) * np.sum(z[1:] * z[:-1]) / np.sum(z * z)
    got = _run(spark, sf_dir, "qs401_moran_i_daily").iloc[0]
    assert got["n_days"] == n
    assert abs(got["moran_i"] - moran) <= 2e-6


# -- wave 23 (r13): EXACT-DEFINITIONAL retirement, second batch -------------


def test_intent_qs104_inverted_index(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    tf = Counter()
    docs: dict[str, set] = {}
    first: dict[str, int] = {}
    for r in d.itertuples():
        for t in r.text.lower().split(" "):
            if not t:
                continue
            tf[t] += 1
            docs.setdefault(t, set()).add(r.doc_id)
            first[t] = min(first.get(t, r.doc_id), r.doc_id)
    exp = {
        t: (len(docs[t]), tf[t], first[t])
        for t in tf
        if len(docs[t]) >= 5
    }
    got = _run(spark, sf_dir, "qs104_inverted_index")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["term"]] == (r["df"], r["tf"], r["first_doc"])


def test_intent_qs123_event_transitions(spark, sf_dir):
    from collections import Counter

    ev = _pd(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    c = Counter()
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for cur, nxt in zip(types, types[1:]):
            c[(cur, nxt)] += 1
    row_tot = Counter()
    for (cur, _n), n in c.items():
        row_tot[cur] += n
    got = _run(spark, sf_dir, "qs123_event_transitions")
    assert len(got) == len(c)
    for _, r in got.iterrows():
        n = c[(r["cur"], r["nxt"])]
        assert r["n"] == n
        assert abs(r["p"] - round(n / row_tot[r["cur"]], 4)) <= 2e-4


def test_intent_qs124_quality_filter(spark, sf_dir):
    stop = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}
    d = _pd(sf_dir, "documents")
    got = _run(spark, sf_dir, "qs124_quality_filter").set_index("doc_id")
    checked = 0
    for r in d.itertuples():
        ts = [t for t in r.text.lower().split(" ") if t]
        if not ts:
            assert r.doc_id not in got.index
            continue
        n, n_stop, n_uniq = len(ts), sum(t in stop for t in ts), len(set(ts))
        if n < 10:
            verdict = "too_short"
        elif n_stop / n < 0.05:
            verdict = "low_stopword"
        elif n_uniq / n < 0.3:
            verdict = "repetitive"
        else:
            verdict = "pass"
        row = got.loc[r.doc_id]
        assert row["n_tok"] == n and row["verdict"] == verdict
        assert abs(row["stop_ratio"] - round(n_stop / n, 4)) <= 2e-4
        assert abs(row["distinct_ratio"] - round(n_uniq / n, 4)) <= 2e-4
        checked += 1
    assert checked == len(got)


def test_intent_qs155_token_cooccurrence(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    d = _pd(sf_dir, "documents")
    toksets = {
        r.doc_id: set(r.text.split(" ")) for r in d.itertuples()
    }
    df_count = Counter()
    for ts in toksets.values():
        df_count.update(ts)
    floor = len(d) // 20
    frequent = {t for t, c in df_count.items() if c >= floor}
    pair_count = Counter()
    for ts in toksets.values():
        for a, b in combinations(sorted(ts & frequent), 2):
            pair_count[(a, b)] += 1
    exp = sorted(
        ((-n, a, b) for (a, b), n in pair_count.items())
    )[:20]
    got = _run(spark, sf_dir, "qs155_token_cooccurrence")
    gs = [(-int(r["n_docs"]), r["t1"], r["t2"]) for _, r in got.iterrows()]
    assert gs == exp


def test_intent_qs164_sequence_mining(spark, sf_dir):
    from collections import Counter

    ev = _pd(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    occ = Counter()
    users: dict[str, set] = {}
    for uid, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b, c in zip(types, types[1:], types[2:]):
            s = f"{a}>{b}>{c}"
            occ[s] += 1
            users.setdefault(s, set()).add(uid)
    exp = sorted(
        ((-len(users[s]), -occ[s], s) for s in occ)
    )[:20]
    got = _run(spark, sf_dir, "qs164_sequence_mining")
    gs = [
        (-int(r["n_users"]), -int(r["n_occurrences"]), r["seq"])
        for _, r in got.iterrows()
    ]
    assert gs == exp


def test_intent_qs176_last_touch_attribution(spark, sf_dir):
    from collections import Counter

    ev = _pd(sf_dir, "events")
    ev = ev.assign(sec=ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9)
    per_user = {
        uid: g for uid, g in ev.groupby("user_id")
    }
    out = Counter()
    for _, p in ev[ev["event_type"] == "purchase"].iterrows():
        g = per_user[p["user_id"]]
        cand = g[
            (g["event_type"] != "purchase")
            & (g["sec"] >= p["sec"] - 604800)
            & (g["sec"] <= p["sec"])
        ]
        if cand.empty:
            out["direct"] += 1
        else:
            key = cand["sec"] * 10_000_000 + cand["event_id"]
            out[cand.loc[key.idxmax(), "event_type"]] += 1
    got = _run(spark, sf_dir, "qs176_last_touch_attribution")
    gs = {r["attributed_type"]: r["purchases"] for _, r in got.iterrows()}
    assert gs == dict(out)


def test_intent_qs186_session_stats(spark, sf_dir):
    ev = _pd(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    durs, counts = [], []
    for _, g in ev.groupby("user_id"):
        times = g["ts"].tolist()
        cur = [times[0]]
        sessions = []
        for prev, t in zip(times, times[1:]):
            if (t - prev).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(t)
        sessions.append(cur)
        for s in sessions:
            counts.append(len(s))
            durs.append(
                int(s[-1].timestamp()) - int(s[0].timestamp())
            )
    got = _run(spark, sf_dir, "qs186_session_stats").iloc[0]
    assert got["n_sessions"] == len(durs)
    assert got["n_events"] == sum(counts)
    assert got["max_events"] == max(counts)
    assert abs(got["p50_dur_s"] - np.percentile(durs, 50)) <= 1e-6
    assert abs(got["p95_dur_s"] - np.percentile(durs, 95)) <= 1e-6


def test_intent_qs188_time_to_convert(spark, sf_dir):
    ev = _pd(sf_dir, "events")
    ev = ev.assign(sec=ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9)
    lat = []
    for _, g in ev.groupby("user_id"):
        s = g.loc[g["event_type"] == "signup", "sec"]
        p = g.loc[g["event_type"] == "purchase", "sec"]
        if not s.empty and not p.empty and p.min() >= s.min():
            lat.append(int(p.min() - s.min()))
    got = _run(spark, sf_dir, "qs188_time_to_convert").iloc[0]
    assert got["n_converted"] == len(lat)
    assert got["min_s"] == min(lat) and got["max_s"] == max(lat)
    assert abs(got["p50_s"] - np.percentile(lat, 50)) <= 1e-6
    assert abs(got["p90_s"] - np.percentile(lat, 90)) <= 1e-6


def test_intent_qs219_abc_classification(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    rev = (
        pd.DataFrame(
            {
                "pgrp": (li["l_partkey"] % 200).astype(int),
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby("pgrp")["c"]
        .sum()
    )
    order = sorted(rev.index, key=lambda g: (-rev[g], g))
    total = int(rev.sum())
    cum = 0
    exp = {}
    for g in order:
        cum += int(rev[g])
        cls = "A" if cum * 100 <= total * 80 else (
            "B" if cum * 100 <= total * 95 else "C"
        )
        exp[g] = (int(rev[g]), cum * 10000 // total, cls)
    got = _run(spark, sf_dir, "qs219_abc_classification")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["pgrp"]] == (
            r["rev_cents"], r["cum_share_e4"], r["abc_class"],
        )


def test_intent_qs237_seasonal_index_ratio(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    m = (
        pd.DataFrame(
            {
                "grp": (li["l_suppkey"] % 5).astype(int),
                "t": (li["l_shipdate"].dt.year - 1995) * 12
                + li["l_shipdate"].dt.month,
                "c": _cents(li["l_extendedprice"]),
            }
        )
        .groupby(["grp", "t"])["c"]
        .sum()
        .floordiv(10000)
        .reset_index(name="y")
    )
    exp: dict[tuple, list] = {}
    for grp, g in m.groupby("grp"):
        g = g.sort_values("t").reset_index(drop=True)
        ys = g["y"].tolist()
        ts = g["t"].tolist()
        for k in range(len(ys)):
            if k - 6 < 0 or k + 6 >= len(ys):
                continue
            trend = 2 * sum(ys[k - 6 : k + 7]) - ys[k - 6] - ys[k + 6]
            if trend <= 0:
                continue
            ratio = 24 * ys[k] * 1_000_000 // trend
            exp.setdefault((grp, (ts[k] - 1) % 12), []).append(ratio)
    got = _run(spark, sf_dir, "qs237_seasonal_index_ratio")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        rs = sorted(exp[(r["grp"], r["moy"])])
        lower_median = rs[(len(rs) + 1) // 2 - 1]
        assert r["n_obs"] == len(rs)
        assert r["seasonal_index_e6"] == lower_median


# -- wave 24 (r13): EXACT-DEFINITIONAL retirement, third batch --------------


def test_intent_qs142_duplicate_span_coverage(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    toks = {r.doc_id: r.text.split(" ") for r in d.itertuples()}
    wins: dict[tuple, list] = {}
    for doc, ts in toks.items():
        for i in range(len(ts) - 9):
            wins.setdefault(tuple(ts[i : i + 10]), []).append((doc, i + 1))
    exp = {}
    spans: dict[int, list] = {}
    for w, hits in wins.items():
        if len(hits) > 1 and len({d0 for d0, _p in hits}) > 1:
            for doc, pos in hits:
                spans.setdefault(doc, []).append((pos, pos + 9))
    for doc, sp in spans.items():
        sp.sort()
        islands = []
        cur_s, cur_e = sp[0]
        for s, e in sp[1:]:
            if s > cur_e:
                islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        dup = sum(e - s + 1 for s, e in islands)
        exp[doc] = (dup, len(islands), dup / len(toks[doc]))
    got = _run(spark, sf_dir, "qs142_duplicate_span_coverage")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        dup, ni, cov = exp[r["doc_id"]]
        assert (r["dup_tokens"], r["n_islands"]) == (dup, ni)
        assert abs(r["coverage"] - cov) <= 1e-9


def test_intent_qs220_segment_migration(spark, sf_dir):
    from collections import Counter

    o = _pd(sf_dir, "orders")
    o = o[o["o_orderdate"].dt.year.isin([1996, 1997])]
    yr = (
        o.assign(c=_cents(o["o_totalprice"]), y=o["o_orderdate"].dt.year)
        .groupby(["o_custkey", "y"])["c"]
        .sum()
        .reset_index()
    )
    tiers = {}
    for y, g in yr.groupby("y"):
        order = sorted(
            g.itertuples(), key=lambda r: (r.c, r.o_custkey)
        )
        t = _ntile([r.o_custkey for r in order], 4)
        tiers[y] = t
    exp = Counter()
    for cust, t96 in tiers[1996].items():
        t97 = tiers[1997].get(cust)
        if t97 is not None:
            exp[(t96, t97)] += 1
    got = _run(spark, sf_dir, "qs220_segment_migration")
    gs = {
        (r["tier_1996"], r["tier_1997"]): r["n_customers"]
        for _, r in got.iterrows()
    }
    assert gs == dict(exp)


def test_intent_qs226_vocab_coverage(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    tc = Counter()
    for r in d.itertuples():
        for t in r.text.lower().split(" "):
            if t:
                tc[(r.source, t)] += 1
    term_tot = Counter()
    for (_s, t), y in tc.items():
        term_tot[t] += y
    vocab = {
        t
        for _negy, t in sorted(
            (-y, t) for t, y in term_tot.items()
        )[:1000]
    }
    exp = {}
    for (s, t), y in tc.items():
        n, iv = exp.get(s, (0, 0))
        exp[s] = (n + y, iv + (y if t in vocab else 0))
    got = _run(spark, sf_dir, "qs226_vocab_coverage")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, iv = exp[r["source"]]
        assert (r["n_tokens"], r["in_vocab"]) == (n, iv)
        assert r["coverage_e6"] == iv * 1_000_000 // n


def test_intent_qs247_position_attribution(spark, sf_dir):
    from collections import defaultdict

    ev = _pd(sf_dir, "events").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    credit = defaultdict(float)
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        fpos = next(
            (k for k, t in enumerate(types, 1) if t == "purchase"), None
        )
        if fpos is None:
            continue
        n = fpos
        for pos, t in enumerate(types[:fpos], 1):
            if n == 1:
                credit[t] += 100.0
            elif n == 2:
                credit[t] += 50.0
            elif pos in (1, n):
                credit[t] += 40.0
            else:
                credit[t] += 20.0 / (n - 2)
    got = _run(spark, sf_dir, "qs247_position_attribution")
    assert len(got) == len(credit)
    for _, r in got.iterrows():
        assert abs(r["credit"] - credit[r["event_type"]]) <= 2e-3


def test_intent_qs252_vocab_jaccard_sources(spark, sf_dir):
    import re as _re

    d = _pd(sf_dir, "documents")
    vocab: dict[str, set] = {}
    for r in d.itertuples():
        vocab.setdefault(r.source, set()).update(
            t for t in _re.split(r"\s+", r.text.lower()) if t
        )
    got = _run(spark, sf_dir, "qs252_vocab_jaccard_sources")
    srcs = sorted(vocab)
    n_pairs = sum(
        1
        for i in range(len(srcs))
        for j in range(i + 1, len(srcs))
        if vocab[srcs[i]] & vocab[srcs[j]]
    )
    assert len(got) == n_pairs
    for _, r in got.iterrows():
        a, b = vocab[r["s1"]], vocab[r["s2"]]
        i = len(a & b)
        assert (r["inter"], r["v1"], r["v2"]) == (i, len(a), len(b))
        assert abs(r["jaccard"] - round(i / len(a | b), 4)) <= 2e-4


def test_intent_qs262_ngram_novelty(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    grams: dict[int, set] = {}
    owner: dict[tuple, int] = {}
    for r in d.itertuples():
        ts = r.text.split(" ")
        gs = {tuple(ts[i : i + 3]) for i in range(len(ts) - 2)}
        grams[r.doc_id] = gs
        for g in gs:
            owner[g] = min(owner.get(g, r.doc_id), r.doc_id)
    got = _run(spark, sf_dir, "qs262_ngram_novelty")
    exp = {doc: gs for doc, gs in grams.items() if gs}
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        gs = exp[r["doc_id"]]
        nov = sum(owner[g] == r["doc_id"] for g in gs) / len(gs)
        assert r["n_grams"] == len(gs)
        assert abs(r["novelty"] - round(nov, 4)) <= 2e-4


def test_intent_qs268_weighted_vocab_jaccard(spark, sf_dir):
    import re as _re
    from collections import Counter

    d = _pd(sf_dir, "documents")
    cnt: dict[str, Counter] = {}
    for r in d.itertuples():
        cnt.setdefault(r.source, Counter()).update(
            t for t in _re.split(r"\s+", r.text.lower()) if t
        )
    got = _run(spark, sf_dir, "qs268_weighted_vocab_jaccard")
    for _, r in got.iterrows():
        a, b = cnt[r["s1"]], cnt[r["s2"]]
        union = set(a) | set(b)
        smin = sum(min(a[t], b[t]) for t in union)
        smax = sum(max(a[t], b[t]) for t in union)
        assert (r["w_inter"], r["w_union"]) == (smin, smax)
        assert abs(r["weighted_jaccard"] - round(smin / smax, 4)) <= 2e-4


def test_intent_qs295_langid_f1(spark, sf_dir):
    # Independent P/R/F1 + macro/micro ALGEBRA check from the raw
    # confusion pairs (the lexicon scorer itself is exercised by the
    # qs244 kappa intent test; the risk class here is the F1/macro
    # formula wiring).
    from collections import Counter

    from cds_etl_spark.catalog import load_table
    from cds_etl_spark.operators.text_analysis import language_id
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    pairs = Counter(
        (r["truth"], r["guess"])
        for r in d.select(
            F.col("lang").alias("truth"),
            language_id(F.col("text")).alias("guess"),
        ).collect()
    )
    labs = sorted({t for t, _g in pairs})
    stats = {}
    for lab in labs:
        tp = pairs.get((lab, lab), 0)
        fp = sum(n for (t, g), n in pairs.items() if g == lab and t != g)
        fn = sum(n for (t, g), n in pairs.items() if t == lab and t != g)
        p = tp / (tp + fp) if tp + fp else 0.0
        r_ = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r_ / (p + r_) if p + r_ else 0.0
        stats[lab] = (tp, fp, fn, p, r_, f1)
    got = _run(spark, sf_dir, "qs295_langid_f1_eval")
    by = {r["class"]: r for _, r in got.iterrows()}
    for lab, (tp, fp, fn, p, r_, f1) in stats.items():
        row = by[lab]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn)
        assert abs(row["precision_"] - p) <= 2e-4
        assert abs(row["recall_"] - r_) <= 2e-4
        assert abs(row["f1"] - f1) <= 2e-4
    macro = by["macro"]
    assert abs(
        macro["f1"] - sum(s[5] for s in stats.values()) / len(stats)
    ) <= 2e-4
    micro = by["micro"]
    tp_all = sum(s[0] for s in stats.values())
    fp_all = sum(s[1] for s in stats.values())
    assert abs(micro["precision_"] - tp_all / (tp_all + fp_all)) <= 2e-4


def test_intent_qs313_k_anonymity(spark, sf_dir):
    import math as _m
    from collections import Counter

    c = _pd(sf_dir, "customer")
    cls = Counter(
        zip(
            c["c_nationkey"],
            c["c_mktsegment"],
            (c["c_acctbal"] / 100).apply(_m.floor),
        )
    )
    got = _run(spark, sf_dir, "qs313_k_anonymity").iloc[0]
    assert got["n_classes"] == len(cls)
    assert got["min_k"] == min(cls.values())
    assert got["rows_below_5"] == sum(k for k in cls.values() if k < 5)
    assert got["classes_below_5"] == sum(1 for k in cls.values() if k < 5)
    assert got["n_rows"] == len(c)


def test_intent_qs360_boilerplate_ngrams(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    inst: dict[str, Counter] = {}
    docs: dict[str, dict] = {}
    n_docs = Counter(d["source"])
    for r in d.itertuples():
        ts = [t for t in r.text.lower().split(" ") if t]
        bgs = [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        ic = inst.setdefault(r.source, Counter())
        dc = docs.setdefault(r.source, {})
        ic.update(bgs)
        for bg in set(bgs):
            dc.setdefault(bg, set()).add(r.doc_id)
    got = _run(spark, sf_dir, "qs360_boilerplate_ngrams")
    assert len(got) == len(inst)
    for _, r in got.iterrows():
        src = r["source"]
        boiler = {bg for bg, ds in docs[src].items() if len(ds) >= 3}
        total = sum(inst[src].values())
        bi = sum(n for bg, n in inst[src].items() if bg in boiler)
        assert r["n_docs"] == n_docs[src]
        assert r["n_boiler_bigrams"] == len(boiler)
        assert abs(r["boiler_ratio"] - round(bi / total, 6)) <= 2e-6


# -- wave 25 (r13): EXACT-DEFINITIONAL retirement, fourth batch -------------


def test_intent_qs135_duplicate_spans(spark, sf_dir):
    d = _pd(sf_dir, "documents")
    toks = {r.doc_id: r.text.split(" ") for r in d.itertuples()}
    wins: dict[tuple, list] = {}
    for doc, ts in toks.items():
        for i in range(len(ts) - 9):
            wins.setdefault(tuple(ts[i : i + 10]), []).append((doc, i + 1))
    exp: dict[int, list] = {}
    for w, hits in wins.items():
        if len(hits) > 1 and len({d0 for d0, _p in hits}) > 1:
            for doc, pos in hits:
                exp.setdefault(doc, []).append(pos)
    got = _run(spark, sf_dir, "qs135_duplicate_spans")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        ps = exp[r["doc_id"]]
        assert r["n_dup_spans"] == len(ps)
        assert r["first_pos"] == min(ps)


def test_intent_qs158_epoch_shard_plan(spark, sf_dir):
    import hashlib

    d = _pd(sf_dir, "documents")
    rows = []
    for doc in d["doc_id"]:
        hx = hashlib.md5(f"{doc}|epoch1".encode()).hexdigest()
        hk = int(hx[:8], 16) % 1_000_000
        rows.append((int(doc), hk % 8, hx))
    exp = {}
    for shard in range(8):
        members = sorted(
            ((hx, doc) for doc, s, hx in rows if s == shard)
        )
        for pos, (_hx, doc) in enumerate(members, 1):
            exp[doc] = (shard, pos)
    got = _run(spark, sf_dir, "qs158_epoch_shard_plan")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["doc_id"]] == (r["shard"], r["pos"])


def test_intent_qs175_key_skew_diagnosis(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    freq = li.groupby("l_suppkey").size()
    order = sorted(freq.index, key=lambda k: (freq[k], k))
    n = len(order)
    total = int(freq.sum())
    srnf = sum((i + 1) * freq[k] for i, k in enumerate(order))
    top10 = sum(
        freq[k]
        for k in sorted(freq.index, key=lambda k: (-freq[k], k))[:10]
    )
    gini = round((2.0 * srnf - (n + 1.0) * total) * 1e6 / (n * total))
    got = _run(spark, sf_dir, "qs175_key_skew_diagnosis").iloc[0]
    assert got["n_keys"] == n and got["total_rows"] == total
    assert got["max_freq"] == freq.max()
    assert got["gini_e6"] == gini
    assert got["top10_share_e6"] == round(top10 * 1e6 / total)


def test_intent_qs223_event_study_lift(spark, sf_dir):
    import datetime as dt

    o = _pd(sf_dir, "orders")
    cu = _pd(sf_dir, "customer")
    na = _pd(sf_dir, "nation")
    rg = _pd(sf_dir, "region")
    j = (
        o.merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    d = j["o_orderdate"].dt.date
    j = j[(d >= dt.date(1996, 12, 18)) & (d < dt.date(1997, 1, 2))]
    j = j.assign(c=_cents(j["o_totalprice"]))
    pre = j[j["o_orderdate"].dt.date < dt.date(1996, 12, 25)]
    post = j[j["o_orderdate"].dt.date >= dt.date(1996, 12, 25)]
    pre_c = pre.groupby("r_name")["c"].sum()
    post_c = post.groupby("r_name")["c"].sum()
    got = _run(spark, sf_dir, "qs223_event_study_lift")
    for _, r in got.iterrows():
        p = int(pre_c.get(r["region"], 0))
        q = int(post_c.get(r["region"], 0))
        if not pd.isna(r["pre_cents"]):
            assert r["pre_cents"] == p
        if not pd.isna(r["post_cents"]):
            assert r["post_cents"] == q
        if p and not pd.isna(r["lift_e4"]):
            assert r["lift_e4"] == q * 7 * 10000 // (p * 8)


def test_intent_qs236_mix_shift_decomposition(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    o = o[o["o_orderdate"].dt.year.isin([1996, 1998])]
    g = (
        o.assign(c=_cents(o["o_totalprice"]), y=o["o_orderdate"].dt.year)
        .groupby(["o_orderpriority", "y"])
        .agg(n=("c", "size"), c=("c", "sum"))
        .reset_index()
    )
    piv = g.pivot(index="o_orderpriority", columns="y")
    tn0 = piv["n"][1996].sum()
    tn1 = piv["n"][1998].sum()
    got = _run(spark, sf_dir, "qs236_mix_shift_decomposition")
    assert len(got) == len(piv)
    for _, r in got.iterrows():
        n0, n1 = piv["n"][1996][r["seg"]], piv["n"][1998][r["seg"]]
        c0, c1 = piv["c"][1996][r["seg"]], piv["c"][1998][r["seg"]]
        w0, w1 = n0 / tn0, n1 / tn1
        m0, m1 = c0 / n0, c1 / n1
        assert abs(r["mix_effect"] - round((w1 - w0) * m0, 4)) <= 2e-4
        assert abs(r["rate_effect"] - round(w0 * (m1 - m0), 4)) <= 2e-4
        assert abs(
            r["interaction_effect"] - round((w1 - w0) * (m1 - m0), 4)
        ) <= 2e-4


def test_intent_qs256_frequent_triples(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    li = _pd(sf_dir, "lineitem")
    p = _pd(sf_dir, "part")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    baskets: dict[int, set] = {}
    for o, b in zip(j["l_orderkey"], j["p_brand"]):
        baskets.setdefault(o, set()).add(b)
    sup = Counter()
    for bs in baskets.values():
        for tri in combinations(sorted(bs), 3):
            sup[tri] += 1
    exp = {t: n for t, n in sup.items() if n >= 5}
    got = _run(spark, sf_dir, "qs256_frequent_triples")
    gs = {
        (r["b1"], r["b2"], r["b3"]): r["support"]
        for _, r in got.iterrows()
    }
    assert gs == exp


def test_intent_qs258_fd_profile(spark, sf_dir):
    cands = (
        ("orders", "o_orderkey", "o_custkey"),
        ("orders", "o_custkey", "o_orderstatus"),
        ("part", "p_name", "p_brand"),
        ("lineitem", "l_partkey", "l_suppkey"),
    )
    got = _run(spark, sf_dir, "qs258_fd_profile").set_index("det_col")
    for tbl, det, dep in cands:
        t = _pd(sf_dir, tbl)
        nd = t.groupby(det)[dep].nunique()
        row = got.loc[det]
        assert row["n_det"] == len(nd)
        assert row["violations"] == int((nd > 1).sum())
        assert row["holds"] == int((nd > 1).sum() == 0)


def test_intent_qs266_temporal_consistency(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    o = _pd(sf_dir, "orders")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    yr = j["o_orderdate"].dt.year
    before = j["l_shipdate"] < j["o_orderdate"]
    over = (~before) & (
        (j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize())
        .dt.days
        > 365
    )
    exp = (
        pd.DataFrame({"yr": yr, "b": before, "ov": over})
        .groupby("yr")
        .agg(n=("b", "size"), sb=("b", "sum"), so=("ov", "sum"))
    )
    got = _run(spark, sf_dir, "qs266_temporal_consistency")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        e = exp.loc[r["yr"]]
        assert r["n_lines"] == e["n"]
        assert r["ship_before_order"] == e["sb"]
        assert r["ship_over_1y"] == e["so"]
        assert abs(r["violation_rate"] - round(e["sb"] / e["n"], 4)) <= 2e-4


def test_intent_qs281_inventory_policy(spark, sf_dir):
    import math as _m

    li = _pd(sf_dir, "lineitem")
    p = _pd(sf_dir, "part")
    wk = (
        pd.DataFrame(
            {
                "part": li["l_partkey"],
                "w": li["l_shipdate"]
                - pd.to_timedelta(li["l_shipdate"].dt.weekday, unit="D"),
                "d": li["l_quantity"].astype(int),
            }
        )
        .groupby(["part", pd.Grouper(key="w")])["d"]
        .sum()
        .reset_index()
    )
    brand = dict(zip(p["p_partkey"], p["p_brand"]))
    agg: dict[tuple, list] = {}
    for part, g in wk.groupby("part"):
        ds = g["d"].to_numpy(dtype=float)
        if len(ds) < 8:
            continue
        mu = ds.mean()
        sigma = ds.std(ddof=0)
        cv = sigma / mu
        xyz = "X" if cv < 0.25 else ("Y" if cv < 0.5 else "Z")
        rop = _m.ceil(2.0 * mu + 1.645 * sigma * _m.sqrt(2.0))
        agg.setdefault((brand[part], xyz), []).append(rop)
    got = _run(spark, sf_dir, "qs281_inventory_policy")
    assert len(got) == len(agg)
    for _, r in got.iterrows():
        rops = agg[(r["brand"], r["xyz"])]
        assert r["n_parts"] == len(rops)
        assert abs(
            r["avg_reorder_point"] - round(sum(rops) / len(rops), 2)
        ) <= 2e-2


def test_intent_qs314_filter_yield_audit(spark, sf_dir):
    import re as _re

    d = _pd(sf_dir, "documents")
    stop = {"the", "and", "of", "to", "in", "a", "is", "that"}
    flags = []
    for r in d.itertuples():
        toks = r.text.split(" ")
        n = len(toks)
        flags.append(
            (
                int(50 <= n <= 100_000),
                int(3.0 <= sum(len(t) for t in toks) / n <= 10.0),
                int(sum(t in stop for t in toks) >= 2),
                int(
                    sum(bool(_re.search("[a-zA-Z]", t)) for t in toks) / n
                    >= 0.8
                ),
            )
        )
    rules = ("words_ok", "mean_len_ok", "stopwords_ok", "alpha_ok")
    got = _run(spark, sf_dir, "qs314_filter_yield_audit").set_index("rule")
    for i, rule in enumerate(rules):
        n_fail = sum(1 - f[i] for f in flags)
        n_only = sum(
            1
            for f in flags
            if f[i] == 0 and all(f[j] for j in range(4) if j != i)
        )
        cum = sum(1 for f in flags if all(f[: i + 1]))
        row = got.loc[f"{i + 1}_{rule}"]
        assert row["n_docs"] == len(flags)
        assert (row["n_fail"], row["n_only_fail"], row["survivors_cum"]) == (
            n_fail, n_only, cum,
        ), rule


# -- wave 26 (r13): EXACT-DEFINITIONAL retirement, final batch --------------


def test_intent_qs50_word_count(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    c = Counter()
    for r in d.itertuples():
        c.update(r.text.lower().split(" "))
    exp = sorted(((-n, w) for w, n in c.items()))[:20]
    got = _run(spark, sf_dir, "qs50_word_count")
    assert [(-r["c"], r["word"]) for _, r in got.iterrows()] == exp


def test_intent_qs88_profile_columns(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    got = _run(spark, sf_dir, "qs88_profile_columns").set_index("col_name")
    for col in ("c_mktsegment", "c_nationkey", "c_acctbal"):
        row = got.loc[col]
        assert row["n_rows"] == len(c)
        assert row["n_null"] == int(c[col].isna().sum())
        assert row["n_distinct"] == c[col].nunique()


def test_intent_qs136_rag_chunks(spark, sf_dir):
    import hashlib

    d = _pd(sf_dir, "documents")
    exp = {}
    for r in d.itertuples():
        n = len(r.text.split(" "))
        n_chunks = max(1, (n + 63) // 96)
        for i in range(n_chunks):
            start = i * 96 + 1
            exp[(r.doc_id, i)] = (
                start,
                min(n - start + 1, 128),
                hashlib.md5(f"{r.doc_id}:{i}".encode()).hexdigest(),
            )
    got = _run(spark, sf_dir, "qs136_rag_chunks")
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r["doc_id"], r["chunk_idx"])] == (
            r["start_pos"], r["chunk_len"], r["chunk_id"],
        )


def test_intent_qs148_pii_scan_redact(spark, sf_dir):
    import hashlib
    import re as _re

    c = _pd(sf_dir, "customer")
    pats = [
        (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
        (r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
        (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
        (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IPV4]"),
    ]
    got = _run(spark, sf_dir, "qs148_pii_scan_redact").set_index("c_custkey")
    for r in c.itertuples():
        k, nk = int(r.c_custkey), int(r.c_nationkey)
        txt = f"{r.c_name} <user{k}@mail.test> ip 10.{k % 250}.0.{nk % 250}"
        if k % 3 == 0:
            txt += f" ssn {k % 1000:03d}-{nk % 100:02d}-{k % 10000:04d}"
        if k % 4 == 0:
            txt += (
                f" tel {nk % 100:02d}-{k % 1000:03d}-"
                f"{nk % 1000:03d}-{k % 10000:04d}"
            )
        counts = [len(_re.findall(p, txt)) for p, _s in pats]
        red = txt
        for p, s in pats:
            red = _re.sub(p, s, red)
        row = got.loc[k]
        assert (
            row["n_email"], row["n_phone"], row["n_ssn"], row["n_ipv4"]
        ) == tuple(counts), k
        assert row["redacted_h"] == hashlib.md5(red.encode()).hexdigest()


def test_intent_qs225_golden_record(spark, sf_dir):
    c = _pd(sf_dir, "customer")
    c = c.assign(
        entity=c["c_custkey"] // 5, bal=_cents(c["c_acctbal"])
    )
    got = _run(spark, sf_dir, "qs225_golden_record").set_index("entity")
    assert len(got) == c["entity"].nunique()
    for ent, g in c.groupby("entity"):
        key = g["bal"] * 10_000_000 + g["c_custkey"]
        row = got.loc[ent]
        assert row["n_records"] == len(g)
        assert row["name"] == g.loc[key.idxmax(), "c_name"]
        assert row["best_bal_cents"] == g["bal"].max()
        assert row["segment"] == g.loc[g["c_custkey"].idxmin(),
                                       "c_mktsegment"]
        assert row["nationkey"] == g["c_nationkey"].min()


def test_intent_qs263_rake_keyphrases(spark, sf_dir):
    import re as _re
    from collections import Counter, defaultdict

    stops = {"the", "a", "of", "and", "to", "in", "is", "that", "it",
             "for"}
    d = _pd(sf_dir, "documents")
    phrases = []  # (doc, island, phrase)
    for r in d.itertuples():
        toks = _re.split(r"\s+", r.text.lower())
        island = 0
        cur: list = []
        for tok in toks:
            if tok == "" or tok in stops:
                island += 1
                if cur:
                    phrases.append((r.doc_id, island - 1, " ".join(cur)))
                cur = []
            else:
                cur.append(tok)
        if cur:
            phrases.append((r.doc_id, island, " ".join(cur)))
    phrases = [
        (doc, isl, p) for doc, isl, p in phrases
        if 1 <= len(p.split(" ")) <= 4
    ]
    freq = Counter()
    deg = Counter()
    for _doc, _isl, p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    best: dict[str, float] = {}
    occ = Counter()
    for _doc, _isl, p in phrases:
        score = sum(deg[w] / freq[w] for w in p.split(" "))
        best[p] = max(best.get(p, float("-inf")), score)
        occ[p] += 1
    exp = sorted(
        ((-round(s, 4), p) for p, s in best.items())
    )[:15]
    got = _run(spark, sf_dir, "qs263_rake_keyphrases")
    gs = [(-r["rake_score"], r["phrase"]) for _, r in got.iterrows()]
    assert [(round(-a, 4), b) for a, b in gs] == [
        (round(-a, 4), b) for a, b in exp
    ]
    for _, r in got.iterrows():
        assert r["occurrences"] == occ[r["phrase"]]


def test_intent_qs356_l_diversity(spark, sf_dir):
    o = _pd(sf_dir, "orders")
    c = _pd(sf_dir, "customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cls = j.groupby(["c_nationkey", "c_mktsegment"]).agg(
        l=("o_orderpriority", "nunique"), n=("o_orderpriority", "size")
    )
    got = _run(spark, sf_dir, "qs356_l_diversity").iloc[0]
    assert got["n_classes"] == len(cls)
    assert got["min_l"] == cls["l"].min()
    assert got["max_l"] == cls["l"].max()
    assert got["n_l_ge_3"] == int((cls["l"] >= 3).sum())
    assert got["min_class_rows"] == cls["n"].min()


def test_intent_qs60_document_profile(spark, sf_dir):
    # Full independent rebuild of every profile column from the
    # documented definitions (operators/text_analysis + functions/
    # text): whitespace tokens, punct/stopword ratios, lexicon-argmax
    # language ID with lexicon-order ties, BPE-ish subword count,
    # dyadic quality score, and the k-min shingle fingerprint.
    import hashlib
    import re as _re

    lex = {
        "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it",
               "for"),
        "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit",
               "auf", "zu"),
        "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no",
               "por"),
        "fr": ("le", "la", "de", "et", "un", "est", "pas", "que", "pour",
               "dans"),
    }
    d = _pd(sf_dir, "documents")
    got = _run(spark, sf_dir, "qs60_document_profile").set_index("doc_id")
    assert len(got) == len(d)
    for r in d.itertuples():
        text = r.text
        toks = _re.split(r"\s+", text.lower())
        n_tok = len(toks)
        n_chars = len(text)
        n_punct = len(_re.findall(r"[^A-Za-z0-9\s]", text))
        hits = {
            lang: sum(t in ws for t in toks) for lang, ws in lex.items()
        }
        n_stop = hits["en"]
        best = max(hits.values())
        lang_guess = (
            next(lg for lg in lex if hits[lg] == best) if best > 0
            else "und"
        )
        mean_len = sum(len(t) for t in toks) / n_tok if n_tok else 0.0
        n_bpe = len(
            _re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text)
        )
        score = (
            (5 <= n_tok <= 100_000)
            + (n_stop > 0)
            + (n_punct / n_chars < 0.2 if n_chars else True)
            + (2.0 <= mean_len <= 12.0)
        ) / 4.0
        raw = text.split(" ")
        shingles = list(
            dict.fromkeys(
                " ".join(raw[i : i + 3]) for i in range(len(raw) - 2)
            )
        )
        hs = sorted(
            hashlib.md5(s.encode()).hexdigest() for s in shingles
        )
        fp = hashlib.md5(",".join(hs[:4]).encode()).hexdigest()
        row = got.loc[r.doc_id]
        assert row["n_chars"] == n_chars and row["n_tokens"] == n_tok
        assert abs(row["punct_ratio"] - (n_punct / n_chars if n_chars
                                         else 0.0)) <= 1e-12
        assert abs(row["stopword_ratio"] - (n_stop / n_tok if n_tok
                                            else 0.0)) <= 1e-12
        assert abs(row["mean_token_len"] - mean_len) <= 1e-12
        assert row["n_bpe_tokens"] == n_bpe
        assert row["lang_guess"] == lang_guess
        assert row["quality"] == score
        assert row["fingerprint"] == fp


# -- wave 27 (r13): the qs402-qs405 additions -------------------------------


def test_intent_qs402_embedding_simhash_recall(spark, sf_dir):
    # Full pure-numpy/hashlib serving path: md5-parity hyperplanes,
    # exact e6 integer projections, 4x4 banding, candidate probe,
    # cosine ranking with the qs52 round-4 convention.
    import hashlib

    e = _pd(sf_dir, "embeddings")
    ids = e["vec_id"].to_numpy()
    V = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    X = np.round(V * 1_000_000).astype(np.int64)
    W = np.empty((16, 64), dtype=np.int64)
    for j in range(16):
        for d in range(1, 65):
            h = hashlib.md5(f"{j}|{d}".encode()).hexdigest()
            W[j, d - 1] = 1 if int(h[:8], 16) % 2 == 1 else -1
    proj = X @ W.T  # (n, 16) exact integers
    bits = (proj >= 0).astype(np.int64)
    bands = np.stack(
        [
            sum(bits[:, 4 * b + k] << k for k in range(4))
            for b in range(4)
        ],
        axis=1,
    )
    qi = int(np.where(ids == 0)[0][0])
    cand = {
        int(ids[r])
        for r in range(len(ids))
        if ids[r] != 0 and any(bands[r, b] == bands[qi, b] for b in range(4))
    }
    q = V[qi]
    sims = {}
    for r in range(len(ids)):
        if ids[r] == 0:
            continue
        v = V[r]
        sims[int(ids[r])] = round(
            float(v @ q / (np.sqrt(v @ v) * np.sqrt(q @ q))), 4
        )
    brute = [
        vid for _s, vid in sorted(((-s, v) for v, s in sims.items()))[:10]
    ]
    short = [
        vid
        for _s, vid in sorted(
            ((-sims[v], v) for v in cand)
        )[:10]
    ]
    hits = len(set(brute) & set(short))
    got = _run(spark, sf_dir, "qs402_embedding_simhash_recall").iloc[0]
    assert got["n_vectors"] == len(ids)
    assert got["n_candidates"] == len(cand)
    assert got["hits_at_10"] == hits
    assert got["recall_e6"] == hits * 1_000_000 // 10


def test_intent_qs403_krippendorff_alpha(spark, sf_dir):
    li = _pd(sf_dir, "lineitem")
    g = li.groupby("l_orderkey")
    two = g.filter(lambda x: len(x) == 2).copy()
    two["ok"] = two["l_linenumber"] * 4 + two["l_returnflag"].map(
        {"A": 0, "N": 1}
    ).fillna(2).astype(int)
    two = two.sort_values(["l_orderkey", "ok"], kind="mergesort")
    a = two.groupby("l_orderkey")["l_returnflag"].first()
    b = two.groupby("l_orderkey")["l_returnflag"].last()
    n = len(a)
    agree = int((a.to_numpy() == b.to_numpy()).sum())
    big_n = 2 * n
    sum_c2 = sum(
        (int((a == f).sum()) + int((b == f).sum())) ** 2
        for f in ("R", "N", "A")
    )
    d_o = (n - agree) / n
    d_e = (big_n * big_n - sum_c2) / (big_n * (big_n - 1))
    got = _run(spark, sf_dir, "qs403_krippendorff_alpha").iloc[0]
    assert got["n_subjects"] == n
    assert abs(got["d_o"] - d_o) <= 2e-6
    assert abs(got["d_e"] - d_e) <= 2e-6
    assert abs(got["krippendorff_alpha"] - (1 - d_o / d_e)) <= 2e-6


def test_intent_qs404_chao1_vocab(spark, sf_dir):
    from collections import Counter

    d = _pd(sf_dir, "documents")
    tc: dict[str, Counter] = {}
    for r in d.itertuples():
        tc.setdefault(r.source, Counter()).update(
            t for t in r.text.lower().split(" ") if t
        )
    got = _run(spark, sf_dir, "qs404_chao1_vocab")
    assert len(got) == len(tc)
    for _, r in got.iterrows():
        c = tc[r["source"]]
        v = len(c)
        f1 = sum(1 for x in c.values() if x == 1)
        f2 = sum(1 for x in c.values() if x == 2)
        assert (r["v_observed"], r["singletons"], r["doubletons"]) == (
            v, f1, f2,
        )
        assert abs(
            r["chao1"] - round(v + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 4)
        ) <= 2e-4


def test_intent_qs405_rayleigh_weekday(spark, sf_dir):
    import math as _m
    from collections import Counter

    o = _pd(sf_dir, "orders")
    # pandas weekday: Monday=0; the query uses Spark dayofweek
    # (Sunday=1 .. Saturday=7) — map independently.
    k = ((o["o_orderdate"].dt.weekday + 1) % 7 + 1).to_numpy()
    c = Counter(k)
    n = len(o)
    cs = sum(v * _m.cos(2 * _m.pi * kk / 7) for kk, v in c.items())
    sn = sum(v * _m.sin(2 * _m.pi * kk / 7) for kk, v in c.items())
    rbar = _m.sqrt(cs * cs + sn * sn) / n
    got = _run(spark, sf_dir, "qs405_rayleigh_weekday").iloc[0]
    assert got["n_orders"] == n
    assert abs(got["rbar"] - rbar) <= 2e-6
    assert abs(got["rayleigh_z"] - n * rbar * rbar) <= 2e-4
