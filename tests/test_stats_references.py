"""Independent pure-Python references for the round-7 statistics queries.

The DuckDB oracles replay the same closed-form formulas as the Spark
plans, so a shared formula error would pass parity silently. These tests
recompute each statistic from first principles in plain Python (no SQL,
no Spark expressions) on the sf0.001 fixture and compare to the
registered query's output.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from utils_spark.registry import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def events_rows(duck):
    return duck.execute(
        "SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events"
    ).fetchall()


def _avg_ranks(values):
    """Average ranks (R convention) for a list of floats."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_mann_whitney_reference(spark, sf_dir, events_rows):
    by_type = defaultdict(list)
    for et, _ts, _u, v in events_rows:
        by_type[et].append(v)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in (x.asDict() for x in REGISTRY["mann_whitney_u"].fn(spark, sf_dir).collect())
    }
    types = sorted(by_type)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = by_type[ta], by_type[tb]
            pooled = xa + xb
            ranks = _avg_ranks(pooled)
            ra = sum(ranks[: len(xa)])
            na, nb = len(xa), len(xb)
            u = ra - na * (na + 1) / 2.0
            n = na + nb
            ties = sum(t**3 - t for t in Counter(pooled).values())
            var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
            z = (u - na * nb / 2.0) / math.sqrt(var)
            row = got[(ta, tb)]
            assert row["n_a"] == na and row["n_b"] == nb
            assert abs(row["u_stat"] - u) < 0.51  # engine rounds to 1dp
            assert abs(row["z_stat"] - z) < 1e-5


def test_kruskal_wallis_reference(spark, sf_dir, events_rows):
    vals, grps = [], []
    for et, _ts, _u, v in events_rows:
        vals.append(v)
        grps.append(et)
    ranks = _avg_ranks(vals)
    rg, ng = defaultdict(float), defaultdict(int)
    for g, r in zip(grps, ranks):
        rg[g] += r
        ng[g] += 1
    n = float(len(vals))
    ties = sum(t**3 - t for t in Counter(vals).values())
    h = (12.0 / (n * (n + 1)) * sum(rg[g] ** 2 / ng[g] for g in rg) - 3 * (n + 1)) / (
        1 - ties / (n**3 - n)
    )
    out = REGISTRY["kruskal_wallis"].fn(spark, sf_dir).collect()
    assert len(out) == len(rg)
    for row in out:
        g = row["event_type"]
        assert row["n"] == ng[g]
        assert abs(row["rank_sum"] - rg[g]) < 0.51
        assert abs(row["h_stat"] - h) < 1e-5
        assert row["dof"] == len(rg) - 1


def test_mann_kendall_reference(spark, sf_dir, events_rows):
    daily = defaultdict(lambda: defaultdict(int))
    for et, ts, _u, _v in events_rows:
        daily[et][ts.date()] += 1
    out = {r["event_type"]: r for r in REGISTRY["mann_kendall_trend"].fn(spark, sf_dir).collect()}
    for et, days in daily.items():
        xs = [c for _d, c in sorted(days.items())]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i]) for i in range(n) for j in range(i + 1, n)
        )
        tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
        var = (n * (n - 1) * (2 * n + 5) - tie_sum) / 18.0
        z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
        row = out[et]
        assert row["n_days"] == n and row["s_stat"] == s
        assert abs(row["z_stat"] - z) < 1e-5


def test_kaplan_meier_reference(spark, sf_dir, events_rows):
    first_any, first_purchase = {}, {}
    for et, ts, u, _v in events_rows:
        if u not in first_any or ts < first_any[u]:
            first_any[u] = ts
        if et == "purchase" and (u not in first_purchase or ts < first_purchase[u]):
            first_purchase[u] = ts
    durs = []
    for u, f0 in first_any.items():
        # whole-second truncation matches unix_timestamp/date_diff('second')
        secs = int(first_purchase[u].replace(microsecond=0).timestamp()) - int(
            f0.replace(microsecond=0).timestamp()
        )
        h = secs // 3600
        durs.append((min(h, 48), 1 if h <= 48 else 0))
    times = sorted({t for t, _ in durs})
    out = {r["duration_hours"]: r for r in REGISTRY["kaplan_meier_retention"].fn(spark, sf_dir).collect()}
    s = 1.0
    seen_event_rows = 0
    for t in times:
        n_risk = sum(1 for tt, _ in durs if tt >= t)
        d = sum(1 for tt, ev in durs if tt == t and ev == 1)
        c = sum(1 for tt, ev in durs if tt == t and ev == 0)
        if d > 0:
            s *= 1 - d / n_risk
            row = out[t]
            seen_event_rows += 1
            assert row["n_risk"] == n_risk and row["d_events"] == d and row["n_censored"] == c
            assert abs(row["s_t"] - s) < 1e-5
    assert seen_event_rows == len(out) and seen_event_rows > 0


def test_bootstrap_weights_reference(spark, sf_dir, events_rows):
    """Replicate 0's Poisson weights and mean for one series, from raw
    hashlib md5 — independent of both engines' hash SQL."""
    cdf = (0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431, 0.9963401532, 0.9994058151)
    daily = defaultdict(lambda: defaultdict(list))
    for et, ts, _u, v in events_rows:
        daily[et][ts.date()].append(v)
    et = sorted(daily)[0]
    means = {d: sum(vs) / len(vs) for d, vs in daily[et].items()}
    num = den = 0.0
    for d, x in means.items():
        key = f"{et}:{d.isoformat()}:0".encode()
        u = (int(hashlib.md5(key).hexdigest()[:15], 16) % 1000000) / 1000000.0
        w = 6
        for k, thr in enumerate(cdf):
            if u < thr:
                w = k
                break
        num += w * x
        den += w
    assert den > 0
    expected_rep0 = num / den
    # recompute the replicate-0 mean via the registered plan's own building
    # blocks is circular; instead check it falls inside the reported CI and
    # that the CI is ordered and brackets the full mean
    row = {r["event_type"]: r for r in REGISTRY["bootstrap_ci"].fn(spark, sf_dir).collect()}[et]
    assert row["ci_lo"] <= row["ci_hi"]
    assert row["ci_lo"] <= row["mean_full"] <= row["ci_hi"]
    # replicate 0 is one draw from the bootstrap distribution: it must lie
    # within the full replicate range, which the nearest-rank CI bounds up
    # to the 2.5% tails; allow the tail margin via a loose sanity band
    spread = row["ci_hi"] - row["ci_lo"]
    assert row["ci_lo"] - 2 * spread <= expected_rep0 <= row["ci_hi"] + 2 * spread


def test_proportions_ab_reference(spark, sf_dir, events_rows):
    per_user = defaultdict(int)
    for et, _ts, u, _v in events_rows:
        if et == "purchase":
            per_user[u] += 1
    users = {u for _et, _ts, u, _v in events_rows}
    n = {0: 0, 1: 0}
    k = {0: 0, 1: 0}
    for u in users:
        arm = u % 2
        n[arm] += 1
        k[arm] += 1 if per_user.get(u, 0) >= 15 else 0
    diff = k[1] / n[1] - k[0] / n[0]
    pp = (k[0] + k[1]) / (n[0] + n[1])
    z = (
        diff / math.sqrt(pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
        if 0 < pp < 1
        else None
    )
    out = {r["arm"]: r for r in REGISTRY["proportions_ab_test"].fn(spark, sf_dir).collect()}
    for arm in (0, 1):
        assert out[arm]["n_users"] == n[arm] and out[arm]["n_converted"] == k[arm]
        assert abs(out[arm]["rate_diff"] - diff) < 1e-5
        if z is None:
            assert out[arm]["z_stat"] is None
        else:
            assert abs(out[arm]["z_stat"] - z) < 1e-5


def test_hits_reference_numpy(spark):
    """ml.hits on a fixed 6-node bipartite graph vs an independent NumPy
    power iteration."""
    import numpy as np

    edges = [(0, 10), (0, 11), (1, 10), (2, 10), (2, 12), (3, 12)]
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    from utils_spark.operators.ml import hits

    hubs, auths = hits(sdf, n_iter=3)
    hub_got = {r["node"]: r["score"] for r in hubs.collect()}
    auth_got = {r["node"]: r["score"] for r in auths.collect()}

    srcs = sorted({s for s, _ in edges})
    dsts = sorted({d for _, d in edges})
    a_mat = np.zeros((len(srcs), len(dsts)))
    for s, d in edges:
        a_mat[srcs.index(s), dsts.index(d)] = 1.0
    h = np.ones(len(srcs))
    for _ in range(3):
        a = a_mat.T @ h
        a = a / np.linalg.norm(a)
        h = a_mat @ a
        h = h / np.linalg.norm(h)
    for i, s in enumerate(srcs):
        assert abs(hub_got[s] - h[i]) < 1e-9
    for j, d in enumerate(dsts):
        assert abs(auth_got[d] - a[j]) < 1e-9


def test_naive_bayes_reference(spark, sf_dir, duck):
    """Pure-Python multinomial NB on the same train/test split, with the
    engine's top-K-per-language feature cap replicated."""
    from utils_spark.queries.text import NB_TOPK_FEATURES

    docs = duck.execute("SELECT doc_id, lang, text FROM documents").fetchall()
    train = [(l, t) for i, l, t in docs if i % 2 == 0]
    test = [(i, l, t) for i, l, t in docs if i % 2 == 1]
    wc = defaultdict(Counter)
    prior = Counter()
    for l, t in train:
        prior[l] += 1
        for w in t.split(" "):
            if w:
                wc[l][w] += 1
    # engine feature cap: top-K per language, count desc then word asc
    wc = {
        l: Counter(
            dict(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:NB_TOPK_FEATURES])
        )
        for l, c in wc.items()
    }
    vocab = {w for c in wc.values() for w in c}
    v = float(len(vocab))
    tot = {l: float(sum(c.values())) for l, c in wc.items()}
    n_train = float(len(train))
    conf = Counter()
    for _i, true_l, t in test:
        words = Counter(w for w in t.split(" ") if w)
        best = None
        for l in sorted(prior):
            s = math.log(prior[l] / n_train)
            for w, q in words.items():
                s += q * (math.log(wc[l].get(w, 0) + 1) - math.log(tot[l] + v))
            s = round(s, 6)
            if best is None or s > best[0] or (s == best[0] and l < best[1]):
                best = (s, l)
        conf[(true_l, best[1])] += 1
    out = REGISTRY["naive_bayes_langid"].fn(spark, sf_dir).collect()
    got = {(r["true_lang"], r["pred_lang"]): r["n"] for r in out}
    assert got == dict(conf)
    acc = sum(n for (a, b), n in conf.items() if a == b) / sum(conf.values())
    assert abs(out[0]["accuracy"] - acc) < 1e-3
