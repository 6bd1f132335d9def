"""Independent-implementation checks for queries/mlstats.py.

The oracle parity sweep (test_oracle_parity.py) proves Spark ≡ DuckDB on
the same formulas; these tests prove the formulas themselves against a
THIRD implementation (numpy / sklearn-free reference code) and pin the
sketch invariants that parity alone cannot see.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tlcn_oer_lakehouse_spark.queries import mlstats


@pytest.fixture(scope="module")
def lineitem_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def events_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_ols_matches_numpy_polyfit(spark, sf_dir, lineitem_pd):
    rows = {r["l_returnflag"]: r
            for r in mlstats.ml_ols_regression(spark, sf_dir).collect()}
    for flag, grp in lineitem_pd.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=np.float64)
        y = grp["l_extendedprice"].to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        r = rows[flag]
        assert r["slope"] == pytest.approx(slope, rel=1e-9)
        assert r["intercept"] == pytest.approx(intercept, rel=1e-9)
        r2_ref = np.corrcoef(x, y)[0, 1] ** 2
        assert r["r2"] == pytest.approx(r2_ref, rel=1e-6)


def test_auc_matches_rank_reference(spark, sf_dir, events_pd):
    row = mlstats.ml_auc_roc(spark, sf_dir).collect()[0]
    score = events_pd["value"].to_numpy()
    label = (events_pd["event_type"] == "purchase").to_numpy()
    # tie-aware Mann-Whitney via scipy-free average ranks
    order = pd.Series(score).rank(method="average").to_numpy()
    npos = int(label.sum())
    nneg = len(label) - npos
    auc_ref = (order[label].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert row["npos"] == npos and row["nneg"] == nneg
    assert row["auc"] == pytest.approx(auc_ref, abs=1e-12)
    assert 0.0 <= row["auc"] <= 1.0
    assert row["gini"] == pytest.approx(2 * row["auc"] - 1, abs=1e-12)


def test_feature_scaling_matches_numpy(spark, sf_dir, lineitem_pd):
    rows = {r["l_returnflag"]: r
            for r in mlstats.ml_feature_scaling(spark, sf_dir).collect()}
    for flag, grp in lineitem_pd.groupby("l_returnflag"):
        x = grp["l_extendedprice"].to_numpy(dtype=np.float64)
        r = rows[flag]
        assert r["n"] == len(x)
        assert r["mean_price"] == pytest.approx(x.mean(), rel=1e-12)
        assert r["std_price"] == pytest.approx(x.std(), rel=1e-9)
        z = (x - x.mean()) / x.std()
        assert r["n_outliers"] == int((np.abs(z) > 2.0).sum())


def test_quantile_buckets_are_balanced(spark, sf_dir):
    rows = mlstats.ml_quantile_bucketize(spark, sf_dir).collect()
    counts = {r["bucket"]: r["n"] for r in rows}
    assert set(counts) == {1, 2, 3, 4}
    total = sum(counts.values())
    # quartile binning: every bucket within ±2 rows of n/4 (interpolated
    # cutoffs split ties deterministically)
    for b, n in counts.items():
        assert abs(n - total / 4) <= 2, (b, n, total)
    # bucket value ranges must not overlap
    ordered = [r for _, r in sorted((r["bucket"], r) for r in rows)]
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo["max_price"] <= hi["min_price"]


def test_confusion_metrics_identities(spark, sf_dir):
    row = mlstats.ml_confusion_metrics(spark, sf_dir).collect()[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == len(orders)
    prec = row["tp"] / (row["tp"] + row["fp"])
    rec = row["tp"] / (row["tp"] + row["fn"])
    assert row["precision_"] == pytest.approx(prec, abs=1e-15)
    assert row["recall_"] == pytest.approx(rec, abs=1e-15)
    assert row["f1"] == pytest.approx(2 * prec * rec / (prec + rec), abs=1e-12)


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    rows = mlstats.a_kmv_distinct(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        if r["k_used"] < mlstats._KMV_K:
            # below k the sketch IS the value set — estimate must be exact
            assert r["est_distinct"] == r["exact_distinct"]
        else:
            # KMV standard error ≈ 1/sqrt(k-2); allow 5σ
            rel = abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 5.0 / np.sqrt(mlstats._KMV_K - 2), r


def test_kmv_set_ops_invariants(spark, sf_dir, events_pd):
    row = mlstats.a_kmv_set_ops(spark, sf_dir).collect()[0]
    a = set(events_pd.loc[events_pd["event_type"] == "click", "user_id"])
    b = set(events_pd.loc[events_pd["event_type"] == "purchase", "user_id"])
    assert row["exact_union"] == len(a | b)
    assert row["exact_intersection"] == len(a & b)
    assert 0.0 <= row["jaccard_est"] <= 1.0
    assert row["est_intersection"] <= row["est_union"] + 1e-9
    if row["k_used"] >= mlstats._KMV_K:
        rel = abs(row["est_union"] - row["exact_union"]) / row["exact_union"]
        assert rel < 5.0 / np.sqrt(mlstats._KMV_K - 2)


def test_naive_bayes_each_doc_predicted_once(spark, sf_dir):
    rows = mlstats.ml_naive_bayes_langid(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == len(docs)
    per_true = {}
    for r in rows:
        per_true[r["lang_true"]] = per_true.get(r["lang_true"], 0) + r["n_docs"]
    assert per_true == docs.groupby("lang").size().to_dict()


def test_naive_bayes_separates_distinct_vocabularies(spark):
    # the driver corpus's lang label is independent of its shared
    # vocabulary, so classifier QUALITY is proven on a corpus whose
    # classes actually have distinct (but overlapping) vocabularies
    rows = []
    vocab = {
        "aa": ["alpha", "beta", "gamma", "delta", "shared"],
        "bb": ["uno", "dos", "tres", "cuatro", "shared"],
        "cc": ["eins", "zwei", "drei", "vier", "shared"],
    }
    i = 0
    for lang, words in vocab.items():
        for _ in range(6):
            text = " ".join(words[(i + j) % 4] for j in range(8)) + " shared"
            rows.append((i, lang, text))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    out = mlstats.naive_bayes_confusion(docs).collect()
    total = sum(r["n_docs"] for r in out)
    correct = sum(r["n_docs"] for r in out if r["lang_true"] == r["lang_pred"])
    assert total == 18 and correct == 18, out


def test_chi2_matches_numpy_formula(spark, sf_dir):
    import pandas as pd

    rows = mlstats.ml_chi2_features(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(docs)
    import re

    present = {
        lang: {}
        for lang in docs["lang"].unique()
    }
    tok_docs = {}
    for _, row in docs.iterrows():
        toks = set(re.sub(r"\s+", " ", row["text"].lower()).strip().split(" "))
        for t in toks:
            tok_docs.setdefault(t, set()).add(row["doc_id"])
            present[row["lang"]][t] = present[row["lang"]].get(t, 0) + 1
    c_tot = docs.groupby("lang").size().to_dict()
    for r in rows:
        a = present[r["lang"]].get(r["t"], 0)
        assert a == r["n_docs_with"]
        b = len(tok_docs[r["t"]]) - a
        c = c_tot[r["lang"]] - a
        d = n - len(tok_docs[r["t"]]) - c_tot[r["lang"]] + a
        chi2_ref = n * (a * d - b * c) ** 2 / (
            (a + b) * (c + d) * (a + c) * (b + d)
        )
        assert r["chi2"] == pytest.approx(chi2_ref, rel=1e-12)
        assert 1 <= r["rnk"] <= mlstats._CHI2_TOPK


def test_welch_matches_numpy(spark, sf_dir, events_pd):
    row = mlstats.ml_welch_ttest(spark, sf_dir).collect()[0]
    a = events_pd.loc[events_pd["event_type"] == "click", "value"].to_numpy()
    b = events_pd.loc[events_pd["event_type"] == "purchase", "value"].to_numpy()
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["mean_a"] == pytest.approx(a.mean(), rel=1e-12)
    assert row["var_a"] == pytest.approx(a.var(ddof=1), rel=1e-9)
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t_ref = (a.mean() - b.mean()) / np.sqrt(se2)
    df_ref = se2**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["t_stat"] == pytest.approx(t_ref, rel=1e-9)
    assert row["welch_df"] == pytest.approx(df_ref, rel=1e-9)


def test_covariance_matches_numpy(spark, sf_dir):
    rows = mlstats.ml_covariance_block(spark, sf_dir).collect()
    assert len(rows) == 36
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy())[:, : mlstats._COV_DIMS]
    # the operator defines covariance on the 1e-6 fixed-point quantized
    # inputs; against raw-float numpy it agrees to quantization error
    ref = np.cov(x, rowvar=False, bias=True)
    got = {(r.i, r.j): r.cov for r in rows}
    for i in range(mlstats._COV_DIMS):
        for j in range(i, mlstats._COV_DIMS):
            assert got[(i, j)] == pytest.approx(ref[i, j], abs=2e-6)
    # diagonal is a variance: non-negative
    assert all(got[(k, k)] >= 0 for k in range(mlstats._COV_DIMS))


def test_kaplan_meier_hand_computed_fixture(spark, tmp_path):
    """Textbook KM on a hand-built cohort: durations/censoring chosen so
    every n_i, d_i and survival step is checkable by hand."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 6 users, study 0..20 days; censor horizon = final 12h
    # u1: days 0..2  -> dur 2, churned
    # u2: days 0..2  -> dur 2, churned
    # u3: days 0..5  -> dur 5, churned
    # u4: days 3..8  -> dur 5, churned
    # u5: days 0..20 -> dur 20, censored (active at end)
    # u6: days 1..20 -> dur 19, censored
    day = 86400 * 1_000_000  # µs
    events = []
    spans = {1: (0, 2), 2: (0, 2), 3: (0, 5), 4: (3, 8), 5: (0, 20), 6: (1, 20)}
    eid = 0
    for u, (a, b) in spans.items():
        for d in (a, b):
            events.append((eid, d * day, u))
            eid += 1
    t = pa.table({
        "event_id": pa.array([e[0] for e in events], type=pa.int64()),
        "ts": pa.array([e[1] for e in events], type=pa.timestamp("us")),
        "user_id": pa.array([e[2] for e in events], type=pa.int64()),
        "event_type": pa.array(["view"] * len(events)),
        "value": pa.array([1.0] * len(events)),
        "props": pa.array(["{}"] * len(events)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    rows = {r.duration_days: r
            for r in mlstats.ml_kaplan_meier(spark, str(d)).collect()}
    # t=2: n=6 at risk, d=2 -> S = 1 - 2/6 = 2/3
    assert rows[2].n_at_risk == 6 and rows[2].n_events == 2
    assert rows[2].survival == pytest.approx(2 / 3, abs=1e-12)
    # t=5: n=4 at risk, d=2 -> S = (2/3)(1 - 2/4) = 1/3
    assert rows[5].n_at_risk == 4 and rows[5].n_events == 2
    assert rows[5].survival == pytest.approx(1 / 3, abs=1e-12)
    # censored users produce no event rows
    assert set(rows) == {2, 5}


def test_kaplan_meier_monotone_on_real_data(spark, sf_dir):
    rows = sorted(mlstats.ml_kaplan_meier(spark, sf_dir).collect(),
                  key=lambda r: r.duration_days)
    assert rows, "expected at least one churn event"
    last = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= last + 1e-15  # non-increasing
        assert 0 < r.n_events <= r.n_at_risk
        last = r.survival


def test_lift_gain_identities(spark, sf_dir, events_pd):
    rows = sorted(mlstats.ml_lift_gain(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    n = len(events_pd)
    npos = int((events_pd["event_type"] == "purchase").sum())
    assert sum(r.n_rows for r in rows) == n
    assert sum(r.d_pos for r in rows) == npos
    assert rows[-1].cum_pos == npos
    assert rows[-1].gain == pytest.approx(1.0, abs=1e-15)
    # gains are non-decreasing; decile sizes within 1 of n/10
    gains = [r.gain for r in rows]
    assert gains == sorted(gains)
    assert all(abs(r.n_rows - n / 10) <= 1 for r in rows)
    # average of lifts weighted by decile size = 1
    w = sum(r.lift * r.n_rows for r in rows) / n
    assert w == pytest.approx(1.0, rel=1e-12)


@pytest.mark.parametrize("n_shuffle", ["5", "13"])
def test_prefix_sum_partition_count_from_session_conf(spark, sf_dir, n_shuffle):
    """The two-phase prefix sum reads its scan width from
    spark.sql.shuffle.partitions (not a test-scale constant) and its
    RESULT is partition-count-independent — both consumers stay
    oracle-green under non-default widths."""
    from tests.oracle_harness import compare
    from tlcn_oer_lakehouse_spark.queries import REGISTRY

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n_shuffle)
    try:
        for qname in ("ml_auc_roc", "td_token_budget_shards_scalable"):
            ok, msg = compare(spark, sf_dir, REGISTRY[qname])
            assert ok, f"{qname} @ shuffle={n_shuffle}: {msg}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
