"""Distributed ML-statistics operators: feature engineering, model
fitting/evaluation, and mergeable distinct sketches with set algebra.

The reference ships its model work to single-node Python (semantic
matching `semantic_matcher.py`, E5 embedding `elasticsearch_sync.py:397`);
everything feeding those models — scaling, binning, train-set statistics,
eval metrics — is exactly the work a 100 TB pipeline must do IN the
engine.  Each operator here is a pure DataFrame plan built from
sufficient statistics, so the data-proportional cost is one scan plus
partial-aggregated shuffles:

- ``ml_feature_scaling``   — standard-scaler fit (mean/std from exact
  decimal moments) + z-score outlier count.  Two passes: moments, then a
  broadcast join back for the outlier scan (the textbook fit/transform
  split).
- ``ml_quantile_bucketize`` — quartile binning against exact interpolated
  percentile cutoffs (one sort-based agg → 1-row broadcast → map-only
  bucket assignment → count agg).
- ``ml_ols_regression``     — per-group closed-form OLS (slope, intercept,
  R²) from five decimal-exact sufficient statistics in ONE aggregation
  pass: n, Σx, Σy, Σxy, Σx², Σy².  No iteration, no driver math beyond
  the final scalar arithmetic, which runs inside the same plan.
- ``ml_confusion_metrics``  — confusion matrix + accuracy / precision /
  recall / F1 for a rule-based classifier, one aggregation pass of
  conditional counts.
- ``ml_auc_roc``            — exact ROC-AUC via the tie-corrected
  Mann-Whitney rank statistic.  Ranks come from a score histogram
  (groupBy score — map-side combined) followed by the repo's two-phase
  distributed prefix sum (range partition → per-partition window →
  per-partition totals broadcast back), so there is NO global-order
  window over row-level data: the only full sort is over partition
  totals (one row per partition).  Integer arithmetic until the final
  division.
- ``a_kmv_distinct`` / ``a_kmv_set_ops`` — K-Minimum-Values (theta)
  sketch over the portable md5-prefix hash: per-key distinct-count
  estimates, and — the capability HLL lacks — sketch SET ALGEBRA
  (union θ, intersection via the ρ/k inclusion estimator, Jaccard).
  Min-k is computed hierarchically: per-shuffle-partition top-k first
  (parallel, bounded output k·P rows), then a global top-k over that
  tiny residue — no global sort of the distinct-hash domain.

Determinism contract (`queries/base.py`): additive moments go through
DECIMAL casts; per-row scalar double math (z-scores, slope/R² formulas,
AUC's one division) is written with the SAME expression tree in the
Spark builder and the DuckDB oracle, so IEEE-754 evaluation is
bit-identical.  Hashes are the portable md5-prefix-8 longs
(`functions/ids.py:surrogate_key`), replayable in any engine.

One measured refinement to that contract: when a decimal sum's unscaled
value exceeds 2^53 (the Σx² moments here reach ~10^20 units at scale 6),
DuckDB's direct DECIMAL→DOUBLE cast is NOT correctly rounded (measured
74364878754370.0359 → 74364878754370.05; the exact double is ...03,
which Spark and Python both produce).  Those casts therefore hop through
a string on BOTH sides (`CAST(CAST(s AS VARCHAR) AS DOUBLE)`) — the
decimal values are bit-identical, so the strings are identical, and
string→double parsing is correctly rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.queries.base import (
    QuerySpec,
    load,
    prefix_sum_partitions,
)

# ---------------------------------------------------------------------------
# standard scaler fit + outlier transform
# ---------------------------------------------------------------------------


def ml_feature_scaling(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group standard-scaler fit on ``l_extendedprice`` + |z|>2 outlier
    count.  Moments are decimal-exact; mean/std/z math mirrors the oracle
    expression-for-expression."""
    li = load(spark, sf, "lineitem")
    n = F.count(F.lit(1))
    stats = li.groupBy("l_returnflag").agg(
        n.alias("n"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("string").cast("double") / n
         ).alias("mean_price"),
        (F.sum((F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_extendedprice").cast("decimal(18,2)"))
               .cast("decimal(38,6)")).cast("string").cast("double") / n
         ).alias("e2"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    ).withColumn(
        "std_price",
        F.sqrt(F.col("e2") - F.col("mean_price") * F.col("mean_price")),
    )
    z = (F.col("l_extendedprice") - F.col("mean_price")) / F.col("std_price")
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag", "n", "mean_price", "std_price",
                 "min_price", "max_price")
        .agg(F.sum(F.when(F.abs(z) > F.lit(2.0), 1).otherwise(0)).alias("n_outliers"))
        .select("l_returnflag", "n", "mean_price", "std_price",
                "min_price", "max_price", "n_outliers")
    )


FEATURE_SCALING_SQL = """
WITH stats AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean_price,
         CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS e2,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price
  FROM lineitem GROUP BY l_returnflag
), stats2 AS (
  SELECT *, sqrt(e2 - mean_price * mean_price) AS std_price FROM stats
)
SELECT li.l_returnflag, s.n, s.mean_price, s.std_price, s.min_price, s.max_price,
       CAST(SUM(CASE WHEN abs((li.l_extendedprice - s.mean_price) / s.std_price) > 2.0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM lineitem li JOIN stats2 s ON li.l_returnflag = s.l_returnflag
GROUP BY li.l_returnflag, s.n, s.mean_price, s.std_price, s.min_price, s.max_price
"""


# ---------------------------------------------------------------------------
# quantile bucketizer
# ---------------------------------------------------------------------------


def ml_quantile_bucketize(spark: SparkSession, sf: str) -> DataFrame:
    """Quartile binning of ``o_totalprice``: exact interpolated cutoffs
    (round-6, the parity form proven by ``a_exact_percentile``) broadcast
    into a map-only CASE ladder, then per-bucket profile."""
    orders = load(spark, sf, "orders")
    cuts = orders.agg(
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.50)), 6).alias("q2"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.75)), 6).alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


QUANTILE_BUCKETIZE_SQL = """
WITH cuts AS (
  SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS q1,
         round(quantile_cont(o_totalprice, 0.50), 6) AS q2,
         round(quantile_cont(o_totalprice, 0.75), 6) AS q3
  FROM orders
)
SELECT CASE WHEN o_totalprice <= q1 THEN 1
            WHEN o_totalprice <= q2 THEN 2
            WHEN o_totalprice <= q3 THEN 3
            ELSE 4 END AS bucket,
       COUNT(*) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders CROSS JOIN cuts
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# closed-form OLS from sufficient statistics
# ---------------------------------------------------------------------------


def ml_ols_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group simple OLS of ``l_extendedprice`` on ``l_quantity``:
    slope/intercept/R² from one aggregation pass of decimal-exact
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²).  The closed-form
    scalar arithmetic runs on doubles with the identical expression tree
    in both engines (products/sums exact up to the final divisions)."""
    li = load(spark, sf, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    moments = li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,6)")).cast("string").cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,6)")).cast("string").cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,6)")).cast("string").cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return moments.select(
        "l_returnflag",
        "n",
        (num / den).alias("slope"),
        ((F.col("sy") - (num / den) * F.col("sx")) / F.col("n")).alias("intercept"),
        ((num * num) / (den * den_y)).alias("r2"),
    )


OLS_SQL = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM m
"""


# ---------------------------------------------------------------------------
# confusion matrix + derived classifier metrics
# ---------------------------------------------------------------------------

_URGENT_CUT = 300000.0  # rule threshold: "high-value order predicts urgency"


def ml_confusion_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier evaluation in one conditional-count pass: confusion
    matrix for the rule ``o_totalprice > cut ⇒ urgent`` against the
    ``1-URGENT`` label, plus accuracy/precision/recall/F1."""
    orders = load(spark, sf, "orders")
    pred = (F.col("o_totalprice") > F.lit(_URGENT_CUT)).cast("int")
    lab = (F.col("o_orderpriority") == "1-URGENT").cast("int")
    cm = orders.agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
        F.sum((1 - pred) * (1 - lab)).alias("tn"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    return cm.select(
        "tp", "fp", "fn", "tn",
        ((F.col("tp") + F.col("tn")).cast("double")
         / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))).alias("accuracy"),
        prec.alias("precision_"),
        rec.alias("recall_"),
        (F.lit(2.0) * prec * rec / (prec + rec)).alias("f1"),
    )


CONFUSION_SQL = f"""
WITH cm AS (
  SELECT SUM(p * l) AS tp, SUM(p * (1 - l)) AS fp,
         SUM((1 - p) * l) AS fn, SUM((1 - p) * (1 - l)) AS tn
  FROM (SELECT CASE WHEN o_totalprice > {_URGENT_CUT} THEN 1 ELSE 0 END AS p,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS l
        FROM orders)
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy,
       CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
       CAST(tp AS DOUBLE) / (tp + fn) AS recall_,
       2.0 * (CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn))
         / ((CAST(tp AS DOUBLE) / (tp + fp)) + (CAST(tp AS DOUBLE) / (tp + fn))) AS f1
FROM cm
"""


# ---------------------------------------------------------------------------
# exact ROC-AUC (tie-corrected Mann-Whitney), two-phase prefix sum
# ---------------------------------------------------------------------------


def ml_auc_roc(spark: SparkSession, sf: str) -> DataFrame:
    """Exact AUC of score=``value`` for label=``event_type='purchase'``.

    Mann-Whitney with average-rank tie correction, all-integer until the
    final division: per distinct score the histogram holds (cnt, pos);
    2·Σranks(pos) = Σ pos·(2·cum_less + cnt + 1), and
    AUC = (2Σranks − npos(npos+1)) / (2·npos·nneg).

    ``cum_less`` is the repo's two-phase distributed prefix sum over the
    score histogram — range-partition by score, per-partition window,
    partition totals (one row each) broadcast back as offsets.  No
    global-order window touches row-level data."""
    ev = load(spark, sf, "events")
    hist = (
        ev.select(F.col("value").alias("score"),
                  (F.col("event_type") == "purchase").cast("int").alias("pos"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pos_cnt"))
    )
    parts = (
        hist.repartitionByRange(prefix_sum_partitions(spark), "score")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    totals = parts.groupBy("pid").agg(F.sum("cnt").alias("part_total")).collect()
    running = 0
    offset_rows = []
    for row in sorted(totals, key=lambda r: r.pid):
        offset_rows.append((row.pid, running))
        running += row.part_total
    offsets = spark.createDataFrame(offset_rows, "pid INT, part_offset LONG")
    w = Window.partitionBy("pid").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        parts.withColumn("local_less", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .join(F.broadcast(offsets), "pid")
        .withColumn("cum_less", F.col("local_less") + F.col("part_offset"))
    )
    # NOTE: `parts` stays persisted — the returned plan is lazy, and
    # unpersisting before the caller's action would recompute
    # repartitionByRange with fresh sampling, invalidating the collected
    # offsets (same contract as token_budget_shards_scalable).
    agg = ranked.agg(
        F.sum(F.col("pos_cnt")
              * (F.lit(2) * F.col("cum_less") + F.col("cnt") + F.lit(1))
              ).alias("sumr2"),
        F.sum("pos_cnt").alias("npos"),
        F.sum("cnt").alias("n"),
    )
    npos = F.col("npos")
    nneg = F.col("n") - npos
    auc = (F.col("sumr2") - npos * (npos + F.lit(1))).cast("double") / (
        F.lit(2.0) * npos * nneg
    )
    return agg.select(
        npos.alias("npos"),
        nneg.alias("nneg"),
        auc.alias("auc"),
        (F.lit(2.0) * auc - F.lit(1.0)).alias("gini"),
    )


AUC_SQL = """
WITH hist AS (
  SELECT value AS score, COUNT(*) AS cnt,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos_cnt
  FROM events GROUP BY value
), ranked AS (
  SELECT cnt, pos_cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_less
  FROM hist
), a AS (
  SELECT SUM(pos_cnt * (2 * cum_less + cnt + 1)) AS sumr2,
         SUM(pos_cnt) AS npos, SUM(cnt) AS n
  FROM ranked
)
SELECT CAST(npos AS BIGINT) AS npos, CAST(n - npos AS BIGINT) AS nneg,
       CAST(sumr2 - npos * (npos + 1) AS DOUBLE) / (2.0 * npos * (n - npos)) AS auc,
       2.0 * (CAST(sumr2 - npos * (npos + 1) AS DOUBLE) / (2.0 * npos * (n - npos))) - 1.0 AS gini
FROM a
"""


# ---------------------------------------------------------------------------
# KMV (theta) distinct sketch + set algebra
# ---------------------------------------------------------------------------

_KMV_K = 64
_HASH_SPACE = 4294967296.0  # 2^32 — md5-prefix-8 hash domain


def _user_hashes(ev: DataFrame) -> DataFrame:
    """Distinct (event_type, h) where h is the portable md5-prefix-8 long
    of user_id — the sketch's hash domain, replayable in any engine."""
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
               ).cast("long")
    return ev.select("event_type", h.alias("h")).distinct()


_USER_HASH_SQL = """
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM events
"""


def _min_k_per_type(hashes: DataFrame, k: int) -> DataFrame:
    """Hierarchical min-k: per-shuffle-partition top-k (parallel, output
    ≤ k·P rows) then a global top-k over that residue.  Identical result
    to one global sort — min-k of per-partition min-k's IS the global
    min-k — without ever sorting the full distinct-hash domain."""
    pre = (
        hashes.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("event_type", "pid").orderBy("h")
            ),
        )
        .filter(F.col("prn") <= k)
    )
    return (
        pre.withColumn(
            "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("rn") <= k)
        .select("event_type", "h", "rn")
    )


def a_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type distinct-user estimate from a k=64 KMV (theta) sketch.

    θ = (k-th smallest normalized hash); est = (k−1)/θ when the stream
    has ≥ k distinct hashes, exact count otherwise (the sketch IS the
    value set below k).  Exact distinct kept alongside so the estimate's
    error is visible in the result itself."""
    ev = load(spark, sf, "events")
    hashes = _user_hashes(ev).persist()
    kmin = _min_k_per_type(hashes, _KMV_K)
    per_type = kmin.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
    )
    exact = hashes.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.when(
        F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_HASH_SPACE) / (F.col("hk") + F.lit(1)).cast("double")
    )
    out = (
        per_type.join(exact, "event_type")
        .select("event_type", "k_used", est.alias("est_distinct"), "exact_distinct")
    )
    return out


KMV_DISTINCT_SQL = f"""
WITH hashes AS ({_USER_HASH_SQL}),
kmin AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashes
), pt AS (
  SELECT event_type, COUNT(*) AS k_used,
         MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
  FROM kmin WHERE rn <= {_KMV_K} GROUP BY event_type
), ex AS (
  SELECT event_type, COUNT(*) AS exact_distinct FROM hashes GROUP BY event_type
)
SELECT pt.event_type, pt.k_used,
       CASE WHEN pt.k_used < {_KMV_K} THEN CAST(pt.k_used AS DOUBLE)
            ELSE {float(_KMV_K - 1)} * {_HASH_SPACE} / CAST(pt.hk + 1 AS DOUBLE)
       END AS est_distinct,
       ex.exact_distinct
FROM pt JOIN ex ON pt.event_type = ex.event_type
"""


def a_kmv_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """KMV sketch SET ALGEBRA for the ('click','purchase') user sets —
    the capability HLL registers lack: union via the combined-stream θ,
    intersection via the ρ/k inclusion estimator (ρ = union-k-min hashes
    present in BOTH sets), Jaccard = ρ/k.  Exact counterparts computed
    alongside from the same distinct-hash frames."""
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    flags = (
        _user_hashes(ev)
        .groupBy("h")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("in_a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("in_b"),
        )
        .persist()
    )
    pre = (
        flags.withColumn("pid", F.spark_partition_id())
        .withColumn("prn", F.row_number().over(Window.partitionBy("pid").orderBy("h")))
        .filter(F.col("prn") <= _KMV_K)
    )
    kmin = (
        pre.withColumn("rn", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("h")))
        .filter(F.col("rn") <= _KMV_K)
    )
    sketch = kmin.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("rho"),
    )
    exact = flags.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("exact_intersection"),
    )
    est_union = F.when(
        F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_HASH_SPACE) / (F.col("hk") + F.lit(1)).cast("double")
    )
    jac = F.col("rho").cast("double") / F.col("k_used")
    return (
        sketch.crossJoin(F.broadcast(exact))
        .select(
            F.col("k_used"),
            est_union.alias("est_union"),
            F.col("exact_union"),
            jac.alias("jaccard_est"),
            (jac * est_union).alias("est_intersection"),
            F.col("exact_intersection"),
        )
    )


KMV_SET_OPS_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM events WHERE event_type IN ('click', 'purchase')
), flags AS (
  SELECT h,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM hashes GROUP BY h
), kmin AS (
  SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS rn FROM flags
), sk AS (
  SELECT COUNT(*) AS k_used,
         MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk,
         SUM(in_a * in_b) AS rho
  FROM kmin WHERE rn <= {_KMV_K}
), ex AS (
  SELECT COUNT(*) AS exact_union, SUM(in_a * in_b) AS exact_intersection FROM flags
)
SELECT sk.k_used,
       CASE WHEN sk.k_used < {_KMV_K} THEN CAST(sk.k_used AS DOUBLE)
            ELSE {float(_KMV_K - 1)} * {_HASH_SPACE} / CAST(sk.hk + 1 AS DOUBLE)
       END AS est_union,
       ex.exact_union,
       CAST(sk.rho AS DOUBLE) / sk.k_used AS jaccard_est,
       (CAST(sk.rho AS DOUBLE) / sk.k_used) *
       CASE WHEN sk.k_used < {_KMV_K} THEN CAST(sk.k_used AS DOUBLE)
            ELSE {float(_KMV_K - 1)} * {_HASH_SPACE} / CAST(sk.hk + 1 AS DOUBLE)
       END AS est_intersection,
       CAST(ex.exact_intersection AS BIGINT) AS exact_intersection
FROM sk CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# distributed covariance matrix (PCA's sufficient statistic)
# ---------------------------------------------------------------------------

_COV_DIMS = 8          # upper-triangle block emitted (36 cells)
_COV_SCALE = 1000000.0  # fixed-point quantization: q = floor(x·1e6 + 0.5)


def ml_covariance_block(spark: SparkSession, sf: str) -> DataFrame:
    """Covariance matrix of the embedding table's leading 8 dimensions —
    the sufficient statistic PCA/whitening eigendecomposes — in ONE
    aggregation pass of fixed-point moments (n, Σq_i, Σq_i·q_j).

    Float sums are partition-order-dependent, so the statistic is
    DEFINED on a deterministic fixed-point quantization of the inputs:
    q = floor(double(x)·1e6 + 0.5).  Two measured cross-engine traps
    shape that formula: DuckDB multiplies FLOAT columns without
    promoting to double (float32-rounded products; the explicit CAST
    fixes it), and round() ties break half-away in Spark but half-even
    in DuckDB (floor(·+0.5) is identical everywhere).  From the
    quantized integers everything is exact decimal arithmetic down to
    the final scalar divisions; the d×d driver-side eigensolve on this
    36-cell result is O(d³) scalar work, independent of corpus size."""
    emb = load(spark, sf, "embeddings")
    q = [
        F.floor(
            F.element_at("embedding", k + 1).cast("double") * F.lit(_COV_SCALE)
            + F.lit(0.5)
        ).cast("long").alias(f"q{k}")
        for k in range(_COV_DIMS)
    ]
    qdf = emb.select(*q)
    n = F.count(F.lit(1))
    aggs = [n.alias("n")]
    aggs += [F.sum(F.col(f"q{i}").cast("decimal(38,0)")).alias(f"s{i}")
             for i in range(_COV_DIMS)]
    aggs += [
        F.sum((F.col(f"q{i}") * F.col(f"q{j}")).cast("decimal(38,0)"))
        .alias(f"p{i}_{j}")
        for i in range(_COV_DIMS) for j in range(i, _COV_DIMS)
    ]
    m = qdf.agg(*aggs)
    cells = [
        F.struct(
            F.lit(i).alias("i"), F.lit(j).alias("j"),
            (
                (F.col("n").cast("decimal(38,0)") * F.col(f"p{i}_{j}")
                 - F.col(f"s{i}") * F.col(f"s{j}"))
                .cast("string").cast("double")
                / (F.col("n") * F.col("n"))
                / F.lit(_COV_SCALE * _COV_SCALE)
            ).alias("cov"),
        )
        for i in range(_COV_DIMS) for j in range(i, _COV_DIMS)
    ]
    return m.select(F.explode(F.array(*cells)).alias("c")).select(
        "c.i", "c.j", "c.cov"
    )


def _covariance_oracle() -> str:
    d, sc = _COV_DIMS, _COV_SCALE
    qs = ",\n         ".join(
        f"CAST(floor(CAST(embedding[{k + 1}] AS DOUBLE)*{sc} + 0.5) AS BIGINT) AS q{k}"
        for k in range(d)
    )
    sums = ",\n         ".join(
        [f"COUNT(*) AS n"]
        + [f"SUM(CAST(q{i} AS DECIMAL(38,0))) AS s{i}" for i in range(d)]
        + [f"SUM(CAST(q{i} * q{j} AS DECIMAL(38,0))) AS p{i}_{j}"
           for i in range(d) for j in range(i, d)]
    )
    cells = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {j} AS j, "
        f"CAST(CAST(CAST(n AS DECIMAL(38,0)) * p{i}_{j} - s{i} * s{j} AS VARCHAR) AS DOUBLE)"
        f" / (n * n) / {sc * sc} AS cov FROM m"
        for i in range(d) for j in range(i, d)
    )
    return f"""
WITH q AS (
  SELECT {qs}
  FROM embeddings
),
m AS MATERIALIZED (
  SELECT {sums}
  FROM q
)
{cells}
"""


# ---------------------------------------------------------------------------
# multinomial Naive Bayes language classifier (integer-surprisal scores)
# ---------------------------------------------------------------------------

_TOK_SQL = (
    "unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))"
)


def naive_bayes_confusion(docs: DataFrame) -> DataFrame:
    """Multinomial Naive Bayes over word unigrams, trained on the given
    ``(doc_id, lang, text)`` frame's own labels and evaluated by
    resubstitution — the engine-side analog of a fastText-style
    language-ID model, upgrading the n-gram heuristic in
    ``text_quality_langid``.

    Add-1-smoothed class-conditional scores use the repo's integer
    surprisal (`quality.py:unigram_surprisal`): cost(t,c) =
    floor(log2((denom_c + V) div (cnt_{t,c}+1))) bits via binary length —
    transcendental ``log`` is not cross-engine reproducible, integer bit
    length is.  Prediction = argmin total bits (+ class prior bits), ties
    broken lexicographically.  Output is the language confusion matrix.
    (On the driver-generated corpus the ``lang`` label is independent of
    the shared synthetic vocabulary, so the matrix correctly collapses
    toward the majority class; `test_mlstats.py` proves the classifier on
    a genuinely separable fixture corpus instead.)

    Plan shape: explode → (lang, token) counts → vocab×classes grid
    (V·C rows, class-count left join) → token-stream join on t → per
    (doc, class) partial-agg sum → per-doc argmin window over C rows.
    Linear in corpus tokens × C; no driver loops."""
    from tlcn_oer_lakehouse_spark.functions.text import tokens

    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t")
    ).persist()
    cc = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("cnt"))
    class_tot = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tok"))
    vocab = tok.select("t").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    doc_tot = docs.groupBy(F.col("lang").alias("prior_lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_docs_tot = docs.agg(F.count(F.lit(1)).alias("n_all"))
    # scoring grid: every (token, class) with its smoothed bit cost
    grid = (
        vocab.crossJoin(
            F.broadcast(class_tot.select(F.col("lang").alias("c"), "n_tok"))
        )
        .join(cc.select(F.col("lang").alias("c"), "t", "cnt"), ["c", "t"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "t", "c",
            (F.length(F.bin(F.expr("(n_tok + v) div (coalesce(cnt, 0) + 1)"))) - 1
             ).alias("bits"),
        )
    )
    prior = (
        doc_tot.crossJoin(F.broadcast(n_docs_tot))
        .select(
            F.col("prior_lang").alias("c"),
            (F.length(F.bin(F.expr("n_all div n_docs"))) - 1).alias("prior_bits"),
        )
    )
    scored = (
        tok.join(grid, "t")
        .groupBy("doc_id", "lang", "c")
        .agg(F.sum("bits").alias("tok_bits"))
        .join(F.broadcast(prior), "c")
        .withColumn("total_bits", F.col("tok_bits") + F.col("prior_bits"))
    )
    w = Window.partitionBy("doc_id").orderBy("total_bits", "c")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("lang_true"),
                F.col("c").alias("lang_pred"))
    )
    return pred.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def ml_naive_bayes_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Registry entry: NB confusion matrix over the documents table."""
    return naive_bayes_confusion(
        load(spark, sf, "documents").select("doc_id", "lang", "text")
    )


NAIVE_BAYES_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, {_TOK_SQL} AS t FROM documents
), cc AS (
  SELECT lang AS c, t, COUNT(*) AS cnt FROM tok GROUP BY lang, t
), class_tot AS (
  SELECT lang AS c, COUNT(*) AS n_tok FROM tok GROUP BY lang
), vocab AS (SELECT DISTINCT t FROM tok),
vsize AS (SELECT COUNT(*) AS v FROM vocab),
grid AS (
  SELECT vocab.t, ct.c,
         length(bin((ct.n_tok + vsize.v) // (COALESCE(cc.cnt, 0) + 1))) - 1 AS bits
  FROM vocab CROSS JOIN class_tot ct CROSS JOIN vsize
  LEFT JOIN cc ON cc.c = ct.c AND cc.t = vocab.t
), prior AS (
  SELECT lang AS c,
         length(bin((SELECT COUNT(*) FROM documents) // COUNT(*))) - 1 AS prior_bits
  FROM documents GROUP BY lang
), scored AS (
  SELECT tok.doc_id, tok.lang, grid.c,
         SUM(grid.bits) + ANY_VALUE(prior.prior_bits) AS total_bits
  FROM tok JOIN grid ON tok.t = grid.t
  JOIN prior ON prior.c = grid.c
  GROUP BY tok.doc_id, tok.lang, grid.c
), pred AS (
  SELECT doc_id, lang AS lang_true, c AS lang_pred,
         row_number() OVER (PARTITION BY doc_id ORDER BY total_bits, c) AS rn
  FROM scored
)
SELECT lang_true, lang_pred, COUNT(*) AS n_docs
FROM pred WHERE rn = 1
GROUP BY lang_true, lang_pred
"""


# ---------------------------------------------------------------------------
# chi-squared feature selection (token ↔ class association)
# ---------------------------------------------------------------------------

_CHI2_TOPK = 5


def ml_chi2_features(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k tokens per language by chi-squared association — the classic
    feature-selection pass before training a text classifier.

    Contingency cells per (token, class) come from document-level
    presence counts (one distinct-explode groupBy + a broadcast of the
    C-row class totals); the chi² statistic is then per-row double math
    on integer cells, identical in both engines.  Top-k per class orders
    by (chi² desc, token asc) — chi² values are bit-identical so the
    tie-break is total."""
    from tlcn_oer_lakehouse_spark.functions.text import tokens

    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    present = docs.select(
        "doc_id", "lang", F.explode_outer(tokens(F.col("text"))).alias("t")
    ).distinct()
    tc = present.groupBy("t", "lang").agg(F.count(F.lit(1)).alias("a"))
    t_tot = present.groupBy("t").agg(F.count(F.lit(1)).alias("t_docs"))
    c_tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c_docs"))
    n_tot = docs.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        tc.join(t_tot, "t")
        .join(F.broadcast(c_tot), "lang")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "t", "lang",
            F.col("a").cast("double").alias("a"),
            (F.col("t_docs") - F.col("a")).cast("double").alias("b"),
            (F.col("c_docs") - F.col("a")).cast("double").alias("c"),
            (F.col("n") - F.col("t_docs") - F.col("c_docs") + F.col("a"))
            .cast("double").alias("d"),
            F.col("n").cast("double").alias("n"),
        )
    )
    num = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    chi2 = (F.col("n") * num * num) / (
        (F.col("a") + F.col("b")) * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c")) * (F.col("b") + F.col("d"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("chi2").desc(), F.col("t").asc())
    return (
        cells.withColumn("chi2", chi2)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _CHI2_TOPK)
        .select("lang", "t", F.col("a").cast("long").alias("n_docs_with"),
                "chi2", "rnk")
    )


CHI2_SQL = f"""
WITH present AS (
  SELECT DISTINCT doc_id, lang, {_TOK_SQL} AS t FROM documents
), tc AS (
  SELECT t, lang, COUNT(*) AS a FROM present GROUP BY t, lang
), t_tot AS (SELECT t, COUNT(*) AS t_docs FROM present GROUP BY t),
c_tot AS (SELECT lang, COUNT(*) AS c_docs FROM documents GROUP BY lang),
n_tot AS (SELECT COUNT(*) AS n FROM documents),
cells AS (
  SELECT tc.t, tc.lang,
         CAST(tc.a AS DOUBLE) AS a,
         CAST(t_tot.t_docs - tc.a AS DOUBLE) AS b,
         CAST(c_tot.c_docs - tc.a AS DOUBLE) AS c,
         CAST(n_tot.n - t_tot.t_docs - c_tot.c_docs + tc.a AS DOUBLE) AS d,
         CAST(n_tot.n AS DOUBLE) AS n
  FROM tc JOIN t_tot USING (t) JOIN c_tot USING (lang) CROSS JOIN n_tot
), scored AS (
  SELECT t, lang, CAST(a AS BIGINT) AS n_docs_with,
         (n * (a * d - b * c) * (a * d - b * c))
           / ((a + b) * (c + d) * (a + c) * (b + d)) AS chi2
  FROM cells
), ranked AS (
  SELECT lang, t, n_docs_with, chi2,
         row_number() OVER (PARTITION BY lang ORDER BY chi2 DESC, t ASC) AS rnk
  FROM scored
)
SELECT lang, t, n_docs_with, chi2, rnk FROM ranked WHERE rnk <= {_CHI2_TOPK}
"""


# ---------------------------------------------------------------------------
# Welch's t-test (A/B experiment readout)
# ---------------------------------------------------------------------------


def ml_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test between the 'click' and 'purchase'
    value distributions — the A/B-test readout, computed from one pass of
    conditional decimal moments (n, Σx, Σx² per arm).  Sample variance,
    t-statistic and Welch–Satterthwaite df are per-row double math with
    the identical expression tree in both engines; p-values need the
    incomplete beta function and belong in the caller's stats library."""
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    x = F.col("value").cast("decimal(18,2)")
    is_a = (F.col("event_type") == "click").cast("int")
    m = ev.agg(
        F.sum(is_a).alias("n1"),
        F.sum(1 - is_a).alias("n2"),
        F.sum(F.when(is_a == 1, x)).cast("double").alias("s1"),
        F.sum(F.when(is_a == 0, x)).cast("double").alias("s2"),
        F.sum(F.when(is_a == 1, (x * x).cast("decimal(38,6)")))
        .cast("string").cast("double").alias("q1"),
        F.sum(F.when(is_a == 0, (x * x).cast("decimal(38,6)")))
        .cast("string").cast("double").alias("q2"),
    )
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1)
    se2_1 = v1 / F.col("n1")
    se2_2 = v2 / F.col("n2")
    t = (m1 - m2) / F.sqrt(se2_1 + se2_2)
    df = ((se2_1 + se2_2) * (se2_1 + se2_2)) / (
        se2_1 * se2_1 / (F.col("n1") - 1) + se2_2 * se2_2 / (F.col("n2") - 1)
    )
    return m.select(
        "n1", "n2",
        m1.alias("mean_a"), m2.alias("mean_b"),
        v1.alias("var_a"), v2.alias("var_b"),
        t.alias("t_stat"), df.alias("welch_df"),
    )


WELCH_SQL = """
WITH m AS (
  SELECT SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
         CAST(CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,6)) END) AS VARCHAR) AS DOUBLE) AS q1,
         CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,6)) END) AS VARCHAR) AS DOUBLE) AS q2
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       s1 / n1 AS mean_a, s2 / n2 AS mean_b,
       (q1 - s1 * s1 / n1) / (n1 - 1) AS var_a,
       (q2 - s2 * s2 / n2) / (n2 - 1) AS var_b,
       ((s1 / n1) - (s2 / n2))
         / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) AS t_stat,
       ((((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)
        * (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2))
         / ((((q1 - s1 * s1 / n1) / (n1 - 1)) / n1) * (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1) / (n1 - 1)
            + (((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) * (((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) / (n2 - 1)) AS welch_df
FROM m
"""


# ---------------------------------------------------------------------------
# decile lift / gain table (model-evaluation companion to ml_auc_roc)
# ---------------------------------------------------------------------------


def ml_lift_gain(spark: SparkSession, sf: str) -> DataFrame:
    """Decile lift & cumulative-gain table for score=``value`` against
    label=``event_type='purchase'`` — the campaign-targeting readout AUC
    alone doesn't give.  Rows rank by (score desc, event_id) — a TOTAL
    order, so decile assignment is deterministic — deciles cut by
    ``(rank−1)·10 div n``; per decile: size, positives, cumulative
    positives, gain = cum_pos/total_pos, lift = decile rate / overall
    rate.  Integer arithmetic until the final divisions.  Scale note: a
    global rank is a single-partition sort of the scored rows — the
    registered report form; the two-phase range-partition prefix sum
    (ml_auc_roc) is the documented swap when the scored set is the
    corpus itself."""
    ev = load(spark, sf, "events").select(
        "event_id",
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("event_id").asc())
    ranked = ev.withColumn("rn", F.row_number().over(w))
    n_tot = ranked.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("pos").alias("n_pos"))
    deciles = (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn("decile", F.expr("(rn - 1) * 10 div n") + 1)
        .groupBy("decile", "n", "n_pos")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("pos").alias("d_pos"))
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = deciles.withColumn("cum_pos", F.sum("d_pos").over(w_cum))
    return cum.select(
        "decile", "n_rows", "d_pos", "cum_pos",
        (F.col("cum_pos").cast("double") / F.col("n_pos")).alias("gain"),
        ((F.col("d_pos").cast("double") / F.col("n_rows"))
         / (F.col("n_pos").cast("double") / F.col("n"))).alias("lift"),
    )


LIFT_GAIN_SQL = """
WITH ev AS (
  SELECT event_id, value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, event_id ASC) AS rn FROM ev
),
tot AS (SELECT COUNT(*) AS n, SUM(pos) AS n_pos FROM ev),
deciles AS (
  SELECT (rn - 1) * 10 // n + 1 AS decile, n, n_pos,
         COUNT(*) AS n_rows, SUM(pos) AS d_pos
  FROM ranked CROSS JOIN tot
  GROUP BY (rn - 1) * 10 // n + 1, n, n_pos
),
cum AS (
  SELECT *, SUM(d_pos) OVER (ORDER BY decile
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
  FROM deciles
)
SELECT decile, n_rows, CAST(d_pos AS BIGINT) AS d_pos,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CAST(cum_pos AS DOUBLE) / n_pos AS gain,
       (CAST(d_pos AS DOUBLE) / n_rows) / (CAST(n_pos AS DOUBLE) / n) AS lift
FROM cum
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator (user-retention survival curve)
# ---------------------------------------------------------------------------

_KM_CENSOR_SEC = 12 * 3600  # users active in the final 12h are censored
# (the synthetic events cover ~30 days with median last-activity gap ~7h,
#  so a 12h horizon yields a genuine mix of observed churn and censoring)


def ml_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes: duration = days
    between a user's first and last event; a user whose last activity
    falls within the study's final 12 hours is right-CENSORED (still alive),
    otherwise the churn event is observed.  S(t) = Π_{t_i ≤ t}
    (1 − d_i / n_i) with d_i churn events and n_i the at-risk count at
    each observed duration — THE classical estimator for retention with
    incomplete observation, which the naive churn-rate ratio gets wrong.

    Determinism: durations/counts are all-integer; each factor is one
    double division; the running product folds in duration order in
    both engines (windowed product over the same sorted frame), so the
    curve is bit-identical.  Plan: one user-keyed aggregation, a
    duration histogram, and windows over DISTINCT durations only (≤
    study-span days — at 100 TB partition by cohort so each window
    stays tiny)."""
    from tlcn_oer_lakehouse_spark.queries.base import load_events

    ev = load_events(spark, sf).select(
        "user_id", F.col("ts_sec").alias("sec")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("sec").alias("mn"), F.max("sec").alias("mx")
    )
    study_end = per_user.agg(F.max("mx").alias("end_sec"),
                             F.count(F.lit(1)).alias("n_users"))
    users = (
        per_user.crossJoin(F.broadcast(study_end))
        .select(
            F.expr("(mx - mn) div 86400").alias("duration_days"),
            (F.col("mx") < F.col("end_sec") - F.lit(_KM_CENSOR_SEC))
            .cast("int").alias("churned"),
            "n_users",
        )
    )
    hist = users.groupBy("duration_days", "n_users").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("churned").alias("n_events"),
    )
    w_prev = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    at_risk = hist.withColumn(
        "n_at_risk",
        F.col("n_users") - F.coalesce(F.sum("n_total").over(w_prev), F.lit(0)),
    )
    ev_rows = at_risk.filter(F.col("n_events") > 0).withColumn(
        "factor",
        F.lit(1.0) - F.col("n_events").cast("double") / F.col("n_at_risk"),
    )
    w_cum = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev_rows.select(
        "duration_days", "n_at_risk", "n_events", "factor",
        F.product("factor").over(w_cum).alias("survival"),
    )


KAPLAN_MEIER_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000000000 AS sec FROM events
),
per_user AS (
  SELECT user_id, MIN(sec) AS mn, MAX(sec) AS mx FROM ev GROUP BY user_id
),
study AS (SELECT MAX(mx) AS end_sec, COUNT(*) AS n_users FROM per_user),
users AS (
  SELECT (mx - mn) // 86400 AS duration_days,
         CASE WHEN mx < end_sec - {_KM_CENSOR_SEC} THEN 1 ELSE 0 END AS churned,
         n_users
  FROM per_user CROSS JOIN study
),
hist AS (
  SELECT duration_days, n_users, COUNT(*) AS n_total, SUM(churned) AS n_events
  FROM users GROUP BY duration_days, n_users
),
at_risk AS (
  SELECT *, n_users - COALESCE(SUM(n_total) OVER (ORDER BY duration_days
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM hist
),
ev_rows AS (
  SELECT duration_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
         CAST(n_events AS BIGINT) AS n_events,
         1.0 - CAST(n_events AS DOUBLE) / n_at_risk AS factor
  FROM at_risk WHERE n_events > 0
)
SELECT duration_days, n_at_risk, n_events, factor,
       product(factor) OVER (ORDER BY duration_days
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS survival
FROM ev_rows
"""


SPECS = [
    QuerySpec("ml_feature_scaling", ml_feature_scaling, FEATURE_SCALING_SQL,
              ref="scale op; the in-engine fit/transform split ahead of the "
                  "reference's single-node model work (semantic_matcher.py, "
                  "elasticsearch_sync.py:397)",
              doc="standard-scaler fit from decimal moments + z-outlier count",
              tags=("mlstats",)),
    QuerySpec("ml_quantile_bucketize", ml_quantile_bucketize,
              QUANTILE_BUCKETIZE_SQL,
              ref="scale op; exact-percentile binning (Spark ML "
                  "QuantileDiscretizer analog, oracle-exact cutoffs)",
              doc="quartile bucketizer against broadcast exact cutoffs",
              tags=("mlstats",)),
    QuerySpec("ml_ols_regression", ml_ols_regression, OLS_SQL,
              ref="scale op; closed-form distributed OLS from one pass of "
                  "decimal-exact sufficient statistics",
              doc="per-group OLS slope/intercept/R² via sufficient statistics",
              tags=("mlstats",)),
    QuerySpec("ml_confusion_metrics", ml_confusion_metrics, CONFUSION_SQL,
              ref="scale op; classifier eval (confusion matrix, P/R/F1) as "
                  "one conditional-count aggregation",
              doc="confusion matrix + accuracy/precision/recall/F1",
              tags=("mlstats",)),
    QuerySpec("ml_auc_roc", ml_auc_roc, AUC_SQL,
              ref="scale op; exact tie-corrected Mann-Whitney AUC over a "
                  "score histogram + two-phase distributed prefix sum",
              doc="exact ROC-AUC/Gini, integer-exact until one division",
              tags=("mlstats",)),
    QuerySpec("a_kmv_distinct", a_kmv_distinct, KMV_DISTINCT_SQL,
              ref="scale op; KMV/theta distinct sketch (hierarchical min-k, "
                  "portable md5-prefix hash family) — complements a_hll_sketch",
              doc="per-key KMV distinct estimate with exact ground truth",
              tags=("mlstats",)),
    QuerySpec("a_kmv_set_ops", a_kmv_set_ops, KMV_SET_OPS_SQL,
              ref="scale op; theta-sketch set algebra (union θ, ρ/k "
                  "intersection, Jaccard) — the set ops HLL cannot do",
              doc="KMV union/intersection/Jaccard estimates vs exact",
              tags=("mlstats",)),
    QuerySpec("ml_naive_bayes_langid", ml_naive_bayes_langid, NAIVE_BAYES_SQL,
              ref="scale op; in-engine multinomial NB language-ID "
                  "(integer-surprisal scores), upgrading the "
                  "text_quality_langid heuristic",
              doc="NB langid confusion matrix, add-1 smoothed bit costs",
              tags=("mlstats", "text")),
    QuerySpec("ml_chi2_features", ml_chi2_features, CHI2_SQL,
              ref="scale op; chi-squared token↔class feature selection "
                  "ahead of classifier training",
              doc="top-k tokens per language by chi² association",
              tags=("mlstats", "text")),
    QuerySpec("ml_welch_ttest", ml_welch_ttest, WELCH_SQL,
              ref="scale op; Welch's t A/B readout from one pass of "
                  "conditional decimal moments",
              doc="unequal-variance t-statistic + Welch-Satterthwaite df",
              tags=("mlstats",)),
    QuerySpec("ml_covariance_block", ml_covariance_block, _covariance_oracle(),
              ref="scale op; PCA sufficient statistic — fixed-point exact "
                  "covariance moments in one aggregation pass",
              doc="8x8 embedding covariance block, deterministic fixed-point",
              tags=("mlstats",)),
    QuerySpec("ml_lift_gain", ml_lift_gain, LIFT_GAIN_SQL,
              ref="scale op; decile lift/gain targeting table — the "
                  "model-eval readout AUC alone doesn't give",
              doc="per-decile size/positives/cumulative gain/lift",
              tags=("mlstats",)),
    QuerySpec("ml_kaplan_meier", ml_kaplan_meier, KAPLAN_MEIER_SQL,
              ref="scale op; Kaplan-Meier retention survival curve with "
                  "right censoring — the estimator naive churn ratios get "
                  "wrong under incomplete observation",
              doc="survival S(t) over user lifetimes, censored final 12h",
              tags=("mlstats",)),
]
