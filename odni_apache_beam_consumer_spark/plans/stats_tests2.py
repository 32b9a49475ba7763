"""Statistical battery II: distribution comparison and ratio-metric
inference.

Extends plans/stats_tests.py (Spearman/ACF/ANOVA/Kruskal-Wallis/
Theil-Sen) with the remaining distribution-level tests an
experimentation and data-quality platform reports: the two-sample
Kolmogorov-Smirnov distance (did the metric DISTRIBUTION move, not
just its mean), the Brown-Forsythe variance-homogeneity test (the
robust Levene variant that guards ANOVA's equal-variance assumption),
Cramer's V association between two categorical axes, and the delta-
method confidence interval for ratio metrics (the correct variance for
revenue-per-event-style ratios whose numerator and denominator are
correlated per user).

Parity note: the reference (/root/reference main.py, a 111-line Beam
Kafka echo demo) has no statistics surface; these queries follow
BASELINE.json's north star (the operator set a large-scale
training-data/analytics pipeline needs).

Portability discipline (see plans/registry.py header): every sum that
crosses an exchange is an exact BIGINT in quantized units; every
IEEE-double expression is a module-level SQL string evaluated verbatim
by BOTH engines; doubles are milli/micro FLOORed before they reach the
result hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import query

# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov test between experiment arms
# ---------------------------------------------------------------------------

# The KS distance is computed ENTIRELY in exact integers: per distinct
# deci-unit value v, cum0/cum1 are cumulative arm counts, and the ECDF
# gap |F0 - F1| at v cross-multiplies to |cum0*n1 - cum1*n0| (exact
# BIGINT; bounded by n0*n1 < 2^63 up to ~3e9 users/arm).  Only the
# final normalized statistic and the asymptotic lambda touch IEEE
# doubles, via these shared strings.
_KS_D = "(CAST(d_num AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))"
_KS_LAMBDA = (
    f"(sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)"
    f" / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))) * {_KS_D})"
)


@query(
    "ks_two_sample_test",
    oracle=f"""
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS qy
  FROM events GROUP BY user_id
),
v AS (SELECT arm, qy // 1000 AS qv FROM u),
g AS (
  SELECT qv,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM v GROUP BY qv
),
cum AS (
  SELECT CAST(SUM(c0) OVER (ORDER BY qv
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum0,
         CAST(SUM(c1) OVER (ORDER BY qv
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum1
  FROM g
),
t AS (
  SELECT CAST(MAX(cum0) AS BIGINT) AS n0,
         CAST(MAX(cum1) AS BIGINT) AS n1,
         CAST(MAX(ABS(cum0 * (SELECT MAX(cum1) FROM cum)
                      - cum1 * (SELECT MAX(cum0) FROM cum))) AS BIGINT)
           AS d_num
  FROM cum
)
SELECT n0 AS n_arm0, n1 AS n_arm1, d_num,
       CAST(FLOOR({_KS_D} * 1000000.0) AS BIGINT) AS d_micro,
       CAST(FLOOR({_KS_LAMBDA} * 1000.0) AS BIGINT) AS ks_lambda_milli
FROM t
""",
)
def ks_two_sample_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the two experiment
    arms — the distribution-level companion to welch_t_test and
    mann_whitney_u: the maximum ECDF gap over the per-user metric, and
    the asymptotic statistic sqrt(n0*n1/(n0+n1))*D whose tail drives
    the KS p-value.  Detects shape/variance shifts a mean test misses.

    The ECDF gap is exact end-to-end: per distinct deci-unit value the
    cumulative arm counts cross-multiply to |cum0*n1 - cum1*n0| (an
    exact BIGINT — no per-step division), the max is an integer max,
    and only the final normalization and lambda are IEEE doubles from
    one shared string each, micro/milli-floored.  Overflow bound:
    cum*n stays under 2^63 up to ~3e9 users per arm — documented, far
    past any realistic cohort.

    Scale shape: one user-keyed exchange, a hash agg onto the bounded
    deci-unit VALUE axis (the mann_whitney_u histogram device), one
    cumulative window over that bounded axis, and a 1-row fold."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)"
        ).alias("qy")
    ).select(F.expr("user_id % 2").alias("arm"), "qy")
    v = u.select("arm", F.expr("qy DIV 1000").alias("qv"))
    g = v.groupBy("qv").agg(
        F.expr(
            "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("c0"),
        F.expr(
            "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("c1"),
    )
    cum = g.select(
        F.expr(
            "CAST(SUM(c0) OVER (ORDER BY qv"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("cum0"),
        F.expr(
            "CAST(SUM(c1) OVER (ORDER BY qv"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("cum1"),
    ).persist()
    tots = cum.groupBy().agg(
        F.max("cum0").cast("long").alias("n0"),
        F.max("cum1").cast("long").alias("n1"),
    )
    t = (
        cum.crossJoin(F.broadcast(tots))
        .groupBy()
        .agg(
            F.max("n0").alias("n0"),
            F.max("n1").alias("n1"),
            F.expr(
                "CAST(MAX(ABS(cum0 * n1 - cum1 * n0)) AS BIGINT)"
            ).alias("d_num"),
        )
    )
    return t.select(
        F.col("n0").alias("n_arm0"),
        F.col("n1").alias("n_arm1"),
        "d_num",
        F.expr(f"CAST(FLOOR({_KS_D} * 1000000.0) AS BIGINT)").alias(
            "d_micro"
        ),
        F.expr(f"CAST(FLOOR({_KS_LAMBDA} * 1000.0) AS BIGINT)").alias(
            "ks_lambda_milli"
        ),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) variance-homogeneity test
# ---------------------------------------------------------------------------

_BF_K = 4

# One-way ANOVA F over the absolute deviations z = |qv - med_arm|
# (unit-scale exact integers on the deci-value axis).  All sufficient
# statistics (n, sz, szz per arm) are exact BIGINTs; the per-arm
# within-SS and n*mean^2 terms are milli-floored BEFORE the across-arm
# sum (the anova_f_oneway device), and F is one shared IEEE string.
_BF_SSW = (
    "(CAST(szz AS DOUBLE)"
    " - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(nn AS DOUBLE))"
)
_BF_NM2 = (
    "(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(nn AS DOUBLE))"
)
_BF_F = (
    "(((CAST(snm2_milli AS DOUBLE) / 1000.0"
    "   - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)))"
    f"  / CAST({_BF_K - 1} AS DOUBLE))"
    " / ((CAST(ssw_milli AS DOUBLE) / 1000.0)"
    f"    / CAST(nt - {_BF_K} AS DOUBLE)))"
)


@query(
    "brown_forsythe_levene",
    oracle=f"""
WITH u AS (
  SELECT user_id, user_id % {_BF_K} AS arm,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS qy
  FROM events GROUP BY user_id
),
v AS (SELECT arm, qy // 1000 AS qv FROM u),
h AS (
  SELECT arm, qv, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY arm, qv
),
rk AS (
  SELECT arm, qv, c,
         CAST(SUM(c) OVER (PARTITION BY arm ORDER BY qv
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(SUM(c) OVER (PARTITION BY arm) AS BIGINT) AS na
  FROM h
),
med AS (
  SELECT arm, CAST(MIN(qv) AS BIGINT) AS med
  FROM rk WHERE cum >= (na + 1) // 2 GROUP BY arm
),
z AS (
  SELECT h.arm, h.c, ABS(h.qv - m.med) AS z
  FROM h JOIN med m ON m.arm = h.arm
),
g AS (
  SELECT arm,
         CAST(SUM(c) AS BIGINT) AS nn,
         CAST(SUM(c * z) AS BIGINT) AS sz,
         CAST(SUM(c * z * z) AS BIGINT) AS szz
  FROM z GROUP BY arm
),
p AS (
  SELECT arm, nn, sz,
         CAST(FLOOR({_BF_SSW} * 1000.0) AS BIGINT) AS ssw_milli,
         CAST(FLOOR({_BF_NM2} * 1000.0) AS BIGINT) AS nm2_milli
  FROM g
),
t AS (
  SELECT CAST(SUM(nn) AS BIGINT) AS nt,
         CAST(SUM(sz) AS BIGINT) AS st,
         CAST(SUM(ssw_milli) AS BIGINT) AS ssw_milli,
         CAST(SUM(nm2_milli) AS BIGINT) AS snm2_milli
  FROM p
)
SELECT nt AS n_users, CAST({_BF_K} AS BIGINT) AS k_arms,
       ssw_milli, snm2_milli,
       CAST(FLOOR({_BF_F} * 1000.0) AS BIGINT) AS f_milli
FROM t
""",
)
def brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (the median-based Levene variant) for
    variance homogeneity across {_BF_K} experiment arms — the guard an
    experimentation platform runs before trusting anova_f_oneway's
    equal-variance assumption, and a variance-shift detector in its
    own right: one-way ANOVA F over the absolute deviations from each
    arm's MEDIAN (medians make it robust to the heavy-tailed metrics
    where the classic Levene breaks).

    Exactness: arm medians are exact order statistics on the bounded
    deci-unit value histogram (lower median via cumulative counts —
    grouped-median semantics pinned identically in both engines);
    deviations z = |qv - med| are unit-scale exact integers, their
    sums and second moments exact BIGINTs; per-arm double terms are
    milli-floored before the across-arm sum (the anova_f_oneway
    device) and F is one shared IEEE string.

    Scale shape: one user-keyed exchange, a hash agg onto the bounded
    (arm, deci-value) axis, per-arm cumulative windows over that
    bounded axis, a broadcast of {_BF_K} medians, and a {_BF_K}-row
    fold."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)"
        ).alias("qy")
    ).select(F.expr(f"user_id % {_BF_K}").alias("arm"), "qy")
    v = u.select("arm", F.expr("qy DIV 1000").alias("qv"))
    h = v.groupBy("arm", "qv").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    rk = h.select(
        "arm",
        "qv",
        F.expr(
            "CAST(SUM(c) OVER (PARTITION BY arm ORDER BY qv"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("cum"),
        F.expr("CAST(SUM(c) OVER (PARTITION BY arm) AS BIGINT)").alias("na"),
    )
    med = (
        rk.where(F.expr("cum >= (na + 1) DIV 2"))
        .groupBy("arm")
        .agg(F.min("qv").cast("long").alias("med"))
    )
    z = h.join(F.broadcast(med), "arm").select(
        "arm", "c", F.expr("ABS(qv - med)").alias("z")
    )
    g = z.groupBy("arm").agg(
        F.sum("c").cast("long").alias("nn"),
        F.expr("CAST(SUM(c * z) AS BIGINT)").alias("sz"),
        F.expr("CAST(SUM(c * z * z) AS BIGINT)").alias("szz"),
    )
    p = g.select(
        "nn",
        "sz",
        F.expr(f"CAST(FLOOR({_BF_SSW} * 1000.0) AS BIGINT)").alias(
            "ssw_milli"
        ),
        F.expr(f"CAST(FLOOR({_BF_NM2} * 1000.0) AS BIGINT)").alias(
            "nm2_milli"
        ),
    )
    t = p.groupBy().agg(
        F.sum("nn").cast("long").alias("nt"),
        F.sum("sz").cast("long").alias("st"),
        F.sum("ssw_milli").cast("long").alias("ssw_milli"),
        F.sum("nm2_milli").cast("long").alias("snm2_milli"),
    )
    return t.select(
        F.col("nt").alias("n_users"),
        F.lit(_BF_K).cast("long").alias("k_arms"),
        "ssw_milli",
        "snm2_milli",
        F.expr(f"CAST(FLOOR({_BF_F} * 1000.0) AS BIGINT)").alias("f_milli"),
    )


# ---------------------------------------------------------------------------
# Cramer's V association between two categorical axes
# ---------------------------------------------------------------------------

# chi2 over the r x c contingency table in the cross-multiplied form
# that keeps every per-cell term a ratio of exact BIGINTs:
#   chi2 = N * (sum_cells obs^2 / (row_tot * col_tot)) - N
# (algebraically identical to sum (obs-exp)^2/exp).  The per-cell
# double obs^2/(rt*ct) is micro-floored BEFORE the across-cell sum, so
# neither engine folds raw doubles in its own order.
_CV_CELL = (
    "(CAST(obs AS DOUBLE) * CAST(obs AS DOUBLE)"
    " / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))"
)
_CV_CHI2 = (
    "(CAST(n AS DOUBLE)"
    " * (CAST(scell_micro AS DOUBLE) / 1000000.0 - 1.0))"
)
_CV_V = (
    f"sqrt({_CV_CHI2} / (CAST(n AS DOUBLE) * CAST(dmin AS DOUBLE)))"
)


@query(
    "cramers_v_association",
    oracle=f"""
WITH ct AS (
  SELECT o.o_orderpriority AS pri, c.c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
rt AS (SELECT pri, CAST(SUM(obs) AS BIGINT) AS rt FROM ct GROUP BY pri),
cl AS (SELECT seg, CAST(SUM(obs) AS BIGINT) AS ct FROM ct GROUP BY seg),
nn AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT pri) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT seg) AS BIGINT) AS c
  FROM ct
),
cells AS (
  SELECT t.obs, r.rt, l.ct
  FROM ct t JOIN rt r ON r.pri = t.pri JOIN cl l ON l.seg = t.seg
),
s AS (
  SELECT CAST(SUM(CAST(FLOOR({_CV_CELL} * 1000000.0) AS BIGINT)) AS BIGINT)
           AS scell_micro
  FROM cells
)
SELECT nn.n AS n_orders, nn.r AS n_rows, nn.c AS n_cols,
       CAST(FLOOR({_CV_CHI2} * 1000.0) AS BIGINT) AS chi2_milli,
       CAST(FLOOR({_CV_V.replace("dmin", "(LEAST(nn.r, nn.c) - 1)")}
            * 1000000.0) AS BIGINT) AS v_micro
FROM s CROSS JOIN nn
""",
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V association between order priority and customer
    market segment — the normalized effect-size companion to the chi2
    machinery (chi2_token_class_assoc reports raw statistics; V maps
    them to [0,1] so associations are comparable across table shapes):
    chi2 over the r x c contingency table in the cross-multiplied form
    N*(sum obs^2/(rt*ct)) - N, then V = sqrt(chi2 / (N*min(r-1,c-1))).

    Exactness: contingency counts and marginals are exact BIGINTs;
    each cell's obs^2/(rt*ct) double is micro-floored BEFORE the
    across-cell sum (25 cells — the floor loss is bounded by 25e-6);
    chi2 and V are shared IEEE strings over those integers.

    Scale shape: one corpus equi-join (orders x customer on the
    customer key), a hash agg onto the 25-cell (priority, segment)
    contingency axis, and constant-size marginal algebra — the
    categorical-association dataflow at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
        .persist()
    )
    rt = ct.groupBy("pri").agg(F.sum("obs").cast("long").alias("rt"))
    cl = ct.groupBy("seg").agg(F.sum("obs").cast("long").alias("ct"))
    nn = ct.groupBy().agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("pri").cast("long").alias("r"),
        F.countDistinct("seg").cast("long").alias("c"),
    )
    cells = ct.join(F.broadcast(rt), "pri").join(F.broadcast(cl), "seg")
    s = cells.groupBy().agg(
        F.expr(
            f"CAST(SUM(CAST(FLOOR({_CV_CELL} * 1000000.0) AS BIGINT))"
            " AS BIGINT)"
        ).alias("scell_micro")
    )
    v_expr = _CV_V.replace("dmin", "(LEAST(nn.r, nn.c) - 1)").replace(
        "nn.r", "r"
    ).replace("nn.c", "c")
    return (
        s.crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_orders"),
            F.col("r").alias("n_rows"),
            F.col("c").alias("n_cols"),
            F.expr(
                f"CAST(FLOOR({_CV_CHI2} * 1000.0) AS BIGINT)"
            ).alias("chi2_milli"),
            F.expr(
                f"CAST(FLOOR({v_expr} * 1000000.0) AS BIGINT)"
            ).alias("v_micro"),
        )
    )


# ---------------------------------------------------------------------------
# delta-method confidence interval for a per-arm ratio metric
# ---------------------------------------------------------------------------

# Ratio metric R = sum(y) / sum(n) over users (value per event), with
# the delta-method variance that accounts for per-user correlation of
# numerator and denominator (Deng et al., "Applying the Delta Method in
# Metric Analytics"):
#   Var(R) = (syy - 2R*syn + R^2*snn) / (nbar^2 * nu)   per-user CLT
# written from exact integer moments: y in unit scale (qy DIV 10000 —
# the CUPED rescale-before-square rule), n = event count.
_DM_R = "(CAST(sy AS DOUBLE) / 10000.0 / CAST(sn AS DOUBLE))"
_DM_NBAR = "(CAST(sn AS DOUBLE) / CAST(nu AS DOUBLE))"
_DM_VAR = (
    f"(((CAST(syy AS DOUBLE) - 2.0 * {_DM_R} * CAST(syn AS DOUBLE)"
    f"   + {_DM_R} * {_DM_R} * CAST(snn AS DOUBLE))"
    "   / CAST(nu AS DOUBLE))"
    f" / ({_DM_NBAR} * {_DM_NBAR} * CAST(nu AS DOUBLE)))"
)
_DM_SE = f"sqrt({_DM_VAR})"


@query(
    "delta_method_ratio_ci",
    oracle=f"""
WITH u AS (
  SELECT user_id % 2 AS arm,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS qy,
         CAST(COUNT(*) AS BIGINT) AS ne
  FROM events GROUP BY user_id
),
g AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS nu,
         CAST(SUM(qy) AS BIGINT) AS sy,
         CAST(SUM(ne) AS BIGINT) AS sn,
         CAST(SUM((qy // 10000) * (qy // 10000)) AS BIGINT) AS syy,
         CAST(SUM((qy // 10000) * ne) AS BIGINT) AS syn,
         CAST(SUM(ne * ne) AS BIGINT) AS snn
  FROM u GROUP BY arm
)
SELECT CAST(arm AS BIGINT) AS arm, nu AS n_users, sn AS n_events,
       CAST(FLOOR({_DM_R} * 1000.0) AS BIGINT) AS ratio_milli,
       CAST(FLOOR({_DM_SE} * 1000000.0) AS BIGINT) AS se_micro,
       CAST(FLOOR(({_DM_R} - 196.0 / 100.0 * {_DM_SE}) * 1000.0) AS BIGINT)
         AS lo_milli,
       CAST(FLOOR(({_DM_R} + 196.0 / 100.0 * {_DM_SE}) * 1000.0) AS BIGINT)
         AS hi_milli
FROM g
""",
)
def delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for the per-arm ratio metric
    value-per-event (Deng et al., "Applying the Delta Method in Metric
    Analytics") — the correct variance for ratio metrics whose
    numerator and denominator move together per user, where a naive
    per-event t-test is anticonservative: per-user (y, n) sufficient
    statistics, the cross-moment syn capturing the correlation, and
    R +/- 1.96*se from the delta-method variance.

    Exactness: per-user sums are exact micro BIGINTs; second moments
    follow the CUPED rescale-before-square rule (unit-scale before
    squaring); R, the variance, and both CI endpoints are shared IEEE
    strings over those integers, milli/micro-floored (1.96 enters as
    the exact rational 196/100).

    Scale shape: one user-keyed exchange and a 2-row conditional
    aggregate (map-side combined) — the welch_t_test dataflow with a
    cross-moment column added."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT)"
        ).alias("qy"),
        F.count(F.lit(1)).cast("long").alias("ne"),
    ).select(F.expr("user_id % 2").alias("arm"), "qy", "ne")
    g = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("qy").cast("long").alias("sy"),
        F.sum("ne").cast("long").alias("sn"),
        F.expr(
            "CAST(SUM((qy DIV 10000) * (qy DIV 10000)) AS BIGINT)"
        ).alias("syy"),
        F.expr("CAST(SUM((qy DIV 10000) * ne) AS BIGINT)").alias("syn"),
        F.expr("CAST(SUM(ne * ne) AS BIGINT)").alias("snn"),
    )
    return g.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("nu").alias("n_users"),
        F.col("sn").alias("n_events"),
        F.expr(f"CAST(FLOOR({_DM_R} * 1000.0) AS BIGINT)").alias(
            "ratio_milli"
        ),
        F.expr(f"CAST(FLOOR({_DM_SE} * 1000000.0) AS BIGINT)").alias(
            "se_micro"
        ),
        F.expr(
            f"CAST(FLOOR(({_DM_R} - 196.0 / 100.0 * {_DM_SE}) * 1000.0)"
            " AS BIGINT)"
        ).alias("lo_milli"),
        F.expr(
            f"CAST(FLOOR(({_DM_R} + 196.0 / 100.0 * {_DM_SE}) * 1000.0)"
            " AS BIGINT)"
        ).alias("hi_milli"),
    )


# ---------------------------------------------------------------------------
# exact-window EWMA of the daily revenue series
# ---------------------------------------------------------------------------

# Exponential smoothing with alpha = 1/4 over a 16-day finite window,
# made INTEGER-EXACT by scaling the geometric weights (3/4)^k by 4^15:
# W_k = 3^k * 4^(15-k) is an exact BIGINT, so the weighted numerator
# and the (presence-masked) denominator are exact integer sums — pow()
# never executes in either engine.  The one IEEE operation is the
# final num/den divide, centi-floored.
_EWMA_LAGS = 16
_EWMA_W = [3**k * 4 ** (_EWMA_LAGS - 1 - k) for k in range(_EWMA_LAGS)]
_EWMA_NUM = " + ".join(
    f"COALESCE(l{k}, 0) * CAST({w} AS BIGINT)" for k, w in enumerate(_EWMA_W)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN l{k} IS NULL THEN CAST(0 AS BIGINT)"
    f" ELSE CAST({w} AS BIGINT) END)"
    for k, w in enumerate(_EWMA_W)
)
_EWMA_VAL = "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"


@query(
    "ewma_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT DATE_TRUNC('day', o_orderdate) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) // 100000
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, x,
         {", ".join(f"LAG(x, {k}) OVER (ORDER BY day) AS l{k}" for k in range(_EWMA_LAGS)) .replace("LAG(x, 0) OVER (ORDER BY day)", "x")}
  FROM daily
),
s AS (
  SELECT day, x,
         CAST({_EWMA_NUM} AS BIGINT) AS num,
         CAST({_EWMA_DEN} AS BIGINT) AS den
  FROM lagged
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day, x AS revenue_kilo,
       CAST(FLOOR({_EWMA_VAL} * 100.0) AS BIGINT) AS ewma_centikilo
FROM s
""",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/4, 16-day
    finite window) of the daily revenue series — the smoothing behind
    monitoring dashboards and EWMA control charts (Roberts 1959),
    computed WITHOUT pow(): the geometric weights (3/4)^k scale to the
    exact integers W_k = 3^k * 4^(15-k), so the weighted sum and the
    presence-masked normalizer are exact BIGINT folds and the only
    IEEE operation is one final divide, centi-floored.  Early days
    (fewer than 16 predecessors) renormalize over the present terms —
    the standard adjusted-EWMA convention.

    Overflow bound: num <= 16 * x_max * 4^15 stays under 2^63 for
    daily revenues up to ~5e8 kilo-units (half a trillion per day) —
    documented, far past the 1000x synthesis.

    Scale shape: one hash exchange onto the calendar-bounded day axis
    (~2.4k rows/decade at any corpus size); all 16 lags come from ONE
    window pass as columns; everything after runs on the bounded
    axis."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))"
            " DIV 100000 AS BIGINT)"
        ).alias("x")
    )
    lag_cols = [
        F.expr(f"LAG(x, {k}) OVER (ORDER BY day)").alias(f"l{k}")
        for k in range(1, _EWMA_LAGS)
    ]
    lagged = daily.select(
        "day", "x", F.col("x").alias("l0"), *lag_cols
    )
    s = lagged.select(
        "day",
        "x",
        F.expr(f"CAST({_EWMA_NUM} AS BIGINT)").alias("num"),
        F.expr(f"CAST({_EWMA_DEN} AS BIGINT)").alias("den"),
    )
    return s.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("revenue_kilo"),
        F.expr(f"CAST(FLOOR({_EWMA_VAL} * 100.0) AS BIGINT)").alias(
            "ewma_centikilo"
        ),
    )


# ---------------------------------------------------------------------------
# Kendall tau (bounded-lag) of the daily revenue series
# ---------------------------------------------------------------------------

_KT_MAX_LAG = 30

_KT_TAU = (
    "((CAST(c AS DOUBLE) - CAST(d AS DOUBLE)) / CAST(np AS DOUBLE))"
)


@query(
    "kendall_tau_daily",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01',
              CAST(DATE_TRUNC('day', o_orderdate) AS DATE)) AS BIGINT)
           AS di,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) // 100000
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT a.x AS xi, b.x AS xj
  FROM daily a
  JOIN (SELECT UNNEST(range(1, {_KT_MAX_LAG + 1})) AS k) g ON TRUE
  JOIN daily b ON b.di = a.di + g.k
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN xj > xi THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN xj < xi THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN xj = xi THEN 1 ELSE 0 END) AS BIGINT) AS ties
  FROM pairs
)
SELECT np AS n_pairs, c AS n_concordant, d AS n_discordant, ties,
       CAST(FLOOR({_KT_TAU} * 1000000.0) AS BIGINT) AS tau_micro
FROM t
""",
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau trend statistic (bounded-lag tau-a, the Mann-Kendall
    trend-test core) of the daily revenue series — the rank-based
    trend detector that complements theil_sen_trend's slope estimate
    with a direction statistic: over day pairs at lags 1..{_KT_MAX_LAG},
    count concordant (later day higher), discordant, and tied pairs;
    tau = (C - D) / n_pairs.

    Because time indices never tie, concordance reduces to the sign of
    x_j - x_i — all counts exact BIGINTs; tau is one shared IEEE
    divide, micro-floored.

    Scale shape: identical to theil_sen_trend — the lag explode turns
    the pair build into a single EQUI-join on the shifted day index
    over the calendar-bounded day axis (<= 72k pairs/decade at any
    corpus size); the only corpus-sized work is the day-grained
    collapse."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "CAST(datediff(CAST(date_trunc('day', o_orderdate) AS DATE),"
            " DATE'1992-01-01') AS BIGINT)"
        ).alias("di")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))"
            " DIV 100000 AS BIGINT)"
        ).alias("x")
    )
    a = (
        daily.select("di", F.col("x").alias("xi"))
        .withColumn("k", F.explode(F.expr(f"sequence(1, {_KT_MAX_LAG})")))
        .select("xi", (F.col("di") + F.col("k")).alias("dj"))
    )
    b = daily.select(F.col("di").alias("dj"), F.col("x").alias("xj"))
    t = a.join(b, "dj").groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.expr(
            "CAST(SUM(CASE WHEN xj > xi THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("c"),
        F.expr(
            "CAST(SUM(CASE WHEN xj < xi THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("d"),
        F.expr(
            "CAST(SUM(CASE WHEN xj = xi THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("ties"),
    )
    return t.select(
        F.col("np").alias("n_pairs"),
        F.col("c").alias("n_concordant"),
        F.col("d").alias("n_discordant"),
        "ties",
        F.expr(f"CAST(FLOOR({_KT_TAU} * 1000000.0) AS BIGINT)").alias(
            "tau_micro"
        ),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test between two classifier variants
# ---------------------------------------------------------------------------


@query(
    "mcnemar_paired_test",
    oracle="""
WITH p AS (
  SELECT CAST(label % 2 AS BIGINT) AS y,
         CASE WHEN CAST(embedding[1] AS DOUBLE) > 0.0 THEN 1 ELSE 0 END
           AS p1,
         CASE WHEN CAST(embedding[2] AS DOUBLE) > 0.0 THEN 1 ELSE 0 END
           AS p2
  FROM embeddings
),
c AS (
  SELECT CASE WHEN p1 = y THEN 1 ELSE 0 END AS c1,
         CASE WHEN p2 = y THEN 1 ELSE 0 END AS c2
  FROM p
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN c1 = 1 AND c2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n11,
         CAST(SUM(CASE WHEN c1 = 1 AND c2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n10,
         CAST(SUM(CASE WHEN c1 = 0 AND c2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n01,
         CAST(SUM(CASE WHEN c1 = 0 AND c2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n00
  FROM c
)
SELECT n, n11, n10, n01, n00,
       CAST((n10 - n01) * (n10 - n01) * 1000 // (n10 + n01) AS BIGINT)
         AS chi2_milli,
       CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1) * 1000
            // (n10 + n01) AS BIGINT) AS chi2_cc_milli
FROM t
""",
)
def mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test comparing two classifier variants on the SAME
    examples — the correct paired test for "is model B better than
    model A" (an unpaired two-proportion z-test on overlapping eval
    sets is anticonservative; McNemar conditions on the discordant
    pairs): two deterministic threshold rules over the embedding
    table scored against the binary label, the 2x2 agreement table of
    per-example correctness, and the (b-c)^2/(b+c) statistic plus its
    continuity-corrected form.

    INTEGER-EXACT end-to-end: all four agreement cells are exact
    BIGINT counts and both statistics are integral milli DIVisions —
    zero IEEE arithmetic anywhere.

    Scale shape: one map-only scoring pass (no join — both rules and
    the label live on the same row) partially aggregated into a 1-row
    fold; the canonical eval dataflow at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select(
        F.expr(
            "CASE WHEN (CASE WHEN CAST(element_at(embedding, 1) AS DOUBLE)"
            " > 0.0 THEN 1 ELSE 0 END) = CAST(label % 2 AS BIGINT)"
            " THEN 1 ELSE 0 END"
        ).alias("c1"),
        F.expr(
            "CASE WHEN (CASE WHEN CAST(element_at(embedding, 2) AS DOUBLE)"
            " > 0.0 THEN 1 ELSE 0 END) = CAST(label % 2 AS BIGINT)"
            " THEN 1 ELSE 0 END"
        ).alias("c2"),
    )
    t = c.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(SUM(CASE WHEN c1 = 1 AND c2 = 1 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n11"),
        F.expr(
            "CAST(SUM(CASE WHEN c1 = 1 AND c2 = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n10"),
        F.expr(
            "CAST(SUM(CASE WHEN c1 = 0 AND c2 = 1 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n01"),
        F.expr(
            "CAST(SUM(CASE WHEN c1 = 0 AND c2 = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n00"),
    )
    return t.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            "CAST((n10 - n01) * (n10 - n01) * 1000 DIV (n10 + n01)"
            " AS BIGINT)"
        ).alias("chi2_milli"),
        F.expr(
            "CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1) * 1000"
            " DIV (n10 + n01) AS BIGINT)"
        ).alias("chi2_cc_milli"),
    )
