"""ML / graph analytics: a k-means Lloyd step over the embedding corpus
and triangle counting over the co-purchase graph.

These demonstrate the two execution shapes the relational packs don't:
an *iterative numeric* step (assignment + centroid update — the loop body
of every EM-style algorithm; run it k times under ``localCheckpoint`` the
same way operators/dedup.py::connected_components loops), and a
*multi-way graph self-join* (triangle enumeration).

Float discipline for the oracles: distances use the algebraic form
``c·c − 2·v·c`` where both dot products are left-to-right folds —
identical evaluation order in Spark's ``aggregate`` and DuckDB's
``list_dot_product`` — so the argmin picks the same centroid on both
engines; averages are rounded after aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.operators.similarity import dot, with_vec
from odni_apache_beam_consumer_spark.plans.registry import query


@query(
    "kmeans_one_step",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
c AS (
  SELECT vec_id AS cid, vec AS cvec,
         list_dot_product(vec, vec) AS cdd
  FROM v WHERE vec_id % 50 = 0
),
scored AS (
  SELECT v.vec_id, c.cid,
         c.cdd - 2 * list_dot_product(v.vec, c.cvec) AS score,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
           c.cdd - 2 * list_dot_product(v.vec, c.cvec), c.cid) AS rn
  FROM v CROSS JOIN c
),
assigned AS (
  SELECT s.vec_id, s.cid, v.vec FROM scored s JOIN v USING (vec_id)
  WHERE s.rn = 1
)
SELECT cid, CAST(i AS INTEGER) AS pos,
       ROUND(AVG(vec[CAST(i AS INT)]), 6) AS new_val,
       COUNT(*) AS n_members
FROM assigned, UNNEST(generate_series(1, 64)) g(i)
GROUP BY cid, i
""",
)
def kmeans_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus:
    deterministic seeding (every 50th vector is a centroid), nearest-
    centroid assignment, per-dimension centroid update (long format —
    (cid, pos, new_val, n_members)).

    Scale shape: the centroid table is k rows → broadcast; assignment is
    a map-side cross-score + WindowGroupLimit argmin (no shuffle of the
    corpus beyond the per-vector window, which AQE coalesces since the
    partition key is the vector id); the update is ONE hash aggregation
    over (centroid, dimension) — 64k groups at any corpus size, so the
    exchange after map-side partial aggregation is constant-sized.  Run
    the full algorithm by looping this step under ``localCheckpoint``
    exactly like connected_components."""
    v = with_vec(load_table(spark, sf_dir, "embeddings")).select("vec_id", "vec")
    c = (
        v.where(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("vec").alias("cvec"),
            dot("vec", "vec").alias("cdd"),
        )
    )
    score = F.col("cdd") - 2 * dot("vec", "cvec")
    w = W.partitionBy("vec_id").orderBy(score.asc(), F.col("cid").asc())
    assigned = (
        v.crossJoin(F.broadcast(c))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid", "vec")
    )
    return (
        assigned.select("cid", F.posexplode("vec").alias("pos0", "val"))
        .groupBy("cid", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            F.round(F.avg("val"), 6).alias("new_val"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@query(
    "triangle_count",
    oracle="""
WITH pl AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM pl a JOIN pl b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT e1.u AS apex, COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
GROUP BY e1.u
""",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the co-purchase graph (parts sharing ≥ 2
    orders), triangles per apex (smallest vertex).

    The support threshold IS the scale story: raw co-occurrence over a
    uniform basket is near-complete (at sf0.1 the unfiltered graph has
    1.2M edges over 2k parts — wedge enumeration then explodes as
    Σdeg², measured 17 s here and quadratically worse with scale), while
    support ≥ 2 keeps the stable, genuinely-associated ~3.5k edges at
    every sf.  Edges are oriented (u < v) so each triangle is enumerated
    exactly once — the classic distributed-triangle trick that also
    bounds the first join's skew (at 100 TB orient by degree instead of
    id to cap the hottest vertex).  Two hash equi-join shuffles on vertex
    keys; the edge list is persisted so the three self-join sides read
    one materialization."""
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
        .persist()
    )
    e1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    return (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .groupBy(F.col("x").alias("apex"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@query(
    "pagerank_one_step",
    oracle="""
WITH pl AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e0 AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM pl a JOIN pl b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
deg AS (SELECT u, COUNT(*) AS outdeg FROM e GROUP BY u),
n AS (SELECT COUNT(*) AS nv FROM deg),
contrib AS (
  SELECT e.v AS node, (CAST(1.0 AS DOUBLE) / n.nv) / deg.outdeg AS c
  FROM e JOIN deg USING (u) CROSS JOIN n
)
SELECT node,
       ROUND(CAST(0.15 AS DOUBLE) / (SELECT nv FROM n)
             + CAST(0.85 AS DOUBLE) * SUM(c), 6) AS pagerank,
       COUNT(*) AS n_in_edges
FROM contrib GROUP BY node
""",
)
def pagerank_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank iteration (d=0.85) over the symmetrized co-purchase
    graph (same support>=2 edge list as triangle_count), from the uniform
    initial rank 1/N.

    Scale shape: the edge list is persisted and reused by degree-count,
    vertex-count and contribution joins (one materialization, three
    readers); degrees join back to edges on the vertex key (equi-join,
    AQE-broadcast when |V| is small, shuffle-hash at scale); the update is
    ONE hash aggregation keyed on the destination vertex.  The full
    algorithm loops this step under ``localCheckpoint`` like
    operators/dedup.py::connected_components; a hot vertex (celebrity
    node) is the classic skew case — AQE skew-join handles the join side,
    and the contribution agg is pre-combined map-side so the hot key
    arrives as partial sums.  Symmetrized edges mean no dangling nodes,
    so no dangling-mass redistribution term is needed."""
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = pl.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e0 = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    e = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    nv = deg.count()  # driver-side scalar: |V| (one count job on the persisted edges)
    contrib = (
        e.join(deg, "u")
        .select(F.col("v").alias("node"), (F.lit(1.0 / nv) / F.col("outdeg")).alias("c"))
    )
    return contrib.groupBy("node").agg(
        F.round(F.lit(0.15 / nv) + 0.85 * F.sum("c"), 6).alias("pagerank"),
        F.count(F.lit(1)).alias("n_in_edges"),
    )
