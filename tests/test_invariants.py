"""Operator invariants: properties that must hold for ANY input, checked
exhaustively or on the planted-positive corpus (complementing the
value-oracle suite, which checks one dataset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark import storage
from odni_apache_beam_consumer_spark.plans.registry import all_queries


def test_zorder_value_bijective_on_8bit_domain(spark):
    """Morton interleave must be a bijection: the full 8-bit × 8-bit cross
    product (65 536 pairs) maps to 65 536 distinct z-values covering
    exactly [0, 2^16)."""
    grid = spark.range(256).select(F.col("id").alias("a")).crossJoin(
        spark.range(256).select(F.col("id").alias("b"))
    )
    z = grid.select(storage.zorder_value("a", "b", bits=8).alias("z"))
    row = z.agg(
        F.count_distinct("z").alias("n"),
        F.min("z").alias("lo"),
        F.max("z").alias("hi"),
    ).collect()[0]
    assert row["n"] == 65536 and row["lo"] == 0 and row["hi"] == 65535


def test_zorder_value_axis_monotone(spark):
    """Fixing one coordinate, the curve must be monotone in the other
    (interleaving preserves per-axis order)."""
    line = spark.range(256).select(F.col("id").alias("a"), F.lit(7).alias("b"))
    z = line.select("a", storage.zorder_value("a", "b", bits=8).alias("z"))
    bad = (
        z.join(z.select(F.col("a").alias("a2"), F.col("z").alias("z2")),
               F.col("a") < F.col("a2"))
        .where(F.col("z") >= F.col("z2"))
        .count()
    )
    assert bad == 0


def test_text_normalization_idempotent(spark, sf_dir):
    """normalize(normalize(x)) == normalize(x): lowering/stripping/
    collapsing must be a projection onto its own fixed points."""
    from odni_apache_beam_consumer_spark.catalog import load_table

    def norm(col):
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
            )
        )

    d = load_table(spark, sf_dir, "documents").select(
        norm(F.concat(F.upper("text"), F.lit("  ?! "))).alias("once")
    )
    twice = d.select("once", norm(F.col("once")).alias("twice"))
    assert twice.where(F.col("once") != F.col("twice")).count() == 0


def test_minhash_estimate_bounds_and_planted_positives(spark, sf_dir):
    """est_jaccard and jaccard must be in [0, 1]; the planted near-dup
    pairs (doc, doc+1e6: one word dropped) that LSH surfaces must show
    high true Jaccard (> 0.5)."""
    df = all_queries()["minhash_jaccard_estimate"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
    planted = [r for r in rows if r["doc_b"] == r["doc_a"] + 1000000]
    assert planted, "LSH lost every planted near-dup pair"
    assert all(r["jaccard"] > 0.5 for r in planted)
