"""Scale-up benchmark: time the slow query family at ~10x sf0.1 ("sf1").

The driver testdata stops at sf0.1, so this tool synthesizes a 10x scale
input under /tmp/sf1_synth and times the superlinear-risk queries there,
recording the scaling factor vs sf0.1.  The synthesis preserves workload
shape rather than being adversarial:

  * lineitem: 10 disjoint copies — BOTH l_orderkey and l_partkey shifted
    per copy, so the co-purchase graph becomes 10 disjoint copies of the
    sf0.1 graph (10x vertices, 10x edges; support distribution
    preserved).  Shifting only orderkeys would multiply every edge's
    support by 10 instead of growing the graph.
  * documents: 10 copies with doc_id shifted and a per-copy token
    prepended to text, so shingle/signature workloads grow 10x without
    creating 10-way exact-duplicate clusters that would quadratically
    blow up every LSH bucket (adversarial, not representative).
  * embeddings: 10 copies, vec_id shifted, component 2 shifted by a
    per-copy constant (keeps vectors distinct across copies).

Usage: python tools/scale_bench.py [--regen]
Writes timings to stdout and SCALE_r3.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_synth"
COPIES = 10

SLOW_FAMILY = [
    "pagerank_one_step",
    "triangle_count",
    "dedup_simhash",
    "dedup_resolve_components",
    "minhash_jaccard_estimate",
    # round-3 additions with self-join / iterative shapes worth watching
    "similar_docs_topk",
    "label_propagation_step",
    "basket_association_rules",
]

# Key shifts chosen far above any sf0.1 key range (and above the +1e6
# perturbed-doc injection in plans/llm.py).
ORDER_SHIFT = 100_000_000
PART_SHIFT = 10_000_000
DOC_SHIFT = 100_000_000
VEC_SHIFT = 100_000_000


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    from odni_apache_beam_consumer_spark.catalog import load_table

    os.makedirs(DST, exist_ok=True)

    li = load_table(spark, SRC, "lineitem")
    parts = []
    for i in range(COPIES):
        parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ORDER_SHIFT))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * PART_SHIFT))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    docs = load_table(spark, SRC, "documents")
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * DOC_SHIFT)).withColumn(
            "text", F.concat(F.lit(f"copytoken{i} "), F.col("text"))
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * VEC_SHIFT)).withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, 1, 1), "
                f"array(CAST(element_at(embedding, 2) + {i} * CAST(0.01 AS FLOAT) AS FLOAT)), "
                f"slice(embedding, 3, 62))"
            ),
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # Small tables: copy through unscaled (dimension tables don't scale
    # with fact volume in TPC-H either).
    for name in ["region", "nation", "customer", "supplier", "part", "orders", "events"]:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )


def time_query(spark, queries, name: str, sf_dir: str) -> float:
    t0 = time.monotonic()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sec = time.monotonic() - t0
    spark.catalog.clearCache()
    return round(sec, 3)


def main() -> int:
    from odni_apache_beam_consumer_spark.plans.registry import all_queries
    from odni_apache_beam_consumer_spark.session import get_spark

    spark = get_spark(app_name="scale-bench")
    queries = all_queries()

    if "--regen" in sys.argv or not os.path.exists(f"{DST}/lineitem.parquet"):
        print("synthesizing 10x dataset ...", file=sys.stderr)
        t0 = time.monotonic()
        synthesize(spark)
        print(f"synthesis done in {time.monotonic() - t0:.1f}s", file=sys.stderr)

    # Explicit warmup: when synthesis is skipped (data already on disk)
    # the first timed query would otherwise absorb all one-time JVM /
    # codegen / broadcast-pool costs (observed: pagerank 2x-4x inflated
    # as the cold first entry).
    print("warmup ...", file=sys.stderr)
    time_query(spark, queries, "pricing_summary", SRC)

    results: dict[str, dict] = {}
    for name in SLOW_FAMILY:
        base = time_query(spark, queries, name, SRC)
        big = time_query(spark, queries, name, DST)
        results[name] = {
            "sf0.1_sec": base,
            "sf1_sec": big,
            "scale_factor": round(big / base, 2) if base > 0 else None,
        }
        print(f"{name}: sf0.1={base}s sf1={big}s x{results[name]['scale_factor']}",
              file=sys.stderr)

    out = {"copies": COPIES, "queries": results}
    with open(os.path.join(REPO, "SCALE_r3.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
