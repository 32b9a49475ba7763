"""Query registry: the declared-capability surface of the engine.

Every operator capability from SURVEY.md §2 is declared here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over the
same parquet tables.  The driver's correctness harness runs both sides and
compares row-count + schema + order-insensitive value-hash.

Conventions that keep the Spark result and the DuckDB oracle hash-equal:
  * every computed column is aliased identically on both sides;
  * float aggregates are ROUND()ed (2dp for money sums, 4-6dp for
    averages/ratios) so partial-aggregation order differences between the
    two engines can never surface in the hash;
  * ratios of INTEGERS never use ROUND at all — an int/int quotient can
    be exactly representable in binary AND sit exactly on a decimal
    rounding boundary (sum/512, 1/128 = .0078125), where DuckDB and the
    JVM break the half-tie differently (the only driver-red cell of
    rounds 1-3, sequence_packing).  Emit integer ppm/bp via `DIV`
    (`x * 1000000 DIV y`), or ppm-then-one-IEEE-divide when a double
    column is wanted — both are bit-identical across engines;
  * FLOOR(x * scale) is the portable way to carry a double measure
    through an aggregate exactly (floor of the same IEEE double is
    deterministic; see plans/streaming_duals.py);
  * timestamps are emitted as formatted strings (date_format / strftime),
    never raw timestamp values;
  * BIGINT sums are cast explicitly (DuckDB widens integer SUM to
    HUGEINT, Spark keeps LONG);
  * grouping-null columns from ROLLUP/CUBE are COALESCEd to a sentinel.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible ops (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


_PKG_PREFIX = "odni_apache_beam_consumer_spark"
_CONST_TYPES = (int, float, str, bytes, bool, tuple, list, dict, set, frozenset)


def _closure_parts(fn, seen: set, parts: dict) -> None:
    """Collect source text for ``fn`` and every package-local object it
    references, transitively: helper functions get their own source (and
    recurse), referenced package modules get their full module source,
    referenced module-level constants get their repr.  Keys are
    deterministic (module, qualname) pairs so the digest is stable."""
    import inspect
    import types

    inner = getattr(fn, "func", None) or getattr(fn, "__wrapped__", None)
    if isinstance(inner, types.FunctionType):
        _closure_parts(inner, seen, parts)
        return
    if not isinstance(fn, types.FunctionType):
        return
    mod = getattr(fn, "__module__", "") or ""
    if not mod.startswith(_PKG_PREFIX):
        return
    key = ("fn", mod, fn.__qualname__)
    if key in seen:
        return
    seen.add(key)
    try:
        parts[key] = inspect.getsource(fn)
    except (OSError, TypeError):
        parts[key] = f"<nosource {mod}.{fn.__qualname__}>"

    def _code_names(code):
        names = set(code.co_names) | set(code.co_freevars)
        for c in code.co_consts:
            if isinstance(c, types.CodeType):
                names |= _code_names(c)
        return names

    g = fn.__globals__
    refs = []
    for n in sorted(_code_names(fn.__code__)):
        if n in g:
            refs.append((n, g[n]))
    if fn.__closure__:
        for n, cell in zip(fn.__code__.co_freevars, fn.__closure__):
            try:
                refs.append((n, cell.cell_contents))
            except ValueError:
                pass
    for n, obj in refs:
        if isinstance(obj, types.FunctionType) or hasattr(obj, "__wrapped__") or (
            hasattr(obj, "func") and isinstance(getattr(obj, "func"), types.FunctionType)
        ):
            _closure_parts(obj, seen, parts)
        elif isinstance(obj, type):
            omod = getattr(obj, "__module__", "") or ""
            ckey = ("cls", omod, obj.__qualname__)
            if omod.startswith(_PKG_PREFIX) and ckey not in seen:
                seen.add(ckey)
                try:
                    parts[ckey] = inspect.getsource(obj)
                except (OSError, TypeError):
                    parts[ckey] = f"<nosource {omod}.{obj.__qualname__}>"
        elif isinstance(obj, types.ModuleType):
            oname = getattr(obj, "__name__", "") or ""
            mkey = ("mod", oname, "")
            if oname.startswith(_PKG_PREFIX) and mkey not in seen:
                seen.add(mkey)
                try:
                    parts[mkey] = inspect.getsource(obj)
                except (OSError, TypeError):
                    parts[mkey] = f"<nosource {oname}>"
        elif obj is None or isinstance(obj, _CONST_TYPES):
            ckey = ("const", g.get("__name__", mod), n)
            if ckey not in seen:
                seen.add(ckey)
                parts[ckey] = repr(obj)


def query_digest(name: str) -> str:
    """Content digest of a registered query: sha256 over the query
    function's source text, its oracle SQL, AND the transitive source
    closure of every package-local helper it references (functions,
    classes, modules, module-level constants).  Used to key witness
    retirement on WHAT the driver actually ran, not just the name — a
    query whose plan or oracle changes after its last passing witness
    must re-queue for a fresh driver witness (round-5 verdict item 5).
    The closure part closes the round-9 blind spot: a refactor in
    operators/* executed by a query (the r9 PQ-ADC rewrite) now moves
    the digest even though the query function's own text is unchanged."""
    import hashlib

    parts: dict = {}
    _closure_parts(QUERIES[name], set(), parts)
    acc = hashlib.sha256()
    for key in sorted(parts):
        acc.update(f"##{key}##\n".encode())
        acc.update(parts[key].encode())
    acc.update(b"\n##oracle##\n")
    acc.update(ORACLES.get(name, "").encode())
    return acc.hexdigest()[:16]


def registry_digest() -> str:
    """One digest over the whole registry: sha256 of the sorted
    (name, query_digest) pairs.  Committed artifacts (CORRECTNESS_local,
    bench_out, PLANS.md) stamp this at generation time so
    tests/test_artifacts.py fails LOUDLY when any query's plan or oracle
    changes without regenerating them — name-set comparison alone let
    round-5's artifacts go stale silently (round-5 verdict item 4)."""
    import hashlib

    all_queries()
    acc = hashlib.sha256()
    for name in sorted(QUERIES):
        acc.update(f"{name}={query_digest(name)}\n".encode())
    return acc.hexdigest()[:16]


def _repo_root() -> str:
    import os

    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _witness_manifest() -> dict[str, str] | None:
    """name -> digest-at-last-passing-witness, maintained by
    tools/witness_manifest.py (run at round START, before any code edits,
    so the recorded digest is exactly what the driver's latest
    CORRECTNESS run executed).  None if the manifest doesn't exist
    (pre-adoption fallback to name-only retirement)."""
    import json
    import os

    path = os.path.join(_repo_root(), "WITNESS_MANIFEST.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _driver_witnessed() -> set[str]:
    """Names that already have a PASSING entry in a driver
    CORRECTNESS_r*.json *for their current content digest*.

    The driver's per-round correctness harness caps at roughly 50 queries
    per round and (empirically, r01/r02) walks ``queries()`` in dict
    order.  To converge on every registered query having a hard-signal
    entry, ``all_queries()`` orders never-witnessed queries first.  This
    is self-maintaining: once a round's artifact lands in the repo, its
    queries automatically deprioritize and the remainder surfaces next.

    Retirement is change-aware: WITNESS_MANIFEST.json records the digest
    each name had when the driver last witnessed it passing; a name whose
    current ``query_digest`` differs re-queues automatically (its plan or
    oracle changed since the witness, so the old pass no longer vouches
    for the current code)."""
    import glob
    import json
    import os

    seen: set[str] = set()
    for path in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                for name, rec in json.load(f).items():
                    # Only a PASSING entry retires a query from the
                    # unwitnessed-first queue: full hash pass, or — for
                    # by-design rows-only queries (no oracle) — a completed
                    # rows check.  A failed hash (r3: sequence_packing)
                    # must re-surface next round so the fix gets a fresh
                    # driver witness.
                    if rec.get("hash_match") is True or (
                        rec.get("err") == "no_oracle"
                        and rec.get("spark_rows") is not None
                    ):
                        seen.add(name)
        except (OSError, ValueError, AttributeError):
            continue

    manifest = _witness_manifest()
    if manifest is not None:
        stale = {
            n
            for n in seen
            if n in QUERIES and manifest.get(n) != query_digest(n)
        }
        seen -= stale
    return seen


# Queries that had no driver CORRECTNESS entry after rounds 1-2 (the
# round-2 verdict's top item).  Within the unwitnessed-first ordering,
# these go FIRST so queries added later don't push the long-waiting
# backlog past the driver's ~50-entries-per-round cap.  Self-retiring:
# once a name appears in a CORRECTNESS_r*.json it sorts by witnessed
# status alone and this list has no effect on it.
_R2_BACKLOG = {
    "ann_ivf_topk", "multimodal_decode_features", "multimodal_frame_sample",
    "hard_negative_mining", "embedding_random_projection",
    "multimodal_audio_segments", "pandas_udf_token_stats",
    "contamination_check", "minhash_jaccard_estimate", "text_normalize_dedup",
    "udtf_sentence_split", "kmeans_one_step", "triangle_count",
    "pagerank_one_step", "skew_salted_join", "percentile_stats",
    "interval_overlap_join", "q5_local_supplier_volume", "q8_market_share",
    "q16_supplier_part_buckets", "q22_dormant_customers",
    "q3_shipping_priority", "q7_nation_volume", "q10_returned_items",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q21_sole_return_supplier", "q2_min_cost_supplier", "q4_order_priority",
    "q9_product_type_profit", "q11_important_stock",
    "q12_ship_priority_buckets", "q13_customer_distribution",
    "q14_promo_effect", "q19_disjunctive_revenue", "q20_promo_part_suppliers",
    "doc_chunking", "sequence_packing", "repetition_filter",
    "pii_scrub_stats", "domain_mixture_sample", "embedding_quantize",
    "classifier_quality_filter", "arrow_normalize_embeddings",
    "purchase_click_outer_attribution", "funnel_attribution",
}


def all_queries() -> dict[str, QueryFn]:
    # Import side-effect modules that populate the registry.
    from odni_apache_beam_consumer_spark.plans import (  # noqa: F401
        advanced,
        analytics,
        curation,
        decode,
        evaluation,
        governance,
        llm,
        maintenance,
        ml,
        physical,
        relational,
        retrieval,
        stats_tests,
        stats_tests2,
        storage_duals,
        streaming_duals,
        tpch,
        tpch2,
        training,
        windows,
    )

    witnessed = _driver_witnessed()
    ordered = sorted(
        QUERIES, key=lambda n: (n in witnessed, n not in _R2_BACKLOG)
    )
    return {name: QUERIES[name] for name in ordered}


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLES)
