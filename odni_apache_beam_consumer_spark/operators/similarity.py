"""Similarity search over embedding columns (array<float>).

* Brute-force cosine top-k: the exact baseline. Query side is broadcast
  (top-k query sets are small by construction); the corpus is scanned once,
  partition-parallel, and per-query top-k is taken with a window — no
  global sort.
* Stored-random-projection LSH bucketing: the scale path. Vectors are
  bucketed by the sign pattern of dot products against seeded Gaussian
  hyperplanes (literal-embedded so the DuckDB oracle reproduces buckets
  bit-for-bit); candidate generation is then an equi-join on the bucket
  key — optionally widened by Hamming-radius-1 multi-probe — turning the
  O(Q x N) / O(N^2) cross product into O(sum over buckets), the same
  shape as a partitioned ANN index.  Every plane mixes all components,
  so recall holds on real (non-axis-aligned) embeddings, unlike
  component-sign bucketing.

All arithmetic uses higher-order array functions (zip_with + aggregate)
over ``array<double>`` — JVM-side, no Python. The fold is left-to-right,
which matches DuckDB's ``list_dot_product`` evaluation order, so cosine
values are bit-reproducible against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def with_vec(df: DataFrame, vec_col: str = "embedding", out: str = "vec") -> DataFrame:
    """Cast float vector to array<double> (all scoring happens in double)."""
    return df.withColumn(out, F.col(vec_col).cast("array<double>"))


def with_self_dot(df: DataFrame, vec_col: str = "vec", out: str = "dd") -> DataFrame:
    return df.withColumn(out, dot(vec_col, vec_col))


def cosine(dot_ab: Column, dd_a: Column, dd_b: Column) -> Column:
    return dot_ab / (F.sqrt(dd_a) * F.sqrt(dd_b))


def random_hyperplanes(
    nbits: int = 8, dim: int = 64, seed: int = 42, ndigits: int = 6
) -> list[list[float]]:
    """Seeded Gaussian random projection planes (stored-literal form).

    Rounded to ``ndigits`` so the exact same decimal literals can be
    embedded in the Spark expression AND the DuckDB oracle SQL — both
    engines parse them to identical doubles, keeping the ANN query
    value-hash-checkable.  True random hyperplanes give far better recall
    than component-sign bucketing: every plane mixes all ``dim``
    components instead of thresholding one."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        [round(float(x), ndigits) for x in rng.randn(dim)] for _ in range(nbits)
    ]


def plane_dot_expr(vec_col_name: str, plane: list[float]) -> str:
    """SQL expr string: dot(vec, literal plane) as a left-to-right fold —
    the same evaluation order as DuckDB's ``list_dot_product``, so the
    value is bit-identical across engines."""
    arr = ", ".join(f"CAST({v} AS DOUBLE)" for v in plane)
    return (
        f"aggregate(zip_with({vec_col_name}, array({arr}), (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def project(vec_col_name: str, plane: list[float]) -> Column:
    """dot(vec, stored literal plane) as a Column (one JL component)."""
    return F.expr(plane_dot_expr(vec_col_name, plane))


def random_project(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "proj",
    ndigits: int = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: map each vector to
    its k = len(planes) dot products against stored Gaussian planes.

    THE standard pre-ANN / pre-clustering shrink for embedding corpora
    (JL lemma: pairwise distances survive within (1±ε) for
    k = O(log n / ε²)).  Pure JVM higher-order-function arithmetic — one
    map-only stage, no shuffle, no Python — and the stored-literal planes
    make the output bit-reproducible in DuckDB for the oracle.
    Components are rounded to ``ndigits`` (same discipline as every other
    float surface here)."""
    v = with_vec(df, vec_col)
    return v.withColumn(
        out_col,
        F.array(*[F.round(project("vec", p), ndigits) for p in planes]),
    ).drop("vec")


def projection_bucket(vec_col_name: str, planes: list[list[float]]) -> Column:
    """LSH bucket from stored hyperplanes: concat over planes of the sign
    bit of dot(vec, plane).  Left-to-right fold, same as the DuckDB
    ``list_dot_product`` evaluation order, so buckets are bit-identical
    across engines."""
    parts = [
        f"IF({plane_dot_expr(vec_col_name, plane)} >= CAST(0.0 AS DOUBLE), '1', '0')"
        for plane in planes
    ]
    return F.expr("concat(" + ", ".join(parts) + ")")


def multiprobe_buckets(bucket_col: str, nbits: int) -> Column:
    """The query bucket plus every 1-bit-flip neighbor bucket (Hamming
    radius 1 multi-probe): recovers most near neighbors that fall just
    across one hyperplane, at the cost of ``nbits`` extra (tiny) probes
    instead of lowering nbits and fattening every bucket."""
    return F.expr(
        f"transform(sequence(0, {nbits}), p -> IF(p = 0, {bucket_col}, "
        f"concat(substr({bucket_col}, 1, p - 1), "
        f"IF(substr({bucket_col}, p, 1) = '1', '0', '1'), "
        f"substr({bucket_col}, p + 1, {nbits} - p))))"
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (self excluded).

    ``planes=None``   -> exact brute force (broadcast queries x corpus).
    ``planes=[[...]]`` -> stored-projection LSH candidate join on the
    len(planes)-bit bucket (no multi-probe; use ``ann_topk`` for the
    production approximate path with probing).
    Ranking is on cosine rounded to 6dp with id tiebreak (deterministic,
    oracle-reproducible).
    """
    q = with_self_dot(with_vec(queries, vec_col)).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qv"), F.col("dd").alias("qdd")
    )
    c = with_self_dot(with_vec(corpus, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("cv"), F.col("dd").alias("cdd")
    )
    if planes is None:
        joined = c.crossJoin(F.broadcast(q))
    else:
        qb = q.withColumn("bucket", projection_bucket("qv", planes))
        cb = c.withColumn("bucket", projection_bucket("cv", planes))
        joined = cb.join(F.broadcast(qb), "bucket")
    scored = (
        joined.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine(dot("qv", "cv"), F.col("qdd"), F.col("cdd")), 6),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    planes: list[list[float]] | None = None,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cosine: float | None = None,
) -> DataFrame:
    """Approximate top-k via stored-random-projection LSH with multi-probe.

    Scale shape: the corpus is scanned once and bucketed by an ``nbits``
    sign pattern of seeded hyperplane projections; the (small, broadcast)
    query side explodes into 1 + nbits probe buckets (Hamming radius 1);
    candidates come from an equi-join on the bucket key — O(sum of probed
    bucket sizes), never O(Q x N).  Each (query, neighbor) candidate pair
    arises through at most one probe (a corpus vector lives in exactly one
    bucket and probe buckets are distinct), so no dedup pass is needed.

    ``max_cosine`` caps similarity BEFORE ranking — the hard-negative-
    mining mode: neighbors above the cap are presumed duplicates/positives
    and excluded, so the top-k returned are the most-similar NON-duplicate
    candidates (the informative negatives for contrastive training)."""
    planes = planes if planes is not None else random_hyperplanes()
    nbits = len(planes)
    q = with_self_dot(with_vec(queries, vec_col)).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qv"), F.col("dd").alias("qdd")
    )
    q = q.withColumn("bucket", projection_bucket("qv", planes))
    if multiprobe:
        q = q.select(
            "query_id", "qv", "qdd", F.explode(multiprobe_buckets("bucket", nbits)).alias("bucket")
        )
    c = with_self_dot(with_vec(corpus, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("cv"), F.col("dd").alias("cdd")
    )
    c = c.withColumn("bucket", projection_bucket("cv", planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine(dot("qv", "cv"), F.col("qdd"), F.col("cdd")), 6),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    if max_cosine is not None:
        scored = scored.where(F.col("cosine") < max_cosine)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def label_centroids(
    corpus: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid vectors — the IVF coarse quantizer.

    Components are rounded to 6dp so Spark and DuckDB (whose AVG summation
    orders differ in the last ulp) agree bit-for-bit on every downstream
    assignment."""
    v = with_vec(corpus, vec_col).select("label", "vec")
    return v.groupBy("label").agg(
        F.array(
            *[F.round(F.avg(F.element_at(F.col("vec"), i + 1)), 6) for i in range(dim)]
        ).alias("cvec")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: corpus partitioned into cells by nearest
    (cosine) label-centroid; each query probes its ``nprobe`` best cells
    and scores exactly within them.

    Scale shape: the centroid table is tiny (one row per label) and
    broadcast to both assignments; candidate generation is an equi-join on
    the cell key — O(sum of probed cell sizes) per query, never O(N).  At
    100 TB the corpus side is one scan + one broadcast-join + the bucketed
    candidate join; cells can also be written out partitioned-by-cell so
    repeated query batches prune to the probed partitions."""
    cents = label_centroids(corpus, dim, id_col, vec_col)
    cents = with_self_dot(cents, "cvec", "cdd2").select(
        F.col("label").alias("cell"), F.col("cvec"), F.col("cdd2")
    )
    c = with_self_dot(with_vec(corpus, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("cv"), F.col("dd").alias("cdd")
    )
    w_assign = W.partitionBy("neighbor_id").orderBy(F.col("ccos").desc(), "cell")
    c_cells = (
        c.join(F.broadcast(cents))
        .withColumn("ccos", F.round(cosine(dot("cv", "cvec"), F.col("cdd"), F.col("cdd2")), 6))
        .withColumn("crank", F.row_number().over(w_assign))
        .where(F.col("crank") == 1)
        .select("neighbor_id", "cv", "cdd", "cell")
    )
    q = with_self_dot(with_vec(queries, vec_col)).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qv"), F.col("dd").alias("qdd")
    )
    w_probe = W.partitionBy("query_id").orderBy(F.col("qcos").desc(), "cell")
    q_probes = (
        q.join(F.broadcast(cents))
        .withColumn("qcos", F.round(cosine(dot("qv", "cvec"), F.col("qdd"), F.col("cdd2")), 6))
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "qv", "qdd", "cell")
    )
    scored = (
        c_cells.join(F.broadcast(q_probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", F.round(cosine(dot("qv", "cv"), F.col("qdd"), F.col("cdd")), 6)
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    planes: list[list[float]] | None = None,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate (a < b) pairs with cosine >= threshold, candidate-
    limited to stored-random-projection LSH buckets (the blocked/banded
    scale path).

    With ``multiprobe`` the LEFT side of the self-join explodes into its
    home bucket plus every Hamming-1 neighbor while the right side stays
    home-only, so a pair is matched iff their home buckets differ in at
    most one bit — recovering near-duplicates that straddle exactly one
    hyperplane (the dominant miss mode: a pair at cosine 0.9+ rarely
    crosses two of the random planes).  Each qualifying pair arises via
    exactly one probe (home buckets are unique, probe buckets distinct),
    so no dedup pass is needed.  Scale: candidate volume is bounded by
    the probed-bucket sizes, never O(N^2); raise len(planes) as N grows
    to keep buckets bounded."""
    planes = planes if planes is not None else random_hyperplanes()
    nbits = len(planes)
    v = with_self_dot(with_vec(df, vec_col)).withColumn(
        "bucket", projection_bucket("vec", planes)
    )
    a = v.select(
        F.col(id_col).alias("vec_a"), F.col("vec").alias("va"), F.col("dd").alias("da"), "bucket"
    )
    if multiprobe:
        a = a.select(
            "vec_a",
            "va",
            "da",
            F.explode(multiprobe_buckets("bucket", nbits)).alias("bucket"),
        )
    b = v.select(
        F.col(id_col).alias("vec_b"), F.col("vec").alias("vb"), F.col("dd").alias("db"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine(dot("va", "vb"), F.col("da"), F.col("db")), 6))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Persisted ANN index: build once, probe many with partition pruning
# ---------------------------------------------------------------------------


_GRP_BITS = 4


def _bucket_grp(bucket_col):
    """Directory-partition group of a bucket id: 'g' + the bucket's
    leading ``_GRP_BITS`` bits (bucket ids are 'b' + bit-string)."""
    return F.concat(F.lit("g"), F.substring(bucket_col, 2, _GRP_BITS))


def build_ann_index(
    corpus: DataFrame,
    path: str,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize an LSH index of the corpus: parquet PARTITIONED BY the
    projection bucket, with each vector's self-dot precomputed.

    This is the missing half of ``ann_topk`` at 100 TB: that operator
    re-buckets the full corpus per query batch, which is correct but pays
    a corpus scan every time.  A search SERVICE builds the index once
    (one map-only pass + a partitioned write — no shuffle: rows are
    appended to their bucket's directory) and every later query batch
    reads ONLY its probed bucket partitions — partition pruning at the
    file listing level, so probe cost is O(probed bucket bytes),
    independent of corpus size.  Returns the planes so the caller can
    probe with the same ones (they are also implied by the seed).

    The layout is TWO-LEVEL: directories are partitioned by the bucket's
    leading ``_GRP_BITS`` bits (16 groups for the default 4), and the
    full bucket id is a DATA column, sorted within each written file.  A
    probe prunes directories by group at file-listing level, then the
    ``bucket IN (...)`` filter is pushed into the parquet scan where the
    sort makes row-group min/max stats skip non-probed buckets.  One
    directory per bucket (256 dirs) pruned purely by listing was the
    round-6..9 layout; it read marginally fewer footers per probe but
    paid a ~5 s per-append commit constant (hundreds of tiny files and
    directories per micro-batch at replay scale) and recreates the
    small-file problem under continuous ingest.  Coarse dirs + sorted
    fine key is the standard lakehouse answer (partition + sort/Z-order)
    and keeps probe I/O O(probed bucket bytes) at any corpus size."""
    planes = planes if planes is not None else random_hyperplanes()
    c = with_self_dot(with_vec(corpus, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cv"),
        F.col("dd").alias("cdd"),
    )
    # 'b'/'g' prefixes: partition VALUES in directory names go through
    # type inference on read — a pure bit-string like '00001101' would
    # come back as the integer 1101 (leading zeros gone), silently
    # breaking the literal probe filter.  The prefix pins the column to
    # string.
    c = c.withColumn(
        "bucket", F.concat(F.lit("b"), projection_bucket("cv", planes))
    )
    c = c.withColumn("grp", _bucket_grp(F.col("bucket")))
    (
        c.sortWithinPartitions("grp", "bucket")
        .write.mode("overwrite")
        .partitionBy("grp")
        .parquet(path)
    )
    return planes


def probe_buckets_py(vec: list[float], planes: list[list[float]]) -> list[str]:
    """Driver-side bucket ids for one query vector: its home bucket plus
    all Hamming-1 neighbors — the same probe set multiprobe_buckets
    builds in-plan, computed in plain Python so the index read can prune
    partitions BEFORE any Spark job runs (partition filters must be plan
    literals to prune the file listing).  Bit-string format and sign rule
    (dot >= 0 -> '1', left-to-right accumulation) mirror
    ``projection_bucket`` exactly — a type or fold-order mismatch here
    would silently defeat pruning (casted partition columns don't prune)
    or probe the wrong bucket."""
    acc = []
    for p in planes:
        d = 0.0
        for x, y in zip(vec, p):
            d += x * y
        acc.append("1" if d >= 0 else "0")
    home = "".join(acc)
    flips = [
        home[:b] + ("0" if home[b] == "1" else "1") + home[b + 1 :]
        for b in range(len(planes))
    ]
    return [home] + flips


def query_ann_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors of one query vector against a persisted
    index, reading only the probed bucket partitions.

    The probe set is computed driver-side (literal partition filter ->
    the parquet source prunes non-probed directories from the file
    listing; `.explain` shows them under PartitionFilters), the query
    vector is embedded as an array literal, and the exact cosine +
    WindowGroupLimit top-k runs over candidates only.  Scoring math is
    identical to ann_topk, so results match it wherever the probe sets
    coincide."""
    buckets = ["b" + b for b in probe_buckets_py(query_vec, planes)]
    grps = sorted({"g" + b[1 : 1 + _GRP_BITS] for b in buckets})
    qlit = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    qdd = float(sum(x * x for x in query_vec))
    # grp prunes directories at file-listing level; the bucket IN filter
    # is pushed into the parquet scan where the write-time sort lets
    # row-group stats skip non-probed buckets inside each group file.
    idx = spark.read.parquet(path).where(
        F.col("grp").isin(grps) & F.col("bucket").isin(buckets)
    )
    scored = idx.select(
        "neighbor_id",
        F.round(
            cosine(dot(qlit, F.col("cv")), F.lit(qdd), F.col("cdd")), 6
        ).alias("cosine"),
    )
    return (
        scored.orderBy(F.col("cosine").desc(), "neighbor_id")
        .limit(k)
        .select("neighbor_id", "cosine")
    )


def append_to_ann_index(
    new_vectors: DataFrame,
    path: str,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally grow a persisted ANN index: bucket the new vectors
    with the SAME stored planes and append them into their bucket
    partitions.

    This is what makes the index maintainable under continuous ingest
    (pair with streaming/windows.py::ingest_dedup_against_corpus feeding
    deduped batches): appends touch only the buckets the new vectors land
    in, existing files are never rewritten, and probes see old + new
    uniformly because bucketing is a pure function of (vector, planes).
    Periodically `storage.compact` hot bucket partitions if micro-batch
    appends fragment them.  Using DIFFERENT planes than the build would
    silently corrupt recall — always reuse the returned build planes."""
    c = with_self_dot(with_vec(new_vectors, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cv"),
        F.col("dd").alias("cdd"),
    )
    c = c.withColumn(
        "bucket", F.concat(F.lit("b"), projection_bucket("cv", planes))
    )
    c = c.withColumn("grp", _bucket_grp(F.col("bucket")))
    (
        c.sortWithinPartitions("grp", "bucket")
        .write.mode("append")
        .partitionBy("grp")
        .parquet(path)
    )


def pq_subspace_planes(
    n_sub: int = 8,
    bits_per_sub: int = 4,
    sub_dim: int = 8,
    seed: int = 77,
    ndigits: int = 6,
) -> list[list[list[float]]]:
    """Stored-literal sign-pattern codebook planes for product
    quantization: per subspace, ``bits_per_sub`` Gaussian hyperplanes in
    the subspace's ``sub_dim`` dimensions.  A vector's PQ code in
    subspace m is the sign pattern of its sub-vector against these
    planes (2^bits codes per subspace); the codebook CENTROID for a code
    is the mean of the sub-vectors landing on it — a deterministic,
    training-free vector quantizer (sign-pattern VQ) whose cells adapt
    to the data through the centroids while staying replayable in SQL
    (k-means codebooks would need an unrolled-Lloyd oracle per
    subspace).  Same stored-decimal-literal discipline as
    random_hyperplanes."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        [
            [round(float(x), ndigits) for x in rng.randn(sub_dim)]
            for _ in range(bits_per_sub)
        ]
        for _ in range(n_sub)
    ]


def pq_code_col(
    vec_col_name: str, planes_sub: list[list[float]], start: int
) -> Column:
    """PQ code of one subspace: sign pattern of slice(vec, start,
    sub_dim) against the subspace's stored planes (1-based start)."""
    sub_dim = len(planes_sub[0])
    sub = f"slice({vec_col_name}, {start}, {sub_dim})"
    parts = [
        f"IF({plane_dot_expr(sub, p)} >= CAST(0.0 AS DOUBLE), '1', '0')"
        for p in planes_sub
    ]
    return F.expr("concat(" + ", ".join(parts) + ")")


def pq_adc_topk(
    q_df: DataFrame,
    corpus: DataFrame,
    planes_by_sub: list[list[list[float]]],
    k: int = 5,
    rerank: int = 50,
    scale: int = 10000,
    candidates: DataFrame | None = None,
    emb: DataFrame | None = None,
    qemb: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation and
    exact re-ranking (ADC+R, Jégou et al. TPAMI'11): corpus vectors are
    compressed to M subspace sign-pattern codes (M x 4 bits = 8 bytes
    per vector vs 256 raw — the memory lever that lets billion-vector
    indexes fit in RAM), queries stay full-precision, each candidate's
    coarse score is a sum of M table lookups, and only the top
    ``rerank`` ADC candidates per query are re-scored with exact cosine
    against their raw vectors.

    The ADC stage is EXACT INTEGER: vectors are L2-normalized then
    fixed-pointed (``FLOOR(x / sqrt(dd) * scale)``; normalization makes
    inner product track cosine, without which large-norm vectors
    dominate the ranking), centroids are integer means (SUM DIV COUNT),
    and ADC scores are integer dots — bit-identical across engines, so
    the driver hash-checks the codebook + LUT + candidate selection,
    not just the re-ranked tail.  Codes are computed on the RAW vector
    (sign patterns are scale-invariant).

    Scale shape: code assignment and fixed-pointing are map-side; the
    codebook is one hash agg into at most M x 2^bits x dim cells (a few
    thousand rows, amortized over every query); the per-query lookup
    table is |queries| x M x 2^bits rows and BROADCAST; the ADC scan
    touches only the code table (M small ints per vector, never the
    raw vectors) — that read-volume reduction IS the PQ speedup — and
    the exact re-rank reads raw vectors for just ``rerank`` candidates
    per query.  ``candidates`` (query_id, vec_id) optionally gates the
    ADC scan to a precomputed candidate set — passing the IVF coarse
    quantizer's probed-cell pairs here IS IVFADC (ivfpq_adc_topk);
    keeping one shared body guarantees the two paths can never diverge
    in scale/rounding/tie-break conventions.  ``emb``/``qemb`` let a
    caller that already normalized the corpus/queries (ivfpq_adc_topk's
    IVF stage) thread those frames in, so both stages share ONE lineage
    instead of Catalyst re-deriving the normalization scans per subtree
    (round-9 advice item 4)."""
    m_count = len(planes_by_sub)
    sub_dim = len(planes_by_sub[0][0])
    if emb is None:
        emb = with_self_dot(with_vec(corpus))
    codes = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("int").alias("m"),
                        pq_code_col("vec", planes_by_sub[m], m * sub_dim + 1).alias(
                            "code"
                        ),
                    )
                    for m in range(m_count)
                ]
            )
        ).alias("mc"),
    ).select("vec_id", "mc.m", "mc.code")
    norm_ints = (
        f"transform(vec, x -> CAST(FLOOR(x / sqrt(dd) * {scale}) AS BIGINT))"
    )

    def _elems(df: DataFrame, id_out: str) -> DataFrame:
        return (
            df.select(
                F.col("vec_id").alias(id_out),
                F.posexplode(F.expr(norm_ints)).alias("d0", "xs"),
            )
            .select(
                id_out,
                (F.col("d0") + 1).cast("int").alias("d"),
                F.expr(f"CAST(d0 DIV {sub_dim} AS INT)").alias("m"),
                "xs",
            )
        )

    elems = _elems(emb, "vec_id")
    cent = (
        elems.join(codes, ["vec_id", "m"])
        .groupBy("m", "code", "d")
        .agg(F.expr("CAST(SUM(xs) DIV COUNT(*) AS BIGINT)").alias("c"))
    )
    if qemb is None:
        qemb = with_self_dot(with_vec(q_df))
    lut = (
        _elems(qemb, "query_id")
        .withColumnRenamed("xs", "qs")
        .join(cent, ["m", "d"])
        .groupBy("query_id", "m", "code")
        .agg(F.sum(F.col("qs") * F.col("c")).cast("long").alias("partial"))
    )
    if candidates is None:
        gated = codes.join(F.broadcast(lut), ["m", "code"]).where(
            F.col("vec_id") != F.col("query_id")
        )
    else:
        gated = candidates.join(codes, "vec_id").join(
            F.broadcast(lut), ["query_id", "m", "code"]
        )
    adc = gated.groupBy("query_id", "vec_id").agg(
        F.sum("partial").cast("long").alias("adc_score")
    )
    w_adc = W.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vec_id"))
    cand = (
        adc.withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= rerank)
        .select("query_id", "vec_id")
    )
    qv = qemb.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("dd").alias("qdd"),
    )
    rescored = (
        cand.join(emb.select("vec_id", "vec", "dd"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(dot("qv", "vec"), F.col("qdd"), F.col("dd")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivfpq_adc_topk(
    q_df: DataFrame,
    corpus: DataFrame,
    planes_by_sub: list[list[list[float]]],
    k: int = 5,
    rerank: int = 50,
    nprobe: int = 6,
    dim: int = 64,
    scale: int = 10000,
) -> DataFrame:
    """IVFADC (Jégou et al. TPAMI'11 §V): the IVF coarse quantizer gates
    WHICH code rows the PQ-ADC stage scans — each corpus vector lives in
    exactly one centroid cell, each query probes its ``nprobe`` best
    cells, and the integer ADC scan + exact re-rank run only over the
    probed cells' codes instead of the whole code table.  This is the
    composition promised in pq_adc_topk's docstring: IVF bounds the
    candidate row count (sum of probed cell sizes), PQ bounds the bytes
    per candidate (M small ints), so probe cost is independent of corpus
    size on BOTH axes.

    Same exact-integer ADC discipline as pq_adc_topk (fixed-point
    normalized vectors, SUM DIV COUNT centroids, integer LUT dots) and
    same broadcast coarse quantizer as ivf_topk, so the driver
    hash-checks cell assignment + codebook + LUT + candidate gating end
    to end.

    Scale shape: centroids broadcast (one row per cell); cell assignment
    and code assignment are map-side; the candidate list is an equi-join
    of the cell-keyed code table with the broadcast (query, probed-cell)
    pairs — at 100 TB the code table would be written partitioned by
    cell so the probed-cell join prunes partitions, the ivf_topk note
    applied to codes instead of raw vectors."""
    emb = with_self_dot(with_vec(corpus))

    # --- IVF coarse quantizer: one cell per corpus vector, nprobe per query
    cents = label_centroids(corpus, dim)
    cents = with_self_dot(cents, "cvec", "cdd2").select(
        F.col("label").alias("cell"), "cvec", "cdd2"
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), "cell")
    cell_of = (
        emb.select("vec_id", "vec", "dd")
        .join(F.broadcast(cents))
        .withColumn(
            "ccos", F.round(cosine(dot("vec", "cvec"), F.col("dd"), F.col("cdd2")), 6)
        )
        .withColumn("crank", F.row_number().over(w_assign))
        .where(F.col("crank") == 1)
        .select("vec_id", "cell")
    )
    qemb = with_self_dot(with_vec(q_df))
    w_probe = W.partitionBy("query_id").orderBy(F.col("qcos").desc(), "cell")
    q_probes = (
        qemb.select(F.col("vec_id").alias("query_id"), "vec", "dd")
        .join(F.broadcast(cents))
        .withColumn(
            "qcos", F.round(cosine(dot("vec", "cvec"), F.col("dd"), F.col("cdd2")), 6)
        )
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "cell")
    )

    # --- the IVFADC step: the probed-cell candidate pairs gate the shared
    # PQ-ADC body (code table, integer codebook, LUT, ADC scan, exact
    # re-rank all live in pq_adc_topk — one copy, zero drift risk)
    cand_ids = (
        cell_of.join(F.broadcast(q_probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    return pq_adc_topk(
        q_df,
        corpus,
        planes_by_sub,
        k=k,
        rerank=rerank,
        scale=scale,
        candidates=cand_ids,
        emb=emb,
        qemb=qemb,
    )
