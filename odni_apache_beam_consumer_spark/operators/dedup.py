"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes
------------
* **Portable hashing.** Signatures are built from ``md5`` of shingle
  strings, not ``xxhash64``/``F.hash``: md5 is bit-identical across Spark
  and DuckDB, which makes every dedup operator here *oracle-checkable* —
  the DuckDB oracle reproduces the exact same signatures. md5 is computed
  JVM-side per distinct shingle, so it is not a bottleneck; at true 100 TB
  scale swap ``portable_hash`` for ``F.xxhash64`` (one-line change) and
  drop to rows-only verification.
* **Shuffle shape.** MinHash/LSH is 3 shuffles: (doc,shingle) explode ->
  groupBy (doc, hash_idx) for signature mins -> groupBy (doc, band) for
  band signatures -> self-join on (band, sig). The self-join key includes
  the full band signature, so band buckets are tiny and the join is
  skew-safe; a hot (identical-content) bucket of size m yields m^2/2 pairs
  — cap with ``max_bucket`` if the corpus has mass-duplicated boilerplate.
* **Exact dedup** is a single hash-aggregate on the content hash — the
  map-side partial aggregation means each executor emits one row per
  distinct hash, which is the optimal 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.operators.text_ops import with_tokens, word_shingles


def portable_hash(col, salt_col) -> F.Column:
    """Deterministic cross-engine hash: md5(shingle || '#' || salt)."""
    return F.md5(F.concat(col, F.lit("#"), salt_col.cast("string")))


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical content; keep the smallest id as canonical."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_table(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle) pairs — distinct n-word shingles per document."""
    tk = with_tokens(df, text_col=text_col, out="tk").where(F.size("tk") >= n)
    return tk.select(F.col(id_col), F.explode(word_shingles("tk", n)).alias("shingle"))


def minhash_signatures(sh: DataFrame, num_hashes: int, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature rows (id, h, minhash) from a (id, shingle) table."""
    hashed = sh.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
        "shingle",
    )
    return hashed.groupBy(id_col, "h").agg(
        F.min(portable_hash(F.col("shingle"), F.col("h"))).alias("minhash")
    )


def lsh_band_signatures(
    mh: DataFrame, rows_per_band: int, id_col: str = "doc_id"
) -> DataFrame:
    """Concatenate each band's minhashes (ordered by hash index) into one
    band signature string."""
    return mh.groupBy(F.col(id_col), F.expr(f"h div {rows_per_band}").alias("band")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                lambda x: x["minhash"],
            ),
            "|",
        ).alias("sig")
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (a < b) pairs sharing at least one full band signature."""
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    shingle_words: int = 3,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end MinHash/LSH near-duplicate candidate pairs."""
    sh = shingle_table(df, shingle_words, id_col, text_col)
    mh = minhash_signatures(sh, num_hashes, id_col)
    bands = lsh_band_signatures(mh, rows_per_band, id_col)
    return lsh_candidate_pairs(bands, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document as a '0'/'1' string (portable encoding).

    Each token votes +1/-1 on every bit of md5(token); the sign of the
    per-bit sum is the signature bit. Bit b is extracted from hex digit
    b//4 of the md5 (no engine-specific bit intrinsics, so the DuckDB
    oracle reproduces it exactly).
    """
    tk = with_tokens(df, text_col=text_col, out="tk")
    tok = tk.select(F.col(id_col), F.explode("tk").alias("tok")).withColumn(
        "th", F.md5(F.col("tok"))
    )
    votes = tok.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "th",
    ).select(
        id_col,
        "b",
        F.expr(
            f"CASE WHEN CAST(floor((instr('{_HEX}', substr(th, 1 + b div 4, 1)) - 1) / "
            "(CASE b % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS INT) % 2 = 1 "
            "THEN 1 ELSE -1 END"
        )
        .cast("long")
        .alias("vote"),
    )
    bitcol = (
        votes.groupBy(id_col, "b")
        .agg(F.sum("vote").alias("v"))
        .select(
            id_col, "b", F.when(F.col("v") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
        )
    )
    return bitcol.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("b", "bit"))), lambda x: x["bit"]),
            "",
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    n_blocks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash: block candidates (pigeonhole on
    ``n_blocks`` 16-bit blocks) then exact Hamming distance filter."""
    sig = simhash_signatures(df, id_col, text_col)
    block_len = 64 // n_blocks
    blocks = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
    ).withColumn("blk_sig", F.expr(f"substr(simhash, 1 + blk * {block_len}, {block_len})"))
    a = blocks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "blk", "blk_sig"
    )
    b = blocks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "blk", "blk_sig"
    )
    cand = (
        a.join(b, ["blk", "blk_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> "
        "acc + IF(substr(sig_a, i, 1) = substr(sig_b, i, 1), 0, 1))"
    )
    return (
        cand.withColumn("hamming", hamming.cast("bigint"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    shingle_words: int = 5,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard similarity over word n-grams, for pairs sharing >= 1
    shingle. Inverted-index join: |A∩B| comes from grouping the shingle
    table with itself, so cost is sum over shingles of (docs-per-shingle)^2
    — at 100 TB, drop shingles with document frequency above a cap first
    (boilerplate killer), which bounds each group."""
    sh = shingle_table(df, shingle_words, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("nsh").alias("nsh_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("nsh").alias("nsh_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("nsh_a") + F.col("nsh_b") - F.col("c")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
