"""Targeted tests for the retrieval/tokenizer pack (plans/retrieval.py):
properties the DuckDB oracles can't express — plan shapes, index
structural invariants, and the BPE argmax rule.  Value correctness is
covered by the parametrized oracle suite (test_queries_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.catalog import load_table
from odni_apache_beam_consumer_spark.plans.registry import all_queries
from odni_apache_beam_consumer_spark.plans.retrieval import (
    _BLOCK,
    _PROBE_TERMS,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_topk_hits_are_real_and_heap_sorted(spark, sf_dir):
    """Every returned doc must actually contain >= 1 probe term (scores
    can't materialize from nothing), per-doc hit counts are bounded by
    the probe size, and the global top-50 must plan as
    TakeOrderedAndProject (per-partition heaps), never a full sort."""
    df = all_queries()["bm25_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    hit_docs = {r.doc_id for r in rows}
    probe_re = "|".join(_PROBE_TERMS)
    really_hit = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("text").rlike(rf"\b({probe_re})\b"))
        .select("doc_id")
        .collect()
    }
    assert hit_docs <= really_hit
    for r in rows:
        assert 1 <= r.n_terms_hit <= len(_PROBE_TERMS)
        assert r.bm25_micro > 0


def test_postings_blocks_partition_each_term_exactly(spark, sf_dir):
    """Structural index invariants: blocks are <= _BLOCK docs, block
    sizes per term sum to df, consecutive blocks are doc-id-disjoint and
    ordered (block k's first_doc > block k-1's last_doc), and the varint
    size is at least 1 byte per posting."""
    rows = all_queries()["postings_index_build"](spark, sf_dir).collect()
    assert rows
    by_term: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.n_in_block <= _BLOCK
        assert r.first_doc <= r.last_doc
        assert r.varint_bytes >= r.n_in_block
        by_term.setdefault(r.term, []).append(r)
    for term, blocks in by_term.items():
        blocks.sort(key=lambda r: r.block_id)
        assert [b.block_id for b in blocks] == list(range(len(blocks)))
        assert sum(b.n_in_block for b in blocks) == blocks[0].df
        # all blocks except the last are full
        assert all(b.n_in_block == _BLOCK for b in blocks[:-1])
        for prev, cur in zip(blocks, blocks[1:]):
            assert cur.first_doc > prev.last_doc, term


def test_bpe_merge_selects_the_argmax_pair(spark, sf_dir):
    """The selected merge must be rank 1, ranks must be dense from 1,
    counts non-increasing, and every pair exactly 2 chars."""
    rows = sorted(
        all_queries()["bpe_merge_step"](spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert [r.selected for r in rows] == [True] + [False] * (len(rows) - 1)
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_recency_score_bounded_by_full_weight_mass(spark, sf_dir):
    """Each user's decayed score is bounded above by 30x their undecayed
    centi-value mass (weight <= 30) and below by 0 (weight >= 0) — the
    ramp can only attenuate, never amplify or flip sign beyond the
    value's own sign."""
    df = all_queries()["recency_weighted_engagement"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = {r.user_id: r for r in df.collect()}
    assert rows
    mass = {
        r.user_id: r.mass
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isin(*rows))
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100)).alias("mass"))
        .collect()
    }
    for uid, r in rows.items():
        assert 0 <= r.score_centi <= 30 * mass[uid], uid


def _bpe_greedy_reference(words: dict[str, int], n_rounds: int):
    """Plain-Python Sennrich reference: argmax pair (count desc, pair
    asc), greedy left-to-right fold merge, n rounds."""
    segs = {w: list(w) for w in words}
    out = []
    for r in range(1, n_rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in segs.items():
            acc: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    acc.append(a + b)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            segs[w] = acc
        out.append((r, a + b, cnt, sum(len(v) for v in segs.values())))
    return out


def test_bpe_train_rounds_greedy_overlap_semantics(spark):
    """Adversarial vocab: repeated-symbol runs (aaaa, aaaaa) and
    alternating patterns where candidate matches overlap — the island
    even-offset filter must reproduce exact greedy left-to-right
    merging, round after round, including merges of already-merged
    symbols."""
    from odni_apache_beam_consumer_spark.plans.retrieval import (
        bpe_train_rounds,
    )

    vocab = {
        "aaaa": 50,
        "aaaaa": 40,
        "ababab": 30,
        "aabaa": 20,
        "banana": 10,
        "bb": 5,
    }
    words = spark.createDataFrame(
        list(vocab.items()), "w STRING, freq BIGINT"
    )
    got = [
        (r.round, r.merged, r.pair_count, r.vocab_symbols)
        for r in bpe_train_rounds(words, 5)
        .orderBy("round")
        .collect()
    ]
    assert got == _bpe_greedy_reference(vocab, 5)


def _bpe_apply_reference(
    words: list[str], merges: list[tuple[str, str]]
) -> dict[str, list[str]]:
    """Plain-Python Sennrich APPLY reference: replay the merge table in
    priority order, greedy left-to-right fold per rule."""
    segs = {w: list(w) for w in words}
    for a, b in merges:
        for w, syms in segs.items():
            acc: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    acc.append(a + b)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            segs[w] = acc
    return segs


def test_bpe_apply_merges_matches_reference_on_unseen_words(spark):
    """The inference half: a merge table learned on one vocab applied to
    UNSEEN words (runs, overlaps, merged-symbol chains, length-1) must
    match the plain-Python Sennrich apply exactly — and on the training
    words it must reproduce the training segmentation."""
    from odni_apache_beam_consumer_spark.plans.retrieval import (
        bpe_apply_merges,
        bpe_train_rounds,
    )

    train_vocab = {"aaaa": 50, "ababab": 30, "banana": 10, "bb": 5}
    train_words = spark.createDataFrame(
        list(train_vocab.items()), "w STRING, freq BIGINT"
    )
    merges: list[tuple[str, str]] = []
    bpe_train_rounds(train_words, 4, merges_out=merges)
    assert len(merges) == 4

    unseen = ["aaaaaaa", "abba", "nanaba", "a", "cacaca", "baaab"]
    apply_words = spark.createDataFrame(
        [(w, 1) for w in [*train_vocab, *unseen]], "w STRING, freq BIGINT"
    )
    got = {
        r.w: (r.n_tokens, r.tokens)
        for r in bpe_apply_merges(apply_words, merges).collect()
    }
    ref = _bpe_apply_reference([*train_vocab, *unseen], merges)
    assert got == {
        w: (len(syms), " ".join(syms)) for w, syms in ref.items()
    }
