"""Plain-Python reference agreement for WordPiece inference
(plans/retrieval.py::wordpiece_apply): greedy longest-match-first over
the unigram-trained inventory with position-split vocabularies
(word-initial vs '##'-continuation, the latter bounded by a corpus-
weighted min count) must match an independent Python implementation
exactly — including the [UNK] degradation when greedy strands a word at
an out-of-vocabulary continuation, the failure mode Viterbi avoids."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from odni_apache_beam_consumer_spark.plans.retrieval import (
    _UNI_MAX_PIECE,
    _UNI_MAX_WLEN,
    _WP_MIN_CONT,
    _wp_greedy_expr,
    unigram_train_rounds,
)
from tests.test_unigram_lm import VOCABS, py_unigram


def py_wordpiece_apply(
    vocab_words: dict[str, int],
    max_piece: int = _UNI_MAX_PIECE,
    max_wlen: int = _UNI_MAX_WLEN,
    min_cont: int = _WP_MIN_CONT,
) -> dict[str, tuple[int, str]]:
    """Reference: train the unigram inventory (py_unigram), split it by
    observed position (init = seen at word start; cont = corpus-weighted
    mid-word count >= min_cont), then greedy longest-match-first."""
    model = {p for p, _, _ in py_unigram(vocab_words)}
    words = {
        w: f for w, f in vocab_words.items() if 2 <= len(w) <= max_wlen
    }
    init: set[str] = set()
    cont_cnt: dict[str, int] = {}
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, min(max_piece, len(w) - i) + 1):
                p = w[i : i + k]
                if i == 0:
                    init.add(p)
                else:
                    cont_cnt[p] = cont_cnt.get(p, 0) + f
    init &= model
    cont = {p for p, c in cont_cnt.items() if c >= min_cont} & model
    out = {}
    for w in words:
        pos, ps, fail = 0, [], False
        while pos < len(w):
            hit = None
            for l in range(min(max_piece, len(w) - pos), 0, -1):
                piece = w[pos : pos + l]
                if piece in (init if pos == 0 else cont):
                    hit = piece
                    break
            if hit is None:
                fail = True
                break
            ps.append(hit if pos == 0 else "##" + hit)
            pos += len(hit)
        out[w] = (1, "[UNK]") if fail else (len(ps), " ".join(ps))
    return out


def spark_wordpiece(spark, vocab: dict[str, int]):
    """The wordpiece_apply query's pipeline over an explicit vocabulary
    (same code shape, parameterized input — the unigram apply test's
    pattern)."""
    words = spark.createDataFrame(
        [(w, f) for w, f in vocab.items()], "w STRING, freq BIGINT"
    )
    model = unigram_train_rounds(words)
    w8 = words.where(F.length("w").between(2, _UNI_MAX_WLEN))
    occ = w8.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(w)), i -> "
                f"transform(sequence(1, least({_UNI_MAX_PIECE}, "
                f"length(w) - i + 1)), "
                f"k -> struct(substring(w, i, k) AS piece, i AS i))))"
            )
        ).alias("s"),
    ).select(F.col("s.piece").alias("piece"), F.col("s.i").alias("i"), "freq")
    flags = occ.groupBy("piece").agg(
        F.max((F.col("i") == 1).cast("int")).alias("init_seen"),
        F.sum(F.when(F.col("i") > 1, F.col("freq")).otherwise(0)).alias(
            "cont_cnt"
        ),
    )
    maps = model.join(flags, "piece").agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("init_seen") == 1, F.struct("piece", F.lit(1)))
            )
        ).alias("mi"),
        F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("cont_cnt") >= _WP_MIN_CONT,
                    F.struct("piece", F.lit(1)),
                )
            )
        ).alias("mc"),
    )
    seg = w8.crossJoin(F.broadcast(maps)).withColumn(
        "st", F.expr(_wp_greedy_expr(_UNI_MAX_PIECE, _UNI_MAX_WLEN))
    )
    return {
        r.w: (r.n, r.p)
        for r in seg.select(
            "w",
            F.when(F.col("st.fail"), F.lit(1))
            .otherwise(F.size("st.ps"))
            .alias("n"),
            F.when(F.col("st.fail"), F.lit("[UNK]"))
            .otherwise(F.array_join("st.ps", " "))
            .alias("p"),
        ).collect()
    }


@pytest.mark.parametrize("vocab", VOCABS)
def test_wordpiece_matches_python_reference(spark, vocab):
    assert spark_wordpiece(spark, vocab) == py_wordpiece_apply(vocab)


def test_wordpiece_unk_path(spark):
    """A word longer than max_piece whose tail char never recurs
    mid-word strands greedy at an out-of-vocabulary continuation: 'z'
    has corpus-weighted cont count 1 < _WP_MIN_CONT, so 'qqqqz' must
    degrade to [UNK] — and the reference must agree."""
    vocab = {"qqqqz": 1, "qqqq": 50, "qqa": 10}
    want = py_wordpiece_apply(vocab)
    assert want["qqqqz"] == (1, "[UNK]")  # the scenario is non-vacuous
    assert want["qqqq"][1] == "qqqq"  # and not everything degrades
    assert spark_wordpiece(spark, vocab) == want


def test_wordpiece_greedy_is_longest_match_first(spark):
    """Greedy must take the LONGEST match at each position even when a
    shorter split would also work: with 'abab' and 'ab' both in vocab,
    'ababab' (len 6 > max_piece 4) segments as 'abab ##ab', never
    'ab ##ab ##ab'."""
    vocab = {"ababab": 20, "abab": 60, "ab": 90, "ba": 40}
    got = spark_wordpiece(spark, vocab)
    want = py_wordpiece_apply(vocab)
    assert got == want
    assert got["ababab"] == (2, "abab ##ab")


def test_fertility_audit_shape_and_bounds(spark, sf_dir):
    """The fertility audit must compare both strategies over the SAME
    word set (counts identical), report divergence > 0 on the fixture
    corpus (the strategies really differ), and on THIS corpus Viterbi's
    weighted token count lower-bounds greedy's (an empirical fixture
    property, not a theorem — Viterbi minimizes cost, not count; the
    assertion documents the observed relationship, ties allowed)."""
    from odni_apache_beam_consumer_spark.plans.registry import all_queries

    rows = {
        r.family: r
        for r in all_queries()["tokenizer_fertility_audit"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"unigram_viterbi", "wordpiece_greedy"}
    u, g = rows["unigram_viterbi"], rows["wordpiece_greedy"]
    assert u.n_words == g.n_words
    assert u.n_occurrences == g.n_occurrences
    assert u.weighted_chars == g.weighted_chars
    assert u.n_diverging_words == g.n_diverging_words > 0
    assert u.weighted_tokens <= g.weighted_tokens
    assert u.n_unk_words == 0
