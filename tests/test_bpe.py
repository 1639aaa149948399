"""BPE train/segment (operators/bpe.py) vs a pure-Python reference
implementation of the published algorithm (Sennrich et al. 2016) —
the no-oracle parity pattern (iterative argmax per round is not
SQL-expressible; same evidence class as the streaming parity suites).
"""

from __future__ import annotations

from collections import Counter

import pytest

END = "</w>"


# --- pure-Python reference (published algorithm, greedy-leftmost) ----

def _py_word_syms(word):
    chars = list(word)
    chars[-1] = chars[-1] + END
    return tuple(chars)


def _py_merge(syms, pair):
    a, b = pair
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return tuple(out)


def _py_bpe_train(texts, num_merges, min_pair_count=2):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[_py_word_syms(w)] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties lexicographic on (a, b) — the engine's rule
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        vocab = Counter(
            {_py_merge(s, best): c for s, c in vocab.items()}
        )
    return merges, vocab


def _py_segment(text, merges):
    toks = []
    for w in text.split():
        if not w:
            continue
        syms = _py_word_syms(w)
        for m in merges:
            syms = _py_merge(syms, m)
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide new low",
    "the newest widest lowest the the",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_train_matches_reference(spark, corpus):
    from batch_processing_analysis_spark.operators.bpe import bpe_train

    merges, words = bpe_train(corpus, num_merges=12)
    ref_merges, ref_vocab = _py_bpe_train(TEXTS, 12)
    assert merges == ref_merges
    got_vocab = {
        tuple(r["syms"]): r["wcount"] for r in words.collect()
    }
    assert got_vocab == dict(ref_vocab)


def test_bpe_segment_matches_reference_and_train_state(spark, corpus):
    from batch_processing_analysis_spark.operators.bpe import (
        bpe_segment, bpe_train,
    )

    merges, _ = bpe_train(corpus, num_merges=12)
    got = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_segment(corpus, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        ref = _py_segment(t, merges)
        assert got[i][0] == ref, i
        assert got[i][1] == len(ref)


def test_bpe_merge_fold_overlap_semantics(spark):
    # "aaaa" with merge (a,a) -> greedy leftmost non-overlapping: aa aa
    from batch_processing_analysis_spark.operators.bpe import bpe_segment

    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    row = bpe_segment(docs, [("a", "a")]).collect()[0]
    # last char carries </w>, so only the first pair fuses: aa a a</w>
    assert list(row["bpe_tokens"]) == ["aa", "a", "a" + END]


def test_bpe_empty_and_no_merges(spark):
    from batch_processing_analysis_spark.operators.bpe import (
        bpe_segment, bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "")], "doc_id long, text string"
    )
    merges, _ = bpe_train(docs, num_merges=5)  # nothing repeats enough
    assert merges == []
    got = {r["doc_id"]: list(r["bpe_tokens"])
           for r in bpe_segment(docs, merges).collect()}
    assert got[1] == ["x" + END, "y" + END]
    assert got[2] == []
