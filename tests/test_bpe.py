"""BPE tokenizer (operators/bpe.py): merges pinned against an
independently written reference trainer, encode semantics (rank-priority
merging), round-trip reconstruction, and compression monotonicity."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tweets_elastic_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    encode_word,
    train_bpe_from_freqs,
    word_freqs,
)


# -- independent reference implementation (deliberately different shape:
# list-of-lists vocab, full re-scan per step) --------------------------------

def _ref_train(word_freqs_: dict[str, int], n: int) -> list[tuple[str, str]]:
    vocab = [(list(w) + [END], f) for w, f in word_freqs_.items()]
    merges = []
    for _ in range(n):
        counts: Counter = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        top = max(counts.values())
        if top < 2:
            break
        pair = min(p for p, c in counts.items() if c == top)
        merges.append(pair)
        new_vocab = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, f))
        vocab = new_vocab
    return merges


def _ref_word_freqs(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                c[w] += 1
    return dict(c)


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_matches_reference_on_sennrich_example():
    got = train_bpe_from_freqs(list(SENNRICH.items()), 10)
    want = _ref_train(SENNRICH, 10)
    assert got == want
    # the famous first merges: 'es' (9), then 'est' (9), then 'est</w>' (9)
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    assert got[2] == ("est", END)


def test_train_is_deterministic_and_stops_when_dry():
    a = train_bpe_from_freqs(list(SENNRICH.items()), 500)
    b = train_bpe_from_freqs(list(SENNRICH.items()), 500)
    assert a == b
    assert len(a) < 500  # ran dry (no pair with freq >= 2) and stopped


def test_encode_word_uses_rank_priority_not_text_order():
    # ('b','c') learned BEFORE ('a','b'): "abc" merges bc first, so the
    # ('a','b') merge can never apply — rank priority, not text order
    assert encode_word("abc", {("b", "c"): 0, ("a", "b"): 1}) == \
        ["a", "bc", END]
    assert encode_word("abc", {("b", "c"): 0, ("a", "bc"): 1}) == ["abc", END]
    assert encode_word("abc", {("a", "b"): 0}) == ["ab", "c", END]
    assert encode_word("", {}) == [END]


def test_encode_matches_training_segmentation(spark):
    texts = ["the lowest low", "newest widest lower", "low low low newest"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, 30)
    assert merges == _ref_train(_ref_word_freqs(texts), 30)
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df, merges).collect()}
    # round-trip: concatenating a doc's tokens and splitting on </w>
    # reconstructs its word sequence
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        joined = "".join(out[i])
        assert joined.split(END)[:-1] == words


def test_more_merges_never_increase_token_count(spark):
    texts = ["she sells sea shells by the sea shore " * 3,
             "the quick brown fox jumps over the lazy dog"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    freqs = _ref_word_freqs(texts)
    prev = None
    for n in (0, 5, 15, 40):
        merges = train_bpe_from_freqs(list(freqs.items()), n)
        total = sum(
            len(r["bpe_tokens"])
            for r in bpe_encode(df, merges).collect()
        )
        if prev is not None:
            assert total <= prev
        prev = total


def test_word_freqs_aggregates_and_caps(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "B, a!")], "doc_id long, text string"
    )
    got = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    assert got == {"a": 3, "b": 2}
    # max_word_types caps the driver transfer but keeps the head
    merges = bpe_train(df, 5, max_word_types=1)
    assert merges == train_bpe_from_freqs([("a", 3)], 5)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ok ok")], "doc_id long, text string"
    )
    merges = bpe_train(df, 5)
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df, merges).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] and out[3][-1].endswith(END)
