"""Property-based tests (hypothesis) for the analyzer/dedup primitives —
structural invariants that hold for ALL inputs, not just fixtures
(SURVEY §5.1: the reference has no property testing; §5.2 adds it).

Each property evaluates one small Spark job per example; examples are
capped so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tweets_elastic_spark.functions.analyzers import char_ngrams, shingles
from tweets_elastic_spark.functions.textstats import normalized_text
from tweets_elastic_spark.operators.dedup import word_shingles

# lowercase word tokens: what survives the tokenizers unchanged
WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
WORDS = st.lists(WORD, min_size=0, max_size=12)

PROP = settings(max_examples=12, deadline=None)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


@PROP
@given(words=WORDS)
def test_word_shingles_structure(spark, words):
    """Every k-shingle has exactly k words; distinct; count ≤ n-k+1; short
    texts collapse to one whole-text shingle."""
    text = " ".join(words)
    out = _eval(spark, word_shingles(F.lit(text), 3))
    n = len(words)
    if n == 0:
        assert out == []
    elif n < 3:
        assert out == [" ".join(words)]
    else:
        assert len(out) == len(set(out)) <= n - 2
        assert all(len(s.split(" ")) == 3 for s in out)
        # each shingle is a contiguous trigram of the source
        assert all(s in text for s in out)


@PROP
@given(words=st.lists(WORD, min_size=1, max_size=10))
def test_shingle_filter_emits_unigrams_plus_glued_bigrams(spark, words):
    """T10: output = n unigrams followed by n-1 glued bigrams, order-preserving."""
    arr = F.array(*[F.lit(w) for w in words])
    out = _eval(spark, shingles(arr))
    n = len(words)
    assert len(out) == 2 * n - 1
    assert out[:n] == words
    assert out[n:] == [words[i] + words[i + 1] for i in range(n - 1)]


@PROP
@given(token=WORD)
def test_char_ngrams_count_formula(spark, token):
    """T9: Σ_{i=1..L} min(max_gram, L-i+1) grams, position-major, all
    substrings of the token."""
    out = _eval(spark, char_ngrams(F.array(F.lit(token)), 1, 10))
    L = len(token)
    assert len(out) == sum(min(10, L - i + 1) for i in range(1, L + 1))
    assert all(g in token for g in out)
    # position-major: first L-or-10 entries are prefixes of the token
    assert out[0] == token[0]


@PROP
@given(
    words=st.lists(WORD, min_size=1, max_size=8),
    case_flips=st.lists(st.booleans(), min_size=1, max_size=8),
)
def test_normalized_text_whitespace_case_invariant(spark, words, case_flips):
    """The exact-dedup identity is invariant under whitespace runs and case
    — the property the fingerprint groupBy relies on — and idempotent."""
    base = " ".join(words)
    mangled = "  ".join(
        w.upper() if flip else w
        for w, flip in zip(words, case_flips * len(words))
    )
    a = _eval(spark, normalized_text(F.lit(base)))
    b = _eval(spark, normalized_text(F.lit(mangled)))
    assert a == b
    assert _eval(spark, normalized_text(F.lit(a))) == a
