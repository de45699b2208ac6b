"""Property tests: BPE merge fold and Misra–Gries vs pure-Python references.

Spark-per-example is slow, so the Spark-backed properties run few
examples; the pure-Python MG reference property runs wide.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from console_datagen_spark.operators.heavy_hitters import _mg_update

WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12
)


def _ref_bpe(words: list[str], rounds: int) -> list[tuple]:
    """Reference BPE: dict arithmetic only, matching operators/bpe.py
    semantics (freq-weighted adjacent pair counts over distinct words,
    argmax with (cnt desc, left, right) tie-break, leftmost
    non-overlapping greedy merge)."""
    freqs = Counter(words)
    state = {w: [ch for ch in w] for w in freqs}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), cnt = best
        merges.append((rnd, l, r, cnt))
        for w, syms in state.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


@settings(max_examples=8, deadline=None)
@given(WORDS)
def test_bpe_train_matches_reference(spark, words):
    from console_datagen_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    # each "document" is a single word: word_freqs then counts word
    # multiplicity exactly like the reference Counter
    assert bpe_train(docs, rounds=2) == _ref_bpe(words, 2)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=4),
)
def test_mg_update_guarantees(stream, k):
    counters: dict = {}
    for ch in stream:
        _mg_update(counters, ch, 1, k)
    assert len(counters) <= k
    true = Counter(stream)
    n = len(stream)
    for key, cnt in true.items():
        est = counters.get(key, 0)
        assert est <= cnt
        assert cnt - est <= n // (k + 1)
    for key, cnt in true.items():
        if cnt > n // (k + 1):
            assert key in counters
