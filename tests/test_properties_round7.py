"""Round-7 hardening property tests: the pure BPE kernels that back
`bpe_train` / `bpe_tokenize` (tsengine.operators.corpus).  These are
driver-side code paths, so hypothesis can hammer them directly without
a Spark session.

1. _bpe_apply_one is a greedy leftmost non-overlapping replacement:
   concatenation-preserving, length-monotone, idempotent-once-clean.
2. _bpe_encode preserves the word under concatenation for ANY merge
   list (the invariant that makes piece counts meaningful), and a
   word with no learned adjacency stays fully character-split.
3. Learned-merge closure: on any corpus, every merge's `merged` is
   the concat of its sides, ranks are dense, and pair_counts are
   non-increasing ONLY when no new-symbol pair outweighs an old one —
   so instead of asserting monotonicity (false for BPE in general) we
   assert each selected pair truly was a maximal-count pair at its
   rank, by replaying counts.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from tsengine.operators.corpus import _bpe_apply_one, _bpe_encode

_word = st.text(alphabet="abcd", min_size=0, max_size=12)
_sym = st.text(alphabet="abcd", min_size=1, max_size=2)


@given(w=_word, lft=_sym, rgt=_sym)
@settings(max_examples=300, deadline=None)
def test_apply_one_preserves_concatenation(w, lft, rgt):
    syms = tuple(w)
    out = _bpe_apply_one(syms, lft, rgt)
    assert "".join(out) == w
    assert len(out) <= len(syms)
    # non-overlap greedy: no (lft, rgt) adjacency survives in the
    # output EXCEPT where the right side was itself produced by this
    # merge (lft+rgt == rgt is impossible since lft is non-empty, but
    # a produced symbol can equal lft and re-pair with a later rgt —
    # that pair was not adjacent in the INPUT, so greedy leaves it)
    for a, b in zip(out, out[1:]):
        if a == lft and b == rgt:
            # must be explained by a produced left symbol boundary:
            # re-running the pass must still find it (fixpoint is NOT
            # part of the contract; single-pass greedy is)
            assert lft + rgt in (_bpe_apply_one(out, lft, rgt))
            break


@given(w=_word, merges=st.lists(st.tuples(_sym, _sym), max_size=8))
@settings(max_examples=300, deadline=None)
def test_encode_preserves_concatenation(w, merges):
    ml = [(i, l, r, l + r, 1) for i, (l, r) in enumerate(merges)]
    pieces = _bpe_encode(w, ml)
    assert "".join(pieces) == w
    if not merges or not w:
        assert list(pieces) == list(w)


def test_encode_unmergeable_word_stays_chars():
    ml = [(0, "x", "y", "xy", 1)]
    assert _bpe_encode("abc", ml) == ("a", "b", "c")


@given(
    words=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=150, deadline=None)
def test_learned_merges_are_maximal_at_their_rank(words):
    # replicate _learn_bpe's loop body on arbitrary word-freq tables
    # (no Spark needed) and check each selection was a max-count pair
    state = [(tuple(w), f) for w, f in sorted(words.items())]
    for rank in range(8):
        counts = Counter()
        for syms, freq in state:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq
        if not counts:
            break
        (lft, rgt), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert cnt == max(counts.values())
        # deterministic tie-break: lexicographically least among maxima
        assert (lft, rgt) == min(p for p, c in counts.items() if c == cnt)
        state = [(_bpe_apply_one(s, lft, rgt), f) for s, f in state]
        for syms, _ in state:
            assert all(x != "" for x in syms)
