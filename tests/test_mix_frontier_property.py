"""Property test for the streaming token-mix state theorem (q261).

The round-12 war story: the first shipped state model kept only the
selected rows, and a new doc sorting AFTER the rejection boundary lost
the rejected docs' token contributions to its running total — admitted
wrongly, order-dependently. The fix is the two-part state (selected
prefix + rejection frontier). This test encodes the corrected fold as a
pure-Python twin and hypothesis-checks it against the batch rule over
random corpora and random batch partitions — exactly the search that
would have caught the original bug (and does: reverting the twin to
selected-rows-only fails these cases immediately).

Sources are independent under the per-source window, so a single
source suffices.
"""

from hypothesis import given, settings
from hypothesis import strategies as st


def batch_select(docs, budget):
    """q226's rule: sort by (key, doc_id), greedy prefix with running
    total ≤ budget."""
    out, cum = set(), 0
    for k, i, t in sorted(docs):
        cum += t
        if cum <= budget:
            out.add((k, i, t))
    return out


def fold_select(batches, budget):
    """The streaming fold: state = (selected set, rejection frontier);
    per batch, new docs at-or-after the frontier are rejected outright,
    the rest merge with the selected state, the prefix is re-taken, and
    the frontier moves to the earliest over-budget candidate seen."""
    sel, fr = set(), None
    for batch in batches:
        new = [d for d in batch if fr is None or (d[0], d[1]) < fr]
        cum, ns, cand_fr = 0, set(), None
        for k, i, t in sorted(sel | set(new)):
            cum += t
            if cum <= budget:
                ns.add((k, i, t))
            elif cand_fr is None:
                cand_fr = (k, i)
        sel = ns
        if cand_fr is not None and (fr is None or cand_fr < fr):
            fr = cand_fr
    return sel


def broken_fold_select(batches, budget):
    """The round-12 bug, kept as a regression witness: selected-rows
    state WITHOUT the frontier."""
    sel = set()
    for batch in batches:
        cum, ns = 0, set()
        for k, i, t in sorted(sel | set(batch)):
            cum += t
            if cum <= budget:
                ns.add((k, i, t))
        sel = ns
    return sel


docs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # shuffle key (collides!)
        st.integers(min_value=0, max_value=10**6),  # doc id (tie-break)
        st.integers(min_value=0, max_value=40),  # token count (0 allowed)
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda d: d[1],
)
split_seed = st.integers(min_value=0, max_value=2**31 - 1)
budget_st = st.integers(min_value=0, max_value=120)


def _partition(docs, seed, n_batches):
    rnd = __import__("random").Random(seed)
    batches = [[] for _ in range(n_batches)]
    for d in docs:
        batches[rnd.randrange(n_batches)].append(d)
    return batches


@settings(max_examples=400, deadline=None)
@given(docs=docs_st, seed=split_seed, budget=budget_st,
       n_batches=st.integers(min_value=1, max_value=6))
def test_fold_equals_batch_for_any_partition(docs, seed, budget, n_batches):
    batches = _partition(docs, seed, n_batches)
    assert fold_select(batches, budget) == batch_select(docs, budget)


@settings(max_examples=200, deadline=None)
@given(docs=docs_st, seed=split_seed, budget=budget_st)
def test_fold_is_order_independent(docs, seed, budget):
    batches = _partition(docs, seed, 4)
    forward = fold_select(batches, budget)
    backward = fold_select(list(reversed(batches)), budget)
    assert forward == backward == batch_select(docs, budget)


def test_broken_fold_is_actually_broken():
    # The original bug's minimal witness: doc B (key 1, 60 tokens) is
    # rejected in batch 1 (budget 50 already spent by A at key 0);
    # doc C (key 2, 10 tokens) arrives in batch 2 — batch rule rejects
    # it (cum through B = 110 > 50... C's cum = 120), but the
    # frontier-less fold forgot B's 60 tokens and admits it.
    A, B, C = (0, 1, 50), (1, 2, 60), (2, 3, 10)
    batches = [[A, B], [C]]
    assert batch_select([A, B, C], 60) == {A}
    assert fold_select(batches, 60) == {A}
    assert broken_fold_select(batches, 60) == {A, C}  # the bug, witnessed
