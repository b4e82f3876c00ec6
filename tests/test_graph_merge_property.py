"""Property test for the streaming graph-insert displacement merge
(q257/q264/q265's order-independence theorem).

Pure twin of the per-cell merge: each batch node takes its top-m over
everything present; each prior new node merges its stored (d, dst)
list with its distances to the batch and keeps the top-m. The claim —
top-m(top-m(S₁) ∪ S₂) = top-m(S₁ ∪ S₂) under the total (d, dst) order
— makes the drained lists equal the one-shot insert for ANY batch
partition and order. Hypothesis searches small integer point sets
(tiny coordinate ranges force heavy distance ties, the regime where a
sloppy tie-break would diverge) across random partitions.
"""

from hypothesis import given, settings
from hypothesis import strategies as st


def _d2(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


def _topm(cands, m):
    """cands: iterable of (d, dst) — total order, dedup by dst keeps
    the best d (distances are deterministic, so duplicates agree)."""
    best = {}
    for d, dst in cands:
        if dst not in best or (d, dst) < (best[dst], dst):
            best[dst] = d
    return sorted(((d, i) for i, d in best.items()))[:m]


def one_shot(hist, new, m):
    """Every new node's top-m over (hist ∪ new) minus self."""
    allpts = {**hist, **new}
    return {
        nid: _topm(
            ((_d2(p, q), oid) for oid, q in allpts.items() if oid != nid), m
        )
        for nid, p in new.items()
    }


def fold(hist, batches, m):
    """The streaming displacement merge over the given batch sequence."""
    lists: dict = {}
    present = dict(hist)
    for batch in batches:
        # forward: batch nodes vs everything present (incl. own batch)
        scope = {**present, **batch}
        for nid, p in batch.items():
            lists[nid] = _topm(
                ((_d2(p, q), oid) for oid, q in scope.items() if oid != nid),
                m,
            )
        # backward: prior NEW nodes merge stored lists with batch dists
        for pid in [k for k in lists if k not in batch]:
            pp = next(
                v for k, v in present.items() if k == pid
            )
            cand = list(lists[pid]) + [
                (_d2(pp, q), bid) for bid, q in batch.items()
            ]
            lists[pid] = _topm(cand, m)
        present.update(batch)
    return lists


points_st = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 4)),
    min_size=0,
    max_size=18,
)
seed_st = st.integers(min_value=0, max_value=2**31 - 1)


def _make(points, seed, n_batches):
    rnd = __import__("random").Random(seed)
    hist, new = {}, {}
    for i, p in enumerate(points):
        (hist if rnd.random() < 0.5 else new)[i] = p
    batches = [{} for _ in range(n_batches)]
    for nid, p in new.items():
        batches[rnd.randrange(n_batches)][nid] = p
    return hist, new, batches


@settings(max_examples=300, deadline=None)
@given(points=points_st, seed=seed_st,
       m=st.integers(min_value=1, max_value=4),
       n_batches=st.integers(min_value=1, max_value=5))
def test_fold_equals_one_shot_for_any_partition(points, seed, m, n_batches):
    hist, new, batches = _make(points, seed, n_batches)
    assert fold(hist, batches, m) == one_shot(hist, new, m)


@settings(max_examples=150, deadline=None)
@given(points=points_st, seed=seed_st, m=st.integers(min_value=1, max_value=3))
def test_fold_is_order_independent(points, seed, m):
    hist, new, batches = _make(points, seed, 4)
    assert (
        fold(hist, batches, m)
        == fold(hist, list(reversed(batches)), m)
        == one_shot(hist, new, m)
    )


def test_naive_insert_is_order_dependent():
    # The motivating counterexample: without the backward pass, an
    # early arrival never sees a closer later arrival. A at (0,0)
    # arrives in batch 1 with only far H at (4,4) present; B at (0,1)
    # arrives in batch 2. One-shot gives A → [B, H] at m=2's truth for
    # m=1: A → B; the naive fold leaves A → H.
    hist = {100: (4, 4)}
    A, B = 1, 2
    batches = [{A: (0, 0)}, {B: (0, 1)}]

    def naive(hist, batches, m):
        lists, present = {}, dict(hist)
        for batch in batches:
            scope = {**present, **batch}
            for nid, p in batch.items():
                lists[nid] = _topm(
                    ((_d2(p, q), o) for o, q in scope.items() if o != nid), m
                )
            present.update(batch)
        return lists

    truth = one_shot(hist, {A: (0, 0), B: (0, 1)}, 1)
    assert truth[A][0][1] == B
    assert naive(hist, batches, 1)[A][0][1] == 100  # the order bug
    assert fold(hist, batches, 1)[A][0][1] == B  # the merge repairs it
