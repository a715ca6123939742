"""Hard-negative mining: label exclusion is absolute, per-anchor ranking
is the exact within-list different-label top-k (deterministic — the IVF
list restriction is the approximation, the in-list computation is not),
and recall vs the global exact top-k clears a floor on the synthetic
embeddings."""

from __future__ import annotations

import math

from pasardassist_spark.operators.similarity import (
    ivf_assignments,
    mine_hard_negatives,
)
from pasardassist_spark.tables import load

K = 5


def test_hard_negatives_exact_within_list(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    asg, _ = ivf_assignments(emb)
    out = mine_hard_negatives(emb, k=K, assignments=asg).collect()

    data = {
        r.vec_id: (list(r.embedding), r.label) for r in emb.collect()
    }
    lists = {r.vec_id: r.list_id for r in asg.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    got: dict[int, list] = {}
    for r in out:
        # absolute invariants: opposite label, same IVF list, correct labels
        assert r.anchor_label != r.neg_label
        assert lists[r.anchor_id] == lists[r.neg_id]
        assert data[r.anchor_id][1] == r.anchor_label
        assert data[r.neg_id][1] == r.neg_label
        got.setdefault(r.anchor_id, []).append(r)

    hit = tot = 0
    for aid, rows in got.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        # non-increasing cosine along the ranking
        assert all(
            rows[i].cosine >= rows[i + 1].cosine for i in range(len(rows) - 1)
        )
        va, la = data[aid]
        in_list = [
            (round(cos(va, v), 6), i)
            for i, (v, l) in data.items()
            if l != la and lists[i] == lists[aid]
        ]
        exact = sorted(in_list, key=lambda t: (-t[0], t[1]))[:K]
        # the within-list top-k is EXACT: same ids in the same order
        assert [(r.cosine, r.neg_id) for r in rows] == exact, aid

        all_neg = sorted(
            ((round(cos(va, v), 6), i) for i, (v, l) in data.items() if l != la),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        hit += len({i for _, i in all_neg} & {r.neg_id for r in rows})
        tot += K

    # every anchor with an opposite-label list-mate must be mined
    for aid, (v, la) in data.items():
        has_mate = any(
            l != la and lists[i] == lists[aid]
            for i, (_, l) in data.items()
            if i != aid
        )
        assert (aid in got) == has_mate
    # list-restricted recall floor vs the global exact top-k (measured 0.25
    # at sf0.01 with 1/16 lists on the near-uniform synthetic embeddings;
    # real clustered embeddings sit far higher — the operator docstring's
    # probe knob is the lever)
    assert hit / tot >= 0.12, hit / tot
