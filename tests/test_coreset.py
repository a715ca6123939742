"""k-center greedy coreset (operators/coreset.py): Gonzalez guarantees
pinned against brute force, plus a distributed-vs-sequential differential."""

from __future__ import annotations

import math
from itertools import combinations

import pytest

from pasardassist_spark.operators.coreset import kcenter_greedy


def _dist(a, b):
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


def _seq_greedy(points, k):
    """Independent sequential reference (ids = dict keys)."""
    ids = sorted(points)
    chosen = [ids[0]]
    radii = [0.0]
    mind = {i: float("inf") for i in ids}
    while len(chosen) < k:
        c = points[chosen[-1]]
        for i in ids:
            mind[i] = min(mind[i], _dist(points[i], c))
        far = max(ids, key=lambda i: (mind[i], -i))
        chosen.append(far)
        radii.append(mind[far])
    return chosen, radii


def _coverage_radius(points, centers):
    return max(
        min(_dist(p, points[c]) for c in centers) for p in points.values()
    )


@pytest.fixture(scope="module")
def clusters():
    """4 tight, well-separated clusters of 5 points in 2-D."""
    anchors = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0)]
    pts = {}
    i = 0
    for cx, cy in anchors:
        for dx in range(5):
            pts[i] = [cx + dx * 0.5, cy + (dx % 2) * 0.5]
            i += 1
    return pts


def _to_df(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(pts.items())],
        schema="vec_id LONG, embedding ARRAY<DOUBLE>",
    )


def test_distributed_equals_sequential(spark, clusters):
    got = kcenter_greedy(_to_df(spark, clusters), "embedding", "vec_id", 6)
    ids = [i for _, i, _ in got]
    radii = [r for _, _, r in got]
    ref_ids, ref_radii = _seq_greedy(clusters, 6)
    assert ids == ref_ids
    for a, b in zip(radii, ref_radii):
        assert a == pytest.approx(b, rel=1e-9, abs=1e-9)


def test_one_center_per_separated_cluster(spark, clusters):
    got = kcenter_greedy(_to_df(spark, clusters), "embedding", "vec_id", 4)
    picked_clusters = {i // 5 for _, i, _ in got}
    assert picked_clusters == {0, 1, 2, 3}
    # with one center per tight cluster, coverage <= the cluster diameter
    assert _coverage_radius(clusters, [i for _, i, _ in got]) <= 2.5


def test_radii_non_increasing(spark, clusters):
    got = kcenter_greedy(_to_df(spark, clusters), "embedding", "vec_id", 8)
    radii = [r for _, _, r in got[1:]]  # seed has no radius
    for a, b in zip(radii, radii[1:]):
        assert b <= a + 1e-9


def test_two_approximation_vs_bruteforce_optimum(spark):
    """Gonzalez: greedy coverage radius <= 2x the optimal discrete
    k-center radius; checked against exhaustive center enumeration."""
    pts = {
        i: [float(x), float(y)]
        for i, (x, y) in enumerate(
            [(0, 0), (1, 0), (0, 1), (9, 9), (10, 9), (9, 10),
             (0, 9), (1, 10), (5, 5), (6, 4), (4, 6), (10, 0)]
        )
    }
    k = 3
    got = kcenter_greedy(_to_df(spark, pts), "embedding", "vec_id", k)
    greedy_r = _coverage_radius(pts, [i for _, i, _ in got])
    opt_r = min(
        _coverage_radius(pts, c) for c in combinations(sorted(pts), k)
    )
    assert greedy_r <= 2 * opt_r + 1e-9


def test_k_exceeding_distinct_points_stops_without_duplicates(spark):
    pts = {0: [0.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 1.0], 3: [0.0, 1.0]}
    got = kcenter_greedy(_to_df(spark, pts), "embedding", "vec_id", 10)
    ids = [i for _, i, _ in got]
    assert len(ids) == len(set(ids))
    assert len(ids) == 3  # 3 distinct vectors -> 3 centers, then stop


def test_empty_input_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kcenter_greedy(
            spark.createDataFrame(
                [], schema="vec_id LONG, embedding ARRAY<DOUBLE>"
            ),
            "embedding",
            "vec_id",
            3,
        )
