"""Plan pins for the r14 VERDICT anti-pattern fix: fact-derived degree
frames must NOT carry a forced broadcast hint.

`graph_link_prediction` and `graph_assortativity` join O(|vertices|)
degree aggregates back onto their pair/edge frames. The vertex set is
the part/supplier key space — sf-proportional — so a forced
``F.broadcast`` hint would not degrade at 100x, it would FAIL the job
(8 GB broadcast cap / driver OOM). The contract pinned here:

1. the logical plan contains no broadcast hint on the degree join
   (when broadcast is globally disabled the join DEGRADES to a
   shuffled sort-merge join instead of staying broadcast — a forced
   hint survives the threshold, so this distinguishes hint from AQE);
2. under default confs on test-scale data the degree join still
   broadcasts (via planner stats/AQE), i.e. dropping the hint costs
   nothing while the frame is small.

Same pin for the other unbounded fact-derived frames the r15 sweep
de-hinted (vocab/count tables in the text-LM family, market-basket
frequent items, naive-Bayes model counts).
"""

from __future__ import annotations

import pytest

from pasardassist_spark.plans import plan
from pasardassist_spark.plans.runtime_filters import _scoped_confs
from pasardassist_spark.queries.registry import REGISTRY, _load_all

_load_all()

_NO_BROADCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

# Queries whose only equi-joins are on unbounded fact-derived frames:
# with broadcast disabled, NO BroadcastHashJoin may remain (a forced
# hint would keep one).
_DEGRADES_FULLY = [
    "graph_link_prediction",
    "graph_assortativity",
    "text_unigram_logprob",
    "text_tfidf_keywords",
    "mb_pair_lift",
]


@pytest.mark.parametrize("name", _DEGRADES_FULLY)
def test_degree_join_degrades_to_shuffle_without_hint(spark, sf_dir, name):
    with _scoped_confs(spark, _NO_BROADCAST):
        p = plan(REGISTRY[name].fn(spark, sf_dir))
    # BroadcastNestedLoopJoin feeding 1-row scalar frames is fine (it
    # has no key-space to outgrow); what must be gone is the hash join
    # of the degree/vocab frame.
    assert "BroadcastHashJoin" not in p, (
        f"{name}: a BroadcastHashJoin survived autoBroadcastJoinThreshold=-1 "
        "- that is the signature of a forced broadcast hint on a "
        "fact-derived frame"
    )
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, (
        f"{name}: expected the de-hinted join to degrade to a shuffled join"
    )


@pytest.mark.parametrize("name", ["graph_link_prediction", "graph_assortativity"])
def test_degree_join_still_broadcasts_when_small(spark, sf_dir, name):
    # Default confs, sf0.001-scale degree frame: the planner (static
    # stats or AQE) should still pick a broadcast for the degree join —
    # dropping the hint must not cost the small-scale plan. AQE-decided
    # broadcasts appear in the final adaptive plan, so execute first.
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, (
        f"{name}: degree join no longer broadcasts at test scale - AQE "
        "conversion regressed"
    )
