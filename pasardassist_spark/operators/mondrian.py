"""Mondrian multidimensional k-anonymization (LeFevre, DeWitt,
Ramakrishnan, "Mondrian Multidimensional K-Anonymity", ICDE 2006 —
public literature): the CONSTRUCTIVE half of the privacy shelf. The
audit operators (operators/privacy.py) say whether a release is
k-anonymous; Mondrian makes it so, by recursively median-splitting the
numeric quasi-identifier space until no partition can split without
dropping below k, then generalizing each row's QI values to its leaf
partition's ranges.

Variants implemented: RELAXED single-dimension Mondrian (default) —
each round a partition attempts one cut on its widest (globally
normalized) QI dimension at the partition median, ties going left
(<= median); if either side would fall below k the partition becomes a
LEAF. STRICT (``strict=True``) — a failed widest-dimension cut falls
back to the next-widest dimension whose median cut leaves both sides
>= k; only a partition where EVERY dimension's cut fails becomes a
leaf (the paper's allowable-cut loop). On tie-pathological data the
strict form keeps splitting where relaxed stops, yielding finer
classes (better utility) for one extra conditional-count per dimension
in the same per-round side-count aggregate — the round count and
shuffle count per round are unchanged.

Distributed shape — the k-means/connected-components house pattern:
a driver loop of at most ~log2(N/k) + slack ROUNDS, each round two hash
shuffles (per-partition stats; tentative side counts), no window over
data, no driver collect of data (the loop's only action is a 1-row
"any valid cut?" aggregate). Partition medians use percentile_approx
(exact whenever a partition's distinct-value count is below the
accuracy parameter, which holds long before a partition is leaf-sized);
an approximate split point never breaks the k guarantee — side counts
are checked exactly before a cut commits. Labels are binary-heap style
(child = 2*label + side), so the tree structure is recoverable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

PCTL_ACCURACY = 10_000
MAX_ROUNDS = 64  # >= log2(rows/k) for any conceivable frame; loop exits early


def _internal_names(qi: Sequence[str]) -> set[str]:
    """Every internal/output column name the operator generates — inputs
    carrying any of these would silently corrupt labels or shadow a user
    column, so mondrian_anonymize raises on intersection up front (the
    packing operators' _INTERNAL contract)."""
    fixed = {"_lbl", "_done", "_dim", "_cut", "_side", "_valid", "_n", "_m",
             "_sn", "class_id", "class_size"}
    per_dim = {
        f"{p}{c}" for c in qi
        for p in ("_lo_", "_hi_", "_med_", "_glo_", "_ghi_", "_r_", "_w_")
    }
    out = {f"{c}_{s}" for c in qi for s in ("lo", "hi")}
    return fixed | per_dim | out


def mondrian_anonymize(
    df: DataFrame, qi: Sequence[str], k: int, strict: bool = False
) -> DataFrame:
    """Return ``df``'s rows with their QI columns GENERALIZED to the
    Mondrian leaf ranges: for each numeric QI column ``c``, output
    columns ``{c}_lo`` / ``{c}_hi`` (the leaf's min/max) replace the
    exact value, plus ``class_id`` (heap label) and ``class_size``.
    Every class is >= k by construction (checked exactly per cut).

    ``strict=True`` enables the allowable-cut fallback: a partition
    whose widest-dimension cut fails the exact side check retries the
    remaining dimensions in width order within the SAME round (one
    conditional side-count per dimension in the same aggregate), and
    only becomes a leaf when every dimension's median cut fails.

    ``qi`` columns must be numeric and non-null (nulls don't order
    against a median; band/categorize upstream — the same contract as
    the audit shelf's sensitive column, enforced loudly)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qi = list(qi)
    clash = set(df.columns) & _internal_names(qi)
    if clash:
        raise ValueError(
            "mondrian_anonymize: input columns collide with internal/"
            f"output names: {sorted(clash)} — rename them upstream"
        )
    guard = None
    for c in qi:
        n = F.col(c)
        bad = n.isNull() | F.isnan(n.cast("double"))
        guard = bad if guard is None else (guard | bad)
    dt_by_col = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    active = df.withColumn(
        "_lbl",
        F.when(
            guard,
            F.raise_error(F.lit(
                "mondrian_anonymize: a QI column is null/NaN on some row "
                "— null does not order against a median split; "
                "band/categorize nulls upstream"
            )).cast("long"),
        ).otherwise(F.lit(1).cast("long")),
    )
    done_parts: list[DataFrame] = []

    # global ranges normalize the widest-dimension choice (paper §4);
    # one metadata aggregate over the input — which also adjudicates the
    # degenerate inputs EAGERLY (r17 review): an empty frame returns the
    # empty release, an all-null QI column raises the contract error here
    # instead of a bare TypeError at float(None)
    g = df.agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[
            f for c in qi
            for f in (F.min(F.col(c).cast("double")).alias(f"_glo_{c}"),
                      F.max(F.col(c).cast("double")).alias(f"_ghi_{c}"))
        ],
    ).first()
    keep_cols = [c for c in df.columns if c not in set(qi)]
    if g["_cnt"] == 0:
        out_schema = keep_cols + [
            f"{c}_{s}" for c in qi for s in ("lo", "hi")
        ] + ["class_id", "class_size"]
        empty = df
        for c in qi:
            empty = empty.withColumnRenamed(c, f"{c}_lo").withColumn(
                f"{c}_hi", F.col(f"{c}_lo")
            )
        return (
            empty.withColumn("class_id", F.lit(1).cast("long"))
            .withColumn("class_size", F.lit(0).cast("long"))
            .select(*out_schema)
            .limit(0)
        )
    if g["_cnt"] < k:
        # 0 < N < k: the root partition can never split AND can never
        # satisfy k — k-anonymity is unattainable without suppressing the
        # whole frame, so fail loudly instead of emitting a class of
        # size N < k under a docstring that promises >= k (r17 ADVICE).
        raise ValueError(
            f"mondrian_anonymize: input has {g['_cnt']} rows < k={k} — "
            "k-anonymity is unattainable (suppress or lower k upstream)"
        )
    for c in qi:
        if g[f"_glo_{c}"] is None:
            raise ValueError(
                f"mondrian_anonymize: QI column '{c}' is null on every "
                "row — null does not order against a median split; "
                "band/categorize nulls upstream"
            )
    gspan = {
        c: max(float(g[f"_ghi_{c}"]) - float(g[f"_glo_{c}"]), 1e-300)
        for c in qi
    }

    for _ in range(MAX_ROUNDS):
        # per-partition stats: count, min/max and median per dimension
        stats = active.groupBy("_lbl").agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                f for c in qi for f in (
                    F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
                    F.percentile_approx(
                        F.col(c).cast("double"), 0.5, PCTL_ACCURACY
                    ).alias(f"_med_{c}"),
                )
            ],
        )
        # normalized widths rank the candidate dimensions (paper §4); a
        # partition under 2k can never produce two >= k sides
        width = {
            c: ((F.col(f"_hi_{c}") - F.col(f"_lo_{c}")) / F.lit(gspan[c]))
            for c in qi
        }
        if not strict:
            # RELAXED: plan only the widest dimension's cut, count its
            # sides exactly, gate validity — a failed cut leafs the
            # partition this round.
            width_structs = [
                F.struct(width[c].alias("w"), F.lit(c).alias("dim"))
                for c in qi
            ]
            # greatest() needs >= 2 args; 1-D has only one candidate
            width_struct = (
                F.greatest(*width_structs)
                if len(qi) > 1 else width_structs[0]
            )
            plan = stats.select(
                "_lbl",
                F.when(
                    F.col("_n") >= 2 * k, width_struct["dim"]
                ).alias("_dim"),
                *[F.col(f"_med_{c}") for c in qi],
            ).filter(F.col("_dim").isNotNull())
            cut_val = None
            for c in qi:
                v = F.when(F.col("_dim") == c, F.col(f"_med_{c}"))
                cut_val = v if cut_val is None else F.coalesce(cut_val, v)
            plan = plan.select("_lbl", "_dim", cut_val.alias("_cut"))

            # tentative sides (ties left), exact side counts, validity.
            # Validity is ONE aggregate on _lbl: with _side in {0, 1},
            # right = sum, left = n - sum, and (right >= k AND
            # left >= k) is exactly the old two-stage "2 sides present
            # AND min side >= k" gate for k >= 1 — one shuffle per round
            # instead of two (r19, guide §2.4). Join strategy for the
            # per-label plan frames stays with the planner: they are
            # O(active partitions) rows, which grows to N/2k at the
            # deepest level — AQE broadcasts them while they are small
            # without capping the scale story the way a hint would.
            tent = active.join(plan, "_lbl", "left")
            side_expr = None
            for c in qi:
                s = F.when(
                    F.col("_dim") == c,
                    (F.col(c).cast("double") > F.col("_cut")).cast("int"),
                )
                side_expr = (
                    s if side_expr is None else F.coalesce(side_expr, s)
                )
            tent = tent.withColumn("_side", side_expr)
            # _dim/_cut are per-label constants (joined from plan), so
            # first() re-emits them from the same aggregate — no second
            # join back to plan, whose stats subtree would re-evaluate
            # (Catalyst does not reuse an aggregate across two consumers).
            plan2 = (
                tent.filter(F.col("_side").isNotNull())
                .groupBy("_lbl")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("_side").alias("_r"),
                    F.first("_dim").alias("_dim"),
                    F.first("_cut").alias("_cut"),
                )
                .filter(
                    (F.col("_r") >= k) & (F.col("_n") - F.col("_r") >= k)
                )
                .select("_lbl", "_dim", "_cut")
            )
        else:
            # STRICT: carry every dimension's median onto the rows once,
            # count every dimension's right side EXACTLY in one
            # aggregate, and commit the widest dimension whose cut
            # leaves both sides >= k — a partition leafs only when all
            # dimensions fail (LeFevre 2006's allowable-cut loop). Same
            # two row-sized shuffles per round as the relaxed path.
            meds = stats.filter(F.col("_n") >= 2 * k).select(
                "_lbl",
                *[F.col(f"_med_{c}") for c in qi],
                *[width[c].alias(f"_w_{c}") for c in qi],
            )
            tent = active.join(meds, "_lbl")
            counts = tent.groupBy("_lbl").agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(
                        (F.col(c).cast("double") > F.col(f"_med_{c}"))
                        .cast("long")
                    ).alias(f"_r_{c}")
                    for c in qi
                ],
                *[F.first(f"_med_{c}").alias(f"_med_{c}") for c in qi],
                *[F.first(f"_w_{c}").alias(f"_w_{c}") for c in qi],
            )
            # greatest() ignores NULL candidates: invalid dims drop out,
            # all-invalid partitions plan no cut and leaf below
            cand = [
                F.when(
                    (F.col(f"_r_{c}") >= k)
                    & (F.col("_n") - F.col(f"_r_{c}") >= k),
                    F.struct(
                        F.col(f"_w_{c}").alias("w"),
                        F.lit(c).alias("dim"),
                        F.col(f"_med_{c}").alias("cut"),
                    ),
                )
                for c in qi
            ]
            chosen = F.greatest(*cand) if len(qi) > 1 else cand[0]
            plan2 = counts.select(
                "_lbl",
                chosen["dim"].alias("_dim"),
                chosen["cut"].alias("_cut"),
            ).filter(F.col("_dim").isNotNull())

        # apply the committed cuts; everything un-planned is a leaf
        stepped_src = active.join(plan2, "_lbl", "left")
        side_expr = None
        for c in qi:
            s = F.when(
                F.col("_dim") == c,
                (F.col(c).cast("double") > F.col("_cut")).cast("int"),
            )
            side_expr = s if side_expr is None else F.coalesce(side_expr, s)
        stepped = stepped_src.select(
            *df.columns,
            F.when(
                F.col("_dim").isNotNull(),
                F.col("_lbl") * 2 + side_expr,
            ).otherwise(F.col("_lbl")).alias("_lbl"),
            # a partition that committed no cut (none planned, or — in
            # relaxed form — its one cut failed the exact side check)
            # can never split again -> leaf
            F.col("_dim").isNull().alias("_done"),
        )
        # ONE localCheckpoint(eager) per round cuts the iterative lineage
        # (the first cut hit the JVM's 1 GB plan-string ceiling without
        # it — the components.py round discipline) and materializes only
        # THIS round's rows. Finished leaves split off here and are never
        # rewritten in later rounds (r17 review: the union-everything form
        # re-checkpointed every done row once per remaining round —
        # O(N x rounds) write I/O; this form writes each row's finishing
        # state once, at the cost of each round's checkpoint blocks
        # staying referenced by its done slice until the job ends).
        stepped = stepped.localCheckpoint(eager=True)
        done_parts.append(stepped.filter(F.col("_done")).drop("_done"))
        active = stepped.filter(~F.col("_done")).drop("_done")
        # the loop's ONLY driver action: one scalar over checkpointed
        # blocks per round
        if active.count() == 0:
            break
    else:
        raise RuntimeError(
            f"mondrian_anonymize: no fixpoint after {MAX_ROUNDS} rounds "
            "(rows/k implies a deeper tree than any real frame produces)"
        )

    work = done_parts[0]
    for part in done_parts[1:]:
        work = work.unionByName(part)
    # leaf generalization: replace each QI value with its class range
    leaves = work.groupBy("_lbl").agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        *[
            f for c in qi for f in (
                F.min(c).alias(f"{c}_lo"),
                F.max(c).alias(f"{c}_hi"),
            )
        ],
    )
    out = work.join(leaves, "_lbl").select(
        *keep_cols,
        *[F.col(f"{c}_{s}").cast(dt_by_col[c]) for c in qi for s in ("lo", "hi")],
        F.col("_lbl").cast("long").alias("class_id"),
        F.col("class_size"),
    )
    return out
