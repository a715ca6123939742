"""Round-19 item 3 profiling: where does the sim_ivfpq build spend time?

    python tools/r19_ivfpq_profile.py

Times each build stage (the bench ANN section's exact sequence) plus the
driver-side internals of opq_rotation (sample collect vs numpy loop).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pasardassist_spark import get_spark
    from pasardassist_spark.operators import similarity as S
    from pasardassist_spark.queries.similarity import DIM, K, QUERY_IDS
    from pasardassist_spark.tables import load

    spark = get_spark("r19-ivfpq-profile")
    emb = load(spark, sf, "embeddings")
    emb.count()  # warm the scan

    t = time.perf_counter

    # opq_rotation internals
    import numpy as np
    from pyspark.sql import functions as F

    e = S._l2_normalize(
        emb.select(F.col("vec_id"), S.as_double(F.col("embedding")).alias("v"))
    )
    t0 = t()
    X = S._collect_training_matrix(e, "vec_id", "v")
    t1 = t()
    print(f"collect_training_matrix: {t1 - t0:.3f}s (n={X.shape})", flush=True)

    sub = DIM // S.PQ_M
    t0 = t()
    M = np.eye(DIM)
    for _ in range(S.OPQ_ITERS):
        Xr = X @ M
        books = [
            S._kmeans_numpy(Xr[:, s * sub : (s + 1) * sub], S.PQ_K, S.IVF_SEED + s)
            for s in range(S.PQ_M)
        ]
        Y = np.empty_like(Xr)
        for s in range(S.PQ_M):
            seg = Xr[:, s * sub : (s + 1) * sub]
            C = np.asarray(books[s])
            d = (seg * seg).sum(axis=1, keepdims=True) - 2.0 * seg @ C.T + (C * C).sum(axis=1)
            Y[:, s * sub : (s + 1) * sub] = C[d.argmin(axis=1)]
        U, _S2, Vt = np.linalg.svd(X.T @ Y)
        M = U @ Vt
    t1 = t()
    print(f"opq numpy loop ({S.OPQ_ITERS} iters): {t1 - t0:.3f}s", flush=True)

    # bench-sequence stages
    t0 = t()
    rot = S.opq_rotation(emb, DIM)
    print(f"opq_rotation total: {t() - t0:.3f}s", flush=True)
    t0 = t()
    books = S.pq_codebooks(emb, DIM, rotation=rot)
    print(f"pq_codebooks: {t() - t0:.3f}s", flush=True)
    t0 = t()
    asg, cent = S.ivf_assignments(emb)
    asg = asg.persist()
    asg.count()
    print(f"ivf_assignments+persist: {t() - t0:.3f}s", flush=True)
    t0 = t()
    codes = S.pq_encode(emb, books, rotation=rot).persist()
    codes.count()
    print(f"pq_encode+persist: {t() - t0:.3f}s", flush=True)
    t0 = t()
    n = S.ivfpq_topk(
        emb, QUERY_IDS, K, DIM,
        books=books, assignments=asg, centroids=cent, codes=codes,
        rotation=rot,
    ).count()
    print(f"ivfpq search: {t() - t0:.3f}s (rows={n})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
