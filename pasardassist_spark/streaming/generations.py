"""Committed-generation directory protocol, shared by every state store.

One implementation of the crash-safety rules (used by the bucketed entity
state in ingest.py and the control/pending tables in dynamic.py):

- generations are ``v000001``-style subdirectories;
- a generation EXISTS only once its ``_COMMITTED`` marker file lands —
  Spark's own ``_SUCCESS`` is insufficient when post-write steps (bucket
  hard-links) must complete before the generation is usable;
- readers take the newest committed generation; writers derive the next
  version number from committed generations only, so a crashed partial
  write is silently overwritten by the retry;
- retention deletes old generations; hard-linked files survive because
  links are inode references.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMITTED"


def committed_versions(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        d
        for d in os.listdir(state_dir)
        if d.startswith("v") and os.path.exists(os.path.join(state_dir, d, COMMIT_MARKER))
    )


def next_version_dir(state_dir: str, versions: list[str] | None = None) -> str:
    vs = committed_versions(state_dir) if versions is None else versions
    return os.path.join(
        state_dir, f"v{(int(vs[-1][1:]) + 1) if vs else 1:06d}"
    )


def commit(gen_dir: str) -> None:
    with open(os.path.join(gen_dir, COMMIT_MARKER), "w"):
        pass  # the generation becomes visible only now


def publish_staged(tmp_dir: str, state_dir: str, max_tries: int = 16) -> str:
    """Atomically publish a fully staged (already commit-marked) generation
    into the next free version slot via os.rename CAS — rename onto an
    existing directory fails, so a committed generation can never be
    overwritten. On a lost race (a concurrent compaction committed the slot
    first) the publish retries with the next slot number; that is sound
    only because compaction preserves logical state and there is ONE
    streaming writer per state dir (the documented contract). A leftover
    UNcommitted directory in a slot is a crashed pre-CAS writer's garbage
    and is cleared."""
    for _ in range(max_tries):
        nxt = next_version_dir(state_dir)
        if os.path.isdir(nxt) and not os.path.exists(os.path.join(nxt, COMMIT_MARKER)):
            shutil.rmtree(nxt, ignore_errors=True)
        try:
            os.rename(tmp_dir, nxt)
            return nxt
        except OSError:
            continue  # slot taken between listing and rename; re-derive
    shutil.rmtree(tmp_dir, ignore_errors=True)
    raise RuntimeError(f"could not publish staged generation after {max_tries} tries")


def read_latest(spark: SparkSession, state_dir: str) -> DataFrame | None:
    vs = committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, vs[-1]))


def apply_retention(state_dir: str, versions: list[str], keep: int) -> None:
    if len(versions) >= keep:
        for stale in versions[: len(versions) - keep + 1]:
            shutil.rmtree(os.path.join(state_dir, stale), ignore_errors=True)


def write_generation(df: DataFrame, state_dir: str, keep: int = 2) -> None:
    """Whole-table generation write (small tables: control, pending)."""
    vs = committed_versions(state_dir)
    nxt = next_version_dir(state_dir, vs)
    df.write.mode("overwrite").parquet(nxt)
    commit(nxt)
    apply_retention(state_dir, vs, keep)


def link_tree(src: str, dst: str) -> None:
    """Hard-link a directory's files into another tree (O(1) I/O per file;
    falls back to copy across devices)."""
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        tgt = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            try:
                os.link(os.path.join(root, f), os.path.join(tgt, f))
            except OSError:
                shutil.copy2(os.path.join(root, f), os.path.join(tgt, f))
