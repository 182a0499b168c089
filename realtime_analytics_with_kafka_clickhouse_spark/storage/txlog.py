"""Minimal transaction-log table format for the MERGE path (SURVEY.md §2.7;
reference behavior replaced: consumers/kafka_to_clickhouse.py:107-129).

The parquet-swap protocol in ``streaming.pipeline.merge_rollup`` is honest
about its weakness: directory rename is copy+delete on S3A, so its crash
window is repaired, not prevented.  This module provides the real contract
— Delta/Iceberg-style snapshot atomicity — built from one primitive the
log formats themselves rely on: atomic create-if-absent of a single commit
file (``fs.create_exclusive``).

Layout::

    table/
      data/<uuid>/part-*.parquet     immutable data directories, write-once
      _txlog/00000000000000000042.json   one commit file per version

A commit file names the data directories that ARE the table at that
version (full-snapshot manifests — the rollup tables this serves are
key-bounded, so manifests stay tiny; an append-heavy table would switch to
add/remove deltas like Delta does, same machinery).  Readers list
``_txlog``, take the highest version, and read exactly the directories it
names: a half-written data directory is invisible because no commit names
it, and a torn commit never happens because the commit is one atomic file
creation.  Writers that lose the version race re-read state and retry —
optimistic concurrency, serialized by the log.

Idempotency: each commit records ``last_merged_batch``; a replayed
foreachBatch epoch sees its id already folded in and skips — the same
contract the swap path keeps via its in-directory marker, now transactional.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import fs

TXLOG_DIR = "_txlog"
DATA_DIR = "data"
_VERSION_WIDTH = 20


def _commit_path(table: str, version: int) -> str:
    return f"{table}/{TXLOG_DIR}/{str(version).zfill(_VERSION_WIDTH)}.json"


def latest_version(spark: SparkSession, table: str) -> int:
    """Highest committed version; 0 if the table has no commits yet."""
    names = fs.list_dir(spark, f"{table}/{TXLOG_DIR}")
    versions = [int(n[:-5]) for n in names if n.endswith(".json")]
    return max(versions, default=0)


def read_commit(spark: SparkSession, table: str, version: int) -> dict | None:
    text = fs.read_text(spark, _commit_path(table, version))
    return json.loads(text) if text else None


def snapshot(spark: SparkSession, table: str) -> tuple[int, dict | None]:
    """(version, commit) of the current snapshot; (0, None) for an empty
    table.  One log listing — no data-directory listing ever."""
    v = latest_version(spark, table)
    return (v, read_commit(spark, table, v)) if v > 0 else (0, None)


def read_table(spark: SparkSession, table: str) -> DataFrame | None:
    """The current snapshot as a DataFrame (None if no commits): reads
    exactly the directories the latest commit names."""
    _, commit = snapshot(spark, table)
    if commit is None:
        return None
    return spark.read.parquet(*[f"{table}/{d}" for d in commit["dirs"]])


def write_data_dir(df: DataFrame, table: str) -> str:
    """Write a new immutable data directory; returns its table-relative
    name.  Invisible to readers until some commit names it."""
    rel = f"{DATA_DIR}/{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(f"{table}/{rel}")
    return rel


def try_commit(
    spark: SparkSession,
    table: str,
    version: int,
    dirs: list[str],
    last_merged_batch: int | None,
) -> bool:
    """Publish ``dirs`` as table version ``version``.  False = lost the
    race (that version exists); caller re-reads state and retries."""
    payload = json.dumps(
        {"version": version, "dirs": dirs, "last_merged_batch": last_merged_batch}
    )
    return fs.create_exclusive(spark, _commit_path(table, version), payload)


def vacuum(spark: SparkSession, table: str, keep_versions: int = 2) -> list[str]:
    """Garbage-collect data directories unreferenced by the newest
    ``keep_versions`` commits, plus commit files older than those.  Safe to
    crash anywhere: deleting unreferenced data is invisible to readers, and
    re-running finishes the job.  Returns deleted relative paths."""
    current = latest_version(spark, table)
    if current == 0:
        return []
    keep = range(max(1, current - keep_versions + 1), current + 1)
    live: set[str] = set()
    for v in keep:
        commit = read_commit(spark, table, v)
        if commit:
            live.update(commit["dirs"])
    deleted: list[str] = []
    for name in fs.list_dir(spark, f"{table}/{DATA_DIR}"):
        rel = f"{DATA_DIR}/{name}"
        if rel not in live:
            fs.delete(spark, f"{table}/{rel}")
            deleted.append(rel)
    for name in fs.list_dir(spark, f"{table}/{TXLOG_DIR}"):
        if name.endswith(".json") and int(name[:-5]) < keep.start:
            fs.delete(spark, f"{table}/{TXLOG_DIR}/{name}")
            deleted.append(f"{TXLOG_DIR}/{name}")
    return deleted


def merge_rollup_tx(
    spark: SparkSession,
    table: str,
    batch_partials: DataFrame,
    batch_id: int | None = None,
    keys: list[str] | None = None,
    sums: list[tuple[str, str]] | None = None,
    max_attempts: int = 10,
) -> bool:
    """Transactional SummingMergeTree fold: same semantics and signature
    family as ``streaming.pipeline.merge_rollup`` (equal keys re-sum, new
    keys append, replayed batch ids skip) but committed atomically through
    the transaction log — no swap directories, no crash-repair pass.

    Returns True if merged, False if skipped as a replay.
    """
    from pyspark.sql import functions as F

    from ..functions.scalars import dsum

    keys = keys or ["hour", "category"]
    sums = sums or [
        ("order_count", "long"),
        ("total_revenue", "money"),
        ("total_quantity", "long"),
    ]
    for _ in range(max_attempts):
        version, commit = snapshot(spark, table)
        if (
            batch_id is not None
            and commit is not None
            and commit.get("last_merged_batch") is not None
            and batch_id <= commit["last_merged_batch"]
        ):
            return False
        if commit is None:
            unioned = batch_partials
        else:
            current = spark.read.parquet(*[f"{table}/{d}" for d in commit["dirs"]])
            unioned = current.unionByName(batch_partials)
        merged = unioned.groupBy(*keys).agg(
            *[(dsum(c) if kind == "money" else F.sum(c)).alias(c) for c, kind in sums]
        )
        new_dir = write_data_dir(merged, table)
        if try_commit(spark, table, version + 1, [new_dir], batch_id):
            return True
        # Lost the race: our data dir is unreferenced garbage (readers never
        # saw it); drop it and retry against the new snapshot.
        fs.delete(spark, f"{table}/{new_dir}")
    raise RuntimeError(f"merge_rollup_tx: gave up after {max_attempts} commit races on {table}")
