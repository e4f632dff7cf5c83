"""Manifest-versioned stage tables: atomic commits + time travel on
plain parquet.

The stage-table writers in ``stage_io.py`` get atomicity from
directory renames — workable locally, but a reader that lists the
directory mid-swap sees a torn table, rollback means keeping manual
backups, and object stores (s3a://) don't even have atomic rename.
This module adds the minimal transaction-log mechanism that
Delta/Iceberg/Hudi are built around, engine-side and dependency-free:

- data files are IMMUTABLE once written: every commit writes its
  parquet into a fresh ``data/v{N}-{token}/`` directory and never
  touches previous files;
- a table VERSION is a small JSON manifest in ``_versions/`` naming
  exactly the data directories that make it up; the manifest is
  staged to a temp name and renamed into place, so a version is
  either fully visible or absent — readers that resolve a manifest
  get a consistent snapshot no matter what a writer is doing;
- reads resolve the latest manifest (or any pinned ``version=`` —
  time travel), and rollback is just committing a new manifest that
  points at an old version's directories: no data is copied.

Single-writer per table by design (the reference pipeline's cron
model; multi-writer needs a CAS primitive — a lock service or
conditional put — exactly the line Delta's commit protocol draws).
At 100 TB the manifest lists directories, not files, so its size is
O(commits), and old versions are garbage-collected by
``vacuum`` once readers age out.

Reference parity note: this replaces the reference's "drop and
re-insert the Mongo collection" refresh (bbc_news_dag.py) with an
atomic, reversible publish.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_versions"
_DATA_DIR = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version:012d}.json")


def table_versions(root: str) -> list[int]:
    """All committed versions, ascending. Empty list = no table."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.endswith(".json") and not f.startswith("."):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as fh:
        return json.load(fh)


def committed_tags(root: str) -> set[str]:
    """All ``tag`` values recorded by prior commits — the idempotency
    probe for at-least-once producers (see ``commit_version``)."""
    out = set()
    for v in table_versions(root):
        t = _read_manifest(root, v).get("tag")
        if t is not None:
            out.add(t)
    return out


def commit_version(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    tag: str | None = None,
) -> int:
    """Commit ``df`` as a new table version; returns the version.

    ``mode="overwrite"``: the new version is exactly ``df``.
    ``mode="append"``: the new version is the previous version's
    directories PLUS the new files — the append writes only the new
    rows; history is never rewritten.

    ``tag`` (optional) is recorded in the manifest and queryable via
    ``committed_tags`` — an at-least-once producer (a streaming
    foreachBatch, a retried job) tags each commit with its unit of
    work (e.g. ``"batch:7"``) and skips units already present,
    turning replays into no-ops: exactly-once from plain parquet.

    The commit point is the manifest rename: a crash before it leaves
    an orphaned data directory (cleaned by ``vacuum``) and the table
    untouched at its previous version.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    versions = table_versions(root)
    parent = versions[-1] if versions else None
    new_version = (parent + 1) if parent is not None else 0

    rel_dir = os.path.join(_DATA_DIR, f"v{new_version:012d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("errorifexists").parquet(os.path.join(root, rel_dir))

    dirs = [rel_dir]
    if mode == "append" and parent is not None:
        dirs = _read_manifest(root, parent)["data_dirs"] + dirs

    manifest = {
        "version": new_version,
        "parent": parent,
        "op": mode,
        "tag": tag,
        "data_dirs": dirs,
        "schema": df.schema.json(),
    }
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, _manifest_path(root, new_version))  # the commit point
    return new_version


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest). The manifest
    is a point-in-time snapshot: concurrent commits never change what
    this read sees."""
    versions = table_versions(root)
    if not versions:
        raise FileNotFoundError(f"no versioned table at {root}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    m = _read_manifest(root, v)
    paths = [os.path.join(root, d) for d in m["data_dirs"]]
    return spark.read.parquet(*paths)


def rollback(root: str, to_version: int) -> int:
    """Publish a NEW version that points at ``to_version``'s data —
    history stays linear and append-only (the bad version remains
    readable for forensics), and no data is copied."""
    versions = table_versions(root)
    if to_version not in versions:
        raise ValueError(f"version {to_version} not in {versions}")
    src = _read_manifest(root, to_version)
    new_version = versions[-1] + 1
    manifest = {
        "version": new_version,
        "parent": versions[-1],
        "op": f"rollback:{to_version}",
        "data_dirs": src["data_dirs"],
        "schema": src["schema"],
    }
    mdir = os.path.join(root, _MANIFEST_DIR)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, _manifest_path(root, new_version))
    return new_version


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key: str,
    when_matched: str = "update",
    insert_unmatched: bool = True,
) -> int:
    """ANSI-MERGE semantics as one atomic versioned commit:

    - ``when_matched="update"``: target rows whose key appears in the
      source are REPLACED by the source row (SCD1 last-writer-wins);
    - ``when_matched="delete"``: target rows whose key appears in the
      source are dropped;
    - ``insert_unmatched=True``: source rows whose key is absent from
      the target are inserted.

    Duplicate keys within the source collapse deterministically
    (dropDuplicates after a key-ordered sort, the upsert_skip
    convention). The merged result is published with
    ``commit_version(mode="overwrite")`` — readers see the old
    version until the manifest rename, and the pre-merge version
    remains time-travelable (``rollback`` undoes a bad merge without
    data copies).

    Plan shape: ONE key-partitioned left-anti join (target minus
    matched keys) + a union — the same logical plan a Delta MERGE
    executes, minus its file-level pruning (which the manifest layer
    can add by recording per-directory key min/max). At 100 TB pair
    with a partitioned layout so the anti-join shuffles only the
    partitions the source touches.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    src = source.orderBy(key).dropDuplicates([key])
    target = read_version(spark, root)
    kept = target.join(src.select(key), key, "left_anti")
    if when_matched == "update":
        incoming = src if insert_unmatched else src.join(
            target.select(key), key, "left_semi"
        )
        merged = kept.unionByName(incoming)
    else:  # delete
        merged = kept if not insert_unmatched else kept.unionByName(
            src.join(target.select(key), key, "left_anti")
        )
    return commit_version(merged, root, mode="overwrite")


def vacuum(root: str, keep_versions: int = 2) -> list[str]:
    """Delete data directories referenced ONLY by versions older than
    the newest ``keep_versions`` manifests (and orphaned directories
    from crashed commits). Returns the removed directories. Run only
    when no reader can still hold a pruned manifest — the same
    retention contract as Delta VACUUM."""
    import shutil

    versions = table_versions(root)
    keep = set(versions[-keep_versions:]) if versions else set()
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(root, v)["data_dirs"])
    removed = []
    ddir = os.path.join(root, _DATA_DIR)
    if os.path.isdir(ddir):
        for d in sorted(os.listdir(ddir)):
            rel = os.path.join(_DATA_DIR, d)
            if rel not in live:
                shutil.rmtree(os.path.join(ddir, d))
                removed.append(rel)
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(root, v))
    return removed
