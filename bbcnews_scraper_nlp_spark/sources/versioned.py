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

Multi-writer safe via optimistic CAS: a manifest is published with
create-exclusive semantics (``_publish_manifest``), so two writers
racing on the same version number see exactly one winner; the loser
recomputes against the new head and retries — the shape of Delta's
commit protocol (on object stores, swap the hardlink for a
conditional put). At 100 TB the manifest lists directories, not
files, so its size is O(commits), and old versions are
garbage-collected by ``vacuum`` once readers age out (pruned
versions' idempotency tags are folded into ``_tags.json`` first, and
unreferenced data dirs get an age grace so in-flight commits are
never swept).

Reference parity note: this replaces the reference's "drop and
re-insert the Mongo collection" refresh (bbc_news_dag.py) with an
atomic, reversible publish.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_versions"
_DATA_DIR = "data"
_TAGS_FILE = "_tags.json"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"{version:012d}.json")


def _publish_manifest(root: str, version: int, manifest: dict) -> bool:
    """Atomically publish a manifest with CREATE-EXCLUSIVE semantics
    (the CAS primitive multi-writer needs): stage to a temp name,
    then ``os.link`` to the final name — link fails with EEXIST if
    another writer already published this version, unlike
    ``os.rename`` which silently overwrites on POSIX. Returns False
    on conflict so the caller can recompute against the new head and
    retry (optimistic concurrency, the shape of Delta's commit
    protocol). On object stores, swap the link for a conditional put
    (If-None-Match) — same contract.
    """
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, _manifest_path(root, version))  # the commit point
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


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
    probe for at-least-once producers (see ``commit_version``).
    Includes tags folded into ``_versions/_tags.json`` by ``vacuum``
    when it prunes old manifests, so a late replay arriving after
    vacuum still finds its tag and stays a no-op."""
    out = set()
    folded = os.path.join(root, _MANIFEST_DIR, _TAGS_FILE)
    if os.path.isfile(folded):
        with open(folded) as fh:
            out.update(json.load(fh))
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

    The commit point is the create-exclusive manifest publish
    (``_publish_manifest``): a crash before it leaves an orphaned
    data directory (cleaned by ``vacuum``) and the table untouched at
    its previous version. Concurrent writers race on the version
    number: the loser's publish fails (EEXIST) and it retries against
    the new head — the data files are written ONCE; only the tiny
    manifest is recomputed per attempt. ``tag`` idempotency holds
    across the race: each retry re-probes ``committed_tags`` so two
    producers carrying the same tag commit exactly one version.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")

    rel_dir = os.path.join(_DATA_DIR, f"d-{uuid.uuid4().hex}")
    df.write.mode("errorifexists").parquet(os.path.join(root, rel_dir))

    for _ in range(64):
        versions = table_versions(root)
        parent = versions[-1] if versions else None
        new_version = (parent + 1) if parent is not None else 0
        if tag is not None and tag in committed_tags(root):
            return versions[-1]  # unit of work already committed
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
        if _publish_manifest(root, new_version, manifest):
            return new_version
    raise RuntimeError(f"commit_version: CAS contention exhausted at {root}")


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
    for _ in range(64):
        versions = table_versions(root)
        new_version = versions[-1] + 1
        manifest = {
            "version": new_version,
            "parent": versions[-1],
            "op": f"rollback:{to_version}",
            "data_dirs": src["data_dirs"],
            "schema": src["schema"],
        }
        if _publish_manifest(root, new_version, manifest):
            return new_version
    raise RuntimeError(f"rollback: CAS contention exhausted at {root}")


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

    Duplicate keys within the source collapse deterministically: the
    survivor is rank 1 of ``row_number()`` over
    ``partitionBy(key).orderBy(<all non-key columns>)`` — a total
    order per key group, so the published version is a pure function
    of the source's CONTENT (sorting on the key alone determines
    nothing among equal keys, and dropDuplicates keeps an arbitrary
    first). The merged result is published with
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    non_key = [c for c in source.columns if c != key]
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc_nulls_first() for c in non_key])
    src = (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        if non_key
        else source.dropDuplicates([key])
    )
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


def vacuum(
    root: str, keep_versions: int = 2, orphan_grace_s: float = 3600.0
) -> list[str]:
    """Delete data directories referenced ONLY by versions older than
    the newest ``keep_versions`` manifests, plus orphaned directories
    from crashed commits. Returns the removed directories.

    Safety contract (Delta VACUUM's, made explicit):

    - Run only when no READER can still hold a pruned manifest.
    - Tags of pruned versions are folded into
      ``_versions/_tags.json`` BEFORE their manifests are removed, so
      at-least-once producers replaying after vacuum still find their
      unit-of-work tags in ``committed_tags`` and skip — vacuum never
      re-opens the exactly-once window.
    - A data directory in NO manifest is treated as an orphan only if
      it is older than ``orphan_grace_s`` (mtime): an in-flight
      commit has written its directory but not yet published its
      manifest, and deleting it would let the subsequent publish
      point at missing files. The default hour is far beyond any
      commit's write-to-publish gap; pass 0 only in tests or when
      writers are provably quiescent.
    """
    import shutil

    versions = table_versions(root)
    keep = set(versions[-keep_versions:]) if versions else set()
    live: set[str] = set()
    referenced: set[str] = set()
    pruned_tags: set[str] = set()
    for v in versions:
        m = _read_manifest(root, v)
        referenced.update(m["data_dirs"])
        if v in keep:
            live.update(m["data_dirs"])
        elif m.get("tag") is not None:
            pruned_tags.add(m["tag"])

    # fold pruned tags BEFORE removing their manifests (crash between
    # the two steps leaves both records — harmless duplication)
    if pruned_tags:
        folded_path = os.path.join(root, _MANIFEST_DIR, _TAGS_FILE)
        folded: set[str] = set()
        if os.path.isfile(folded_path):
            with open(folded_path) as fh:
                folded.update(json.load(fh))
        folded.update(pruned_tags)
        tmp = os.path.join(root, _MANIFEST_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(sorted(folded), fh)
        os.replace(tmp, folded_path)

    removed = []
    now = time.time()
    ddir = os.path.join(root, _DATA_DIR)
    if os.path.isdir(ddir):
        for d in sorted(os.listdir(ddir)):
            rel = os.path.join(_DATA_DIR, d)
            if rel in live:
                continue
            if rel not in referenced:  # orphan: maybe an in-flight commit
                age = now - os.path.getmtime(os.path.join(ddir, d))
                if age < orphan_grace_s:
                    continue
            shutil.rmtree(os.path.join(ddir, d))
            removed.append(rel)
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(root, v))
    return removed
