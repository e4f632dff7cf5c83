"""Manifest-versioned stage tables: snapshot isolation, time travel,
rollback, vacuum, and crash atomicity."""

from __future__ import annotations

import os

from bbcnews_scraper_nlp_spark.sources.versioned import (
    commit_version,
    read_version,
    rollback,
    table_versions,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_commit_read_append_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = commit_version(_df(spark, 0, 10), root)
    assert v0 == 0
    assert read_version(spark, root).count() == 10

    v1 = commit_version(_df(spark, 10, 15), root, mode="append")
    assert v1 == 1
    assert read_version(spark, root).count() == 15
    # time travel: v0 unchanged by the append
    assert read_version(spark, root, version=0).count() == 10

    v2 = commit_version(_df(spark, 0, 3), root, mode="overwrite")
    assert read_version(spark, root).count() == 3
    assert read_version(spark, root, version=1).count() == 15
    assert table_versions(root) == [0, 1, 2] and v2 == 2


def test_snapshot_isolation_under_concurrent_commit(spark, tmp_path):
    # a reader that resolved its manifest BEFORE a new commit keeps
    # seeing its snapshot afterwards (immutable data dirs)
    root = str(tmp_path / "tbl")
    commit_version(_df(spark, 0, 10), root)
    snapshot = read_version(spark, root)
    commit_version(_df(spark, 0, 2), root, mode="overwrite")
    assert snapshot.count() == 10  # not 2
    assert read_version(spark, root).count() == 2


def test_rollback_is_append_only_and_copyless(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_version(_df(spark, 0, 10), root)
    commit_version(_df(spark, 0, 1), root, mode="overwrite")  # bad deploy
    v = rollback(root, to_version=0)
    assert v == 2
    assert read_version(spark, root).count() == 10
    # history is linear: the bad version stays readable
    assert read_version(spark, root, version=1).count() == 1
    # no data was copied: v0 and v2 share directories
    data = os.listdir(os.path.join(root, "data"))
    assert len(data) == 2  # one dir per real write, none for rollback


def test_crash_before_manifest_rename_is_invisible(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_version(_df(spark, 0, 10), root)
    # simulate a writer that crashed after writing data but before
    # the manifest rename: orphan data dir + staged tmp manifest
    orphan = os.path.join(root, "data", "v000000000099-deadbeef")
    _df(spark, 0, 5).write.parquet(orphan)
    with open(os.path.join(root, "_versions", ".tmp-crashed.json"), "w") as fh:
        fh.write("{}")
    assert table_versions(root) == [0]
    assert read_version(spark, root).count() == 10


def test_vacuum_drops_only_dead_dirs(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_version(_df(spark, 0, 10), root)            # v0
    commit_version(_df(spark, 10, 15), root, "append")  # v1 = v0 dirs + new
    commit_version(_df(spark, 0, 3), root, "overwrite")  # v2
    commit_version(_df(spark, 3, 6), root, "overwrite")  # v3
    removed = vacuum(root, keep_versions=2)
    # v2/v3 survive; v0's dir is shared with v1 (pruned), so it dies
    assert table_versions(root) == [2, 3]
    assert len(removed) == 2  # v0's dir and v1's append dir
    assert read_version(spark, root).count() == 3  # v3 = range(3, 6)
    assert read_version(spark, root, version=2).count() == 3


def test_merge_into_update_insert_delete(spark, tmp_path):
    from bbcnews_scraper_nlp_spark.sources.versioned import merge_into

    root = str(tmp_path / "tbl")
    commit_version(_df(spark, 0, 5), root)  # ids 0..4, v = 2*id

    # upsert: id 3 updated, id 99 inserted
    src = spark.createDataFrame([(3, 300), (99, 990)], "id long, v long")
    merge_into(spark, root, src, "id")
    got = {r["id"]: r["v"] for r in read_version(spark, root).collect()}
    assert got[3] == 300 and got[99] == 990 and got[0] == 0
    assert len(got) == 6

    # update-only: matched key updated, unknown key NOT inserted
    src2 = spark.createDataFrame([(4, 400), (77, 770)], "id long, v long")
    merge_into(spark, root, src2, "id", insert_unmatched=False)
    got = {r["id"]: r["v"] for r in read_version(spark, root).collect()}
    assert got[4] == 400 and 77 not in got

    # delete matched
    src3 = spark.createDataFrame([(0,), (99,)], "id long")
    merge_into(
        spark, root, src3.selectExpr("id", "CAST(NULL AS LONG) AS v"),
        "id", when_matched="delete", insert_unmatched=False,
    )
    got = {r["id"]: r["v"] for r in read_version(spark, root).collect()}
    assert 0 not in got and 99 not in got and len(got) == 4

    # every merge is a version: pre-merge states remain readable
    assert table_versions(root) == [0, 1, 2, 3]
    assert read_version(spark, root, version=0).count() == 5


def test_merge_into_source_dup_keys_collapse(spark, tmp_path):
    from bbcnews_scraper_nlp_spark.sources.versioned import merge_into

    root = str(tmp_path / "tbl")
    commit_version(_df(spark, 0, 3), root)
    src = spark.createDataFrame(
        [(1, 111), (1, 999), (5, 50)], "id long, v long"
    )
    merge_into(spark, root, src, "id")
    got = {r["id"]: r["v"] for r in read_version(spark, root).collect()}
    assert len(got) == 4 and got[5] == 50
    assert got[1] in (111, 999)  # deterministic pick, single row
