"""Deletion-vector ZoneStore (zones_dv.DVZoneStore): the merge-on-read
properties the query cannot show are pinned here — deletes rewrite NO
data files, deletes are idempotent, time travel replays vectors, and
purge compaction folds them away without changing read results."""

from __future__ import annotations

import os

import pytest

from healthcare_data_lakehouse_spark.zones import DataZone, LoadType
from healthcare_data_lakehouse_spark.zones_dv import DVZoneStore


def _mk(spark, tmp_path):
    store = DVZoneStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, float(i * 10), "A" if i % 2 == 0 else "B") for i in range(20)],
        "id long, val double, grp string",
    )
    store.write(DataZone.SILVER, "t", df.filter("id < 10"), LoadType.FULL)
    store.write(DataZone.SILVER, "t", df.filter("id >= 10"), LoadType.APPEND)
    return store


def _data_files(store, zone, dataset):
    path = store.dataset_path(zone, dataset)
    manifest = store._read_manifest(path)
    files = []
    for c in manifest["commits"]:
        cdir = os.path.join(path, c)
        for root, _, names in os.walk(cdir):
            files += [
                (os.path.join(root, n), os.path.getmtime(os.path.join(root, n)))
                for n in names
            ]
    return manifest["commits"], sorted(files)


def test_dv_delete_rewrites_no_data_files(spark, tmp_path):
    store = _mk(spark, tmp_path)
    before_commits, before_files = _data_files(store, DataZone.SILVER, "t")
    n = store.delete_where_dv(DataZone.SILVER, "t", "id % 5 = 0")
    assert n == 4  # 0, 5, 10, 15
    after_commits, after_files = _data_files(store, DataZone.SILVER, "t")
    assert after_commits == before_commits
    assert after_files == before_files  # paths AND mtimes untouched
    live = {r.id for r in store.read(DataZone.SILVER, "t").collect()}
    assert live == {i for i in range(20) if i % 5 != 0}


def test_dv_delete_is_idempotent(spark, tmp_path):
    store = _mk(spark, tmp_path)
    assert store.delete_where_dv(DataZone.SILVER, "t", "id < 3") == 3
    v = store._read_manifest(store.dataset_path(DataZone.SILVER, "t"))[
        "version"
    ]
    # same predicate again: evaluates over the DV-applied scan -> no-op
    assert store.delete_where_dv(DataZone.SILVER, "t", "id < 3") == 0
    v2 = store._read_manifest(store.dataset_path(DataZone.SILVER, "t"))[
        "version"
    ]
    assert v2 == v


def test_dv_time_travel_replays_vectors(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id < 5")        # v3
    store.delete_where_dv(DataZone.SILVER, "t", "grp = 'B'")     # v4
    v2 = {r.id for r in store.read_version(DataZone.SILVER, "t", 2).collect()}
    v3 = {r.id for r in store.read_version(DataZone.SILVER, "t", 3).collect()}
    v4 = {r.id for r in store.read_version(DataZone.SILVER, "t", 4).collect()}
    assert v2 == set(range(20))
    assert v3 == set(range(5, 20))
    assert v4 == {i for i in range(5, 20) if i % 2 == 0}
    assert v4 == {r.id for r in store.read(DataZone.SILVER, "t").collect()}


def test_dv_purge_preserves_reads_and_clears_vectors(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id % 3 = 0")
    before = sorted(
        (r.id, r.val, r.grp)
        for r in store.read(DataZone.SILVER, "t").collect()
    )
    n = store.purge_dv(DataZone.SILVER, "t")
    assert n == len(before)
    after = sorted(
        (r.id, r.val, r.grp)
        for r in store.read(DataZone.SILVER, "t").collect()
    )
    assert after == before
    st = store.dv_stats(DataZone.SILVER, "t")
    assert st["n_dvs"] == 0 and st["n_deleted_keys"] == 0
    assert st["n_commits"] == 1  # compacted to one commit
    # purge with nothing outstanding is a no-op
    assert store.purge_dv(DataZone.SILVER, "t") == 0


def test_dv_key_column_cannot_mix(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id = 1", key_col="id")
    with pytest.raises(ValueError, match="keyed on"):
        store.delete_where_dv(DataZone.SILVER, "t", "id = 2", key_col="grp")


def test_dv_stats_reports_scan_tax(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id < 4")
    store.delete_where_dv(DataZone.SILVER, "t", "id >= 18")
    st = store.dv_stats(DataZone.SILVER, "t")
    assert st["n_dvs"] == 2
    assert st["n_deleted_keys"] == 6
    assert st["dv_key"] == "id"
    assert st["n_commits"] == 2


def test_dv_delete_keys_set_based_and_idempotent(spark, tmp_path):
    store = _mk(spark, tmp_path)
    keys = spark.createDataFrame([(2,), (4,), (99,)], "id long")
    # 99 has no live row: contributes nothing
    assert store.delete_keys_dv(DataZone.SILVER, "t", keys) == 2
    v = store._read_manifest(store.dataset_path(DataZone.SILVER, "t"))[
        "version"
    ]
    # replay of the same request batch: all keys already dead -> no-op
    assert store.delete_keys_dv(DataZone.SILVER, "t", keys) == 0
    v2 = store._read_manifest(store.dataset_path(DataZone.SILVER, "t"))[
        "version"
    ]
    assert v2 == v
    live = {r.id for r in store.read(DataZone.SILVER, "t").collect()}
    assert live == set(range(20)) - {2, 4}


def test_dv_merge_reinsert_after_delete_is_not_refiltered(spark, tmp_path):
    # stale-vector resurrection bug: a MERGE that re-inserts a key the
    # vector deleted must produce a LIVE row — the rewrite folds
    # outstanding vectors first, so no old vector can touch newer data
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id = 3")
    assert 3 not in {
        r.id for r in store.read(DataZone.SILVER, "t").collect()
    }
    upsert = spark.createDataFrame(
        [(3, 999.0, "A")], "id long, val double, grp string"
    )
    store.write(DataZone.SILVER, "t", upsert, LoadType.MERGE)
    rows = {r.id: r for r in store.read(DataZone.SILVER, "t").collect()}
    assert 3 in rows and rows[3].val == 999.0
    assert store.dv_stats(DataZone.SILVER, "t")["n_dvs"] == 0


def test_dv_append_after_delete_keeps_new_rows(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id = 7")
    fresh = spark.createDataFrame(
        [(7, 777.0, "B")], "id long, val double, grp string"
    )
    store.write(DataZone.SILVER, "t", fresh, LoadType.APPEND)
    rows = [r for r in store.read(DataZone.SILVER, "t").collect()
            if r.id == 7]
    assert len(rows) == 1 and rows[0].val == 777.0


def test_dv_cow_delete_counts_only_live_rows(spark, tmp_path):
    # copy-on-write DELETE after a vector delete: the fold runs first,
    # so the CoW pass never sees (or counts) rows the vector removed
    store = _mk(spark, tmp_path)
    store.delete_where_dv(DataZone.SILVER, "t", "id < 10")   # 10 rows
    n = store.delete_where(DataZone.SILVER, "t", "id < 12")
    assert n == 2  # only 10, 11 were still live
    live = {r.id for r in store.read(DataZone.SILVER, "t").collect()}
    assert live == set(range(12, 20))
