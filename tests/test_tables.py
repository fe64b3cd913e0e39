"""SnapshotTable: atomic versioning, MERGE semantics, append-log mode,
time-travel reads."""

from __future__ import annotations

import pytest

from pygeodatacrawler_spark.tables import SnapshotTable


def test_merge_upsert_batch_wins(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t")
    t.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.merge_upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), key="k"
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # batch wins on collision


def test_time_travel_and_atomicity(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t")
    v1 = t.write_snapshot(spark.createDataFrame([(1,)], "k long"))
    v2 = t.write_snapshot(spark.createDataFrame([(1,), (2,)], "k long"))
    assert t.read(v1).count() == 1
    assert t.read(v2).count() == 2
    assert t.latest_version() == v2


def test_append_log_reads_union(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "log", log=True)
    t.append(spark.createDataFrame([(1,)], "k long"))
    t.append(spark.createDataFrame([(2,), (3,)], "k long"))
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
    # time-travel on the log: version 1 sees only the first delta
    assert sorted(r["k"] for r in t.read(1).collect()) == [1]


def test_missing_table_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "nope")
    assert not t.exists()
    with pytest.raises(FileNotFoundError):
        t.read()
