"""Partitioned lake sink (sinks/lake.py): dynamic partition overwrite
is the idempotent-backfill contract — replace exactly the partitions
the batch carries, never touch the rest. These tests pin the
semantics that make a one-day re-run safe on a 100 TB table."""

import os

from pyspark.sql import functions as F

from cati_database_feeder_spark.session import local_frame
from cati_database_feeder_spark.sinks.lake import write_partitioned


def _rows(spark, rows):
    return local_frame(spark, rows, "day string, id bigint, v string")


def _read(spark, path):
    return {(r["day"], r["id"], r["v"])
            for r in spark.read.parquet(path).collect()}


def _day_files(path, day):
    d = os.path.join(path, f"day={day}")
    return sorted(
        (n, os.stat(os.path.join(d, n)).st_ino)
        for n in os.listdir(d) if n.endswith(".parquet"))


def test_dynamic_overwrite_replaces_only_touched_partitions(
        spark, tmp_path):
    p = str(tmp_path / "t")
    write_partitioned(
        _rows(spark, [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")]),
        p, ["day"])
    untouched = _day_files(p, "d1")
    # backfill d2 with corrected rows: d2 replaced, d1's files not
    # rewritten (same names AND inodes), no appended duplicates
    write_partitioned(_rows(spark, [("d2", 3, "c2"), ("d2", 4, "d")]),
                      p, ["day"])
    assert _read(spark, p) == {("d1", 1, "a"), ("d1", 2, "b"),
                               ("d2", 3, "c2"), ("d2", 4, "d")}
    assert _day_files(p, "d1") == untouched


def test_dynamic_overwrite_is_idempotent(spark, tmp_path):
    p = str(tmp_path / "t")
    batch = [("d1", 1, "a"), ("d2", 2, "b")]
    write_partitioned(_rows(spark, batch), p, ["day"])
    write_partitioned(_rows(spark, batch), p, ["day"])
    assert _read(spark, p) == set(batch)


def test_static_overwrite_wipes_whole_table(spark, tmp_path):
    """The mode the fence exists for: static overwrite of a one-day
    batch DROPS every other partition — dynamic must be the backfill
    default."""
    p = str(tmp_path / "t")
    write_partitioned(
        _rows(spark, [("d1", 1, "a"), ("d2", 2, "b")]), p, ["day"])
    write_partitioned(_rows(spark, [("d2", 2, "b2")]), p, ["day"],
                      mode="static")
    assert _read(spark, p) == {("d2", 2, "b2")}


def test_append_accumulates(spark, tmp_path):
    p = str(tmp_path / "t")
    write_partitioned(_rows(spark, [("d1", 1, "a")]), p, ["day"])
    write_partitioned(_rows(spark, [("d1", 2, "b")]), p, ["day"],
                      mode="append")
    assert _read(spark, p) == {("d1", 1, "a"), ("d1", 2, "b")}


def test_one_file_per_partition(spark, tmp_path):
    """File-count hygiene: the pre-write repartition keeps one task →
    one file per output partition even when the input is spread
    across many partitions."""
    p = str(tmp_path / "t")
    df = (_rows(spark, [("d1", i, "x") for i in range(20)]
                + [("d2", i, "y") for i in range(20)])
          .repartition(8))
    write_partitioned(df, p, ["day"])
    assert len(_day_files(p, "d1")) == 1
    assert len(_day_files(p, "d2")) == 1


def test_bad_mode_fails_loud(spark, tmp_path):
    import pytest
    with pytest.raises(ValueError):
        write_partitioned(_rows(spark, [("d1", 1, "a")]),
                          str(tmp_path / "t"), ["day"], mode="merge")
