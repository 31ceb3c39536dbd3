"""End-to-end composition of the reference's whole entry point
(`RecruitsUploader.run()`, reference feeder.py:248-259): Excel/zip
export → decode → transform chain → existing-keys anti-join → keyed
upsert into the database — as one Spark pipeline feeding DuckDB.

Every stage is the engine's real operator: binaryFile+mapInPandas
decode (sources/excel.py), pivot re-widen, the scalar transform pack
(functions/scalar.py), broadcast anti-join dedup, stage-then-MERGE
upsert (sinks/jdbc.py). No stage is mocked; the xlsx fixture is a
hand-built OOXML archive so the decode kernel runs even without
openpyxl.
"""

import zipfile

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import make_xlsx
from cati_database_feeder_spark.functions import scalar
from cati_database_feeder_spark.sinks import jdbc
from cati_database_feeder_spark.sources import excel

HEADER = ["ID", "Phone", "Result", "IVDate1", "Q2", "AGE"]
ROWS_W1 = [
    ["1", "79001", "Полное", "02.05.2022 15:16:18", "Anna", "34"],
    ["2", "79002", "Брак", "02.05.2022 16:00:00", "Boris", "41"],   # rejected (#15)
    ["3", "79003", "Прервано частично", "03.05.2022 09:30:00", "Vera", "29"],
]
ROWS_W2 = [
    ["4", "79004", "Полное", "04.05.2022 11:11:11", "Gleb", "99999"],  # clamps (#27)
    ["5", "79001", "Полное", "04.05.2022 12:00:00", "Anna again", "35"],  # existing phone (#17)
]


@pytest.fixture()
def export_dir(tmp_path):
    (tmp_path / "wave1.xlsx").write_bytes(make_xlsx(HEADER, ROWS_W1))
    with zipfile.ZipFile(tmp_path / "wave2.zip", "w") as zf:
        # reference semantics: first archive member is the data (feeder.py:120)
        zf.writestr("export.xlsx", make_xlsx(HEADER, ROWS_W2))
    return str(tmp_path)


def test_feeder_end_to_end(spark, export_dir):
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE recruits_log (
            id BIGINT, wave INTEGER, status VARCHAR, phone VARCHAR,
            result VARCHAR, name_rec VARCHAR, age_rec1 INTEGER, date VARCHAR)
    """)
    # phone 79001 is already loaded for this wave (feeder.py:137-138)
    con.execute("""
        INSERT INTO recruits_log VALUES
        (900, 19, 'Комплит', '79001', 'Полное', 'Anna', 34, '2022-04-01')
    """)

    # 1-2. multi-file Excel/zip scan + decode (ops #1-#3), re-widen
    decoded = excel.read_excel_glob(spark, f"{export_dir}/*")
    assert decoded.filter(F.col("col_name") == "__error__").count() == 0
    wide = excel.pivot_wave(decoded, HEADER)

    # 3. transform chain (ops #15, #16, #22-23, #26, #27) — the same
    # scalar pack the flagship plan uses
    existing = spark.createDataFrame([("79001",)], ["Phone"])
    transformed = (
        wide
        .filter(scalar.reject_predicate(F.col("Result")))            # #15 'Брак'
        .join(F.broadcast(existing), on="Phone", how="left_anti")    # #17
        .select(
            F.col("ID").cast("bigint").alias("id"),
            F.lit(19).alias("wave"),
            scalar.status_case(F.col("Result")).alias("status"),     # #16
            F.col("Phone").alias("phone"),
            F.col("Result").alias("result"),
            scalar.truncate_str(F.col("Q2"), 100).alias("name_rec"),  # #26
            scalar.clamp_smallint(F.col("AGE").cast("int")).alias("age_rec1"),  # #27
            scalar.iso_date(
                scalar.parse_ru_timestamp(F.col("IVDate1"))).alias("date"),  # #22-23
        ))

    # 4. keyed upsert: stage + one set-based MERGE (op #9/E12), not
    # the reference's per-row INSERT loop
    jdbc.merge_upsert(
        transformed, con, target="recruits_log",
        key_cols=["phone"],
        update_cols=["id", "wave", "status", "result", "name_rec", "age_rec1", "date"],
        dialect="update_insert")

    got = {r[0]: r for r in con.execute(
        "SELECT phone, id, status, age_rec1, date FROM recruits_log ORDER BY phone").fetchall()}
    # rejected 'Брак' row never loaded
    assert "79002" not in got
    # new completes inserted with the full transform applied
    assert got["79003"][2] == "Прервано"
    assert got["79004"][2] == "Комплит"
    assert got["79004"][3] == 32767            # smallint clamp
    assert got["79004"][4] == "2022-05-04"     # RU ts → ISO date
    # the pre-existing phone was SKIPPED (anti-join, reference
    # feeder.py:157-160), never re-inserted or overwritten
    assert con.execute(
        "SELECT COUNT(*) FROM recruits_log WHERE phone = '79001'").fetchone()[0] == 1
    assert got["79001"][1] == 900              # untouched original row
    assert len(got) == 3
