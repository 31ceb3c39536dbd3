"""Unit tests for functions/scalar.py against the reference's edge cases
(SURVEY.md §5.2: "Брак" rows, age 40000, month 12 repair, 'nan' strings,
missing optional columns)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cati_database_feeder_spark.functions import scalar


def one(df, colname="out"):
    return [r[colname] for r in df.collect()]


def test_status_case(spark):
    df = spark.createDataFrame([("Полное",), ("Брак",), ("Частичное",), (None,)], ["result"])
    out = one(df.select(scalar.status_case(F.col("result")).alias("out")))
    # reference feeder.py:168-171: only "Полное" → "Комплит", everything else interrupted
    assert out == ["Комплит", "Прервано", "Прервано", "Прервано"]


def test_reject_predicate_keeps_nulls(spark):
    df = spark.createDataFrame([("Брак",), ("Полное",), (None,)], ["result"])
    out = df.filter(scalar.reject_predicate(F.col("result"))).collect()
    assert [r["result"] for r in out] == ["Полное", None]


def test_parse_ru_timestamp_and_formats(spark):
    df = spark.createDataFrame([("02.05.2022 15:16:18",)], ["IVDate1"])
    ts = scalar.parse_ru_timestamp(F.col("IVDate1"))
    row = df.select(scalar.iso_date(ts).alias("d"), scalar.iso_datetime(ts).alias("dt")).first()
    assert row["d"] == "2022-05-02"
    assert row["dt"] == "2022-05-02 15:16:18"


def test_clamp_smallint(spark):
    df = spark.createDataFrame([(40000,), (25,), (32767,)], ["age"])
    assert one(df.select(scalar.clamp_smallint(F.col("age")).alias("out"))) == [32767, 25, 32767]


def test_truncate_str(spark):
    df = spark.createDataFrame([("x" * 150,), ("short",)], ["q2"])
    out = one(df.select(scalar.truncate_str(F.col("q2")).alias("out")))
    assert [len(out[0]), out[1]] == [100, "short"]


def test_month_increment_correct_vs_faithful_december(spark):
    # reference bug (add_q5011_2t.py:96-100): December → "13"; engine
    # default rolls the year correctly.
    df = spark.createDataFrame([("2022-12-15 10:00:00",)], ["d"])
    faithful = df.select(scalar.month_increment_faithful(F.col("d")).alias("out")).first()["out"]
    correct = df.select(
        scalar.iso_datetime(scalar.month_increment(
            F.to_timestamp("d", "yyyy-MM-dd HH:mm:ss"))).alias("out")).first()["out"]
    assert faithful == "2022-13-15 10:00:00"   # documented divergence
    assert correct == "2023-01-15 10:00:00"


def test_coalesce_recruiting_date(spark):
    df = spark.createDataFrame(
        [("nan", "2022-01-01 00:00:00"), (None, "2022-02-02 00:00:00"),
         ("2022-03-03 00:00:00", "2022-01-01 00:00:00")],
        ["q5011_2t", "iv_iso"])
    out = one(df.select(scalar.coalesce_recruiting_date(
        F.col("q5011_2t"), F.col("iv_iso")).alias("out")))
    assert out == ["2022-01-01 00:00:00", "2022-02-02 00:00:00", "2022-03-03 00:00:00"]


def test_wave_from_project_name(spark):
    df = spark.createDataFrame([("Трекинг здоровья бренда_w19",)], ["name"])
    assert one(df.select(scalar.wave_from_project_name(F.col("name")).alias("out"))) == ["19"]
    assert one(df.select(scalar.wave_from_project_name(F.col("name"), strip_w=True).alias("out"))) == ["19"]
    df6 = spark.createDataFrame([("проект_w6",)], ["name"])
    assert one(df6.select(scalar.wave_from_project_name(F.col("name"), strip_w=True).alias("out"))) == ["6"]


def test_clean_log_tail(spark):
    df = spark.createDataFrame([("line1\nline2\n\nline3\n",)], ["log"])
    assert one(df.select(scalar.clean_log_tail(F.col("log")).alias("out"))) == ["line3"]


def test_optional_column(spark):
    df = spark.createDataFrame([(1.0,)], ["DB_Reward"])
    cols = df.columns
    present = df.select(scalar.optional_column(cols, "DB_Reward").alias("out")).first()["out"]
    absent = df.select(scalar.optional_column(cols, "Reward").alias("out")).first()["out"]
    assert present == 1.0 and absent is None


def test_normalize_nan(spark):
    df = spark.createDataFrame([(float("nan"),), (2.5,)], ["v"])
    assert one(df.select(scalar.normalize_nan(F.col("v")).alias("out"))) == [None, 2.5]


def test_weighted_median_udaf(spark):
    from cati_database_feeder_spark.functions.udafs import weighted_median
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 100.0, 0.1),
         ("b", 5.0, 10.0), ("b", 50.0, 1.0),
         ("c", None, 1.0)],
        ["grp", "v", "w"])
    got = {r["grp"]: r["wm"] for r in
           df.groupBy("grp").agg(weighted_median("v", "w").alias("wm")).collect()}
    assert got["a"] == 2.0      # cum weights 1.0,2.0,2.1; half=1.05 -> 2.0
    assert got["b"] == 5.0      # heavy weight pins the median at 5
    assert got["c"] is None     # all-null group -> NULL


def test_trimmed_mean_udaf(spark):
    from cati_database_feeder_spark.functions.udafs import trimmed_mean
    from pyspark.sql import functions as F
    vals = list(range(1, 11)) + [10_000]        # outlier at the top
    df = spark.createDataFrame([("g", float(v)) for v in vals], ["grp", "v"])
    got = df.groupBy("grp").agg(trimmed_mean("v").alias("tm")).collect()[0]["tm"]
    assert got < 100            # outlier trimmed away
    plain = df.groupBy("grp").agg(F.avg("v")).collect()[0][1]
    assert plain > 900          # untrimmed mean is dominated by it


def test_redact_pii_replaces_emails_then_numbers(spark):
    from cati_database_feeder_spark.functions.text import redact_pii
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "mail bob123456789@ex.com or call 5551234567 now"),
         (2, "digits 123456 stay, 1234567 goes"),
         (3, "clean text")],
        ["id", "text"])
    got = {r["id"]: r["red"] for r in
           df.select("id", redact_pii(F.col("text")).alias("red")).collect()}
    # email (including its digit-bearing local part) becomes ONE token;
    # the standalone long run is replaced separately
    assert got[1] == "mail <EMAIL> or call <NUM> now"
    assert got[2] == "digits 123456 stay, <NUM> goes"   # 6 digits under threshold
    assert got[3] == "clean text"


def test_stratified_sample_deterministic_and_gated(spark):
    from cati_database_feeder_spark.operators.sampling import stratified_sample
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(400)],
        ["doc_id", "lang"])
    half = stratified_sample(df, "lang", "doc_id", {"en": 0.5})
    ids1 = {r["doc_id"] for r in half.collect()}
    # deterministic: identical selection on a different partitioning
    ids2 = {r["doc_id"] for r in
            stratified_sample(df.repartition(7), "lang", "doc_id",
                              {"en": 0.5}).collect()}
    assert ids1 == ids2
    # strata without a fraction default to 0 (dropped entirely)
    assert all(i % 2 == 0 for i in ids1)
    # hash gate keeps roughly the requested share of the stratum
    assert 60 <= len(ids1) <= 140
    # default_fraction=1.0 keeps everything
    assert stratified_sample(df, "lang", "doc_id", {},
                             default_fraction=1.0).count() == 400
