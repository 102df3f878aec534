"""Concrete sources: parquet, CSV, JDBC (read+write), SQL-over-views, memory.

Reference parity:
- ParquetSource: the testdata scan path (TESTDATA.md); replaces the ADX scan
  for this engine's correctness substrate (SURVEY §2.1 S1/S2).
- CsvSource: OPS:537-552 CSVDataLoader day-1 path (S9).
- JdbcSource: MySQL scan/sink (S3/S4/S5/S6, src/plugins/mysql_plugin.py).
  Env-var config preserved (mysql_plugin.py:66-76): MYSQL_HOST/PORT/USER/
  PASSWORD/DATABASE. Full-query pushdown via the ``query`` option; writes
  via df.write.jdbc; UPDATE / upsert-MERGE DML via per-partition
  executemany over an injectable connection factory (mysql_plugin.py:
  161-164 commit semantics). Engine-level retry is intentionally absent —
  Spark task retry + JDBC driver options cover it (SURVEY §2.13 D7).
- SqlSource: the native-query-string surface over the session catalog —
  parse/optimize/execute in Catalyst instead of a remote engine (SURVEY §3.2).
- MemorySource: S8 in-memory frame injection (EPC:109-112).

Scale notes: JDBC reads accept partitionColumn/lowerBound/upperBound/
numPartitions so a big table scan fans out across executors instead of one
connection; always set them for >1 GB source tables.
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from meshinsights_data_pipeline_spark.sources.base import Source


class ParquetSource(Source):
    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        df.write.mode(mode).parquet(self.path)


class JsonlSource(Source):
    """JSON-lines source/sink — the standard training-data interchange
    format (one JSON document per line: crawls, instruction sets, eval
    suites all ship this way). Always pass ``schema`` in production:
    schema inference reads the data TWICE (a full extra pass at 100 TB)
    and silently widens sparse fields; an explicit schema also prunes
    unprojected JSON fields at parse time. ``multiline=False`` keeps
    the input splittable — one JSON object spanning lines forces
    whole-file parsing, so jsonl stays the scalable layout."""

    def __init__(self, path: str, schema: str | None = None):
        self.path = path
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema:
            reader = reader.schema(self.schema)
        return reader.json(self.path)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        df.write.mode(mode).json(self.path)


class OrcSource(Source):
    """ORC source/sink — the other columnar interchange format Spark
    reads natively; same pushdown/pruning contract as parquet (filters
    and column projection reach the scan)."""

    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.orc(self.path)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        df.write.mode(mode).orc(self.path)


class CsvSource(Source):
    def __init__(self, path: str, header: bool = True, infer_schema: bool = True, schema: str | None = None):
        self.path = path
        self.header = header
        self.infer_schema = infer_schema
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.option("header", self.header)
        if self.schema:
            reader = reader.schema(self.schema)
        else:
            reader = reader.option("inferSchema", self.infer_schema)
        return reader.csv(self.path)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        df.write.mode(mode).option("header", True).csv(self.path)


class JdbcSource(Source):
    """JDBC scan with full-query pushdown, plus an append sink.

    ``query`` mirrors the reference's native-SQL passthrough
    (mysql_plugin.py:137-192): the string executes remotely, only results
    cross the wire. ``table`` + partition options is the parallel-scan path.
    """

    ENV_PREFIX = "MYSQL_"  # mysql_plugin.py:66-76 env-var convention

    def __init__(
        self,
        url: str | None = None,
        table: str | None = None,
        query: str | None = None,
        driver: str | None = None,
        partition_column: str | None = None,
        lower_bound: Any = None,
        upper_bound: Any = None,
        num_partitions: int | None = None,
        **options: str,
    ):
        if url is None:
            host = os.environ.get(f"{self.ENV_PREFIX}HOST", "localhost")
            port = os.environ.get(f"{self.ENV_PREFIX}PORT", "3306")
            db = os.environ.get(f"{self.ENV_PREFIX}DATABASE", "")
            url = f"jdbc:mysql://{host}:{port}/{db}"
            options.setdefault("user", os.environ.get(f"{self.ENV_PREFIX}USER", ""))
            options.setdefault("password", os.environ.get(f"{self.ENV_PREFIX}PASSWORD", ""))
        if (table is None) == (query is None):
            raise ValueError("Provide exactly one of table= or query=")
        self.url = url
        self.table = table
        self.query = query
        self.driver = driver
        self.partition = (partition_column, lower_bound, upper_bound, num_partitions)
        self.options = options

    def _reader(self, spark: SparkSession):
        r = spark.read.format("jdbc").option("url", self.url)
        if self.driver:
            r = r.option("driver", self.driver)
        for k, v in self.options.items():
            r = r.option(k, v)
        return r

    def read(self, spark: SparkSession) -> DataFrame:
        r = self._reader(spark)
        if self.query is not None:
            return r.option("query", self.query).load()
        r = r.option("dbtable", self.table)
        pc, lo, hi, n = self.partition
        if pc is not None:
            r = (
                r.option("partitionColumn", pc)
                .option("lowerBound", str(lo))
                .option("upperBound", str(hi))
                .option("numPartitions", str(n or 8))
            )
        return r.load()

    def write(self, df: DataFrame, mode: str = "append") -> None:
        if self.table is None:
            raise ValueError("JDBC write requires table=")
        w = df.write.format("jdbc").option("url", self.url).option("dbtable", self.table)
        if self.driver:
            w = w.option("driver", self.driver)
        for k, v in self.options.items():
            w = w.option(k, v)
        w.mode(mode).save()

    # -- DML path (S5: UPDATE / upsert-MERGE, mysql_plugin.py:161-164) -----
    #
    # Spark's JDBC writer only appends/overwrites; the reference commits
    # UPDATE/DELETE through the same query path (cursor.description is None
    # -> commit). Here DML is explicit: ``execute`` runs one driver-side
    # statement; ``update``/``upsert`` fan the rows out with
    # ``foreachPartition`` — one DB connection and batched executemany per
    # partition, so a 1000-partition frame updates over 1000 parallel
    # connections instead of serializing through the driver. The connection
    # factory is injectable (the genai transport pattern), which is also
    # what makes the path unit-testable without a database.

    def _connection_factory(self):
        """Default factory: mysql-connector from the env-var config
        (mysql_plugin.py:66-76). Import-gated — the sandbox has no DB."""
        prefix = self.ENV_PREFIX

        def factory():
            try:
                import mysql.connector  # type: ignore
            except ImportError as exc:  # pragma: no cover - no driver here
                raise RuntimeError(
                    "mysql-connector not installed; pass connection_factory="
                ) from exc
            return mysql.connector.connect(
                host=os.environ.get(f"{prefix}HOST", "localhost"),
                port=int(os.environ.get(f"{prefix}PORT", "3306")),
                user=os.environ.get(f"{prefix}USER", ""),
                password=os.environ.get(f"{prefix}PASSWORD", ""),
                database=os.environ.get(f"{prefix}DATABASE", ""),
            )

        return factory

    def execute(self, sql: str, connection_factory=None) -> int:
        """Driver-side DML passthrough (one statement, commit) — the
        reference's execute_query branch for INSERT/UPDATE/DELETE. Returns
        the affected-row count when the driver reports one."""
        conn = (connection_factory or self._connection_factory())()
        try:
            cur = conn.cursor()
            cur.execute(sql)
            conn.commit()
            n = getattr(cur, "rowcount", -1)
            cur.close()
            return n
        finally:
            conn.close()

    def update(
        self,
        df: DataFrame,
        key_cols: list[str],
        value_cols: list[str],
        connection_factory=None,
        batch_size: int = 1000,
        dialect: str = "mysql",
    ) -> None:
        """Per-row UPDATE of ``value_cols`` keyed on ``key_cols``:
        ``UPDATE t SET v=%s WHERE k=%s`` via per-partition executemany."""
        if self.table is None:
            raise ValueError("JDBC update requires table=")
        sql = update_sql(self.table, key_cols, value_cols, dialect)
        param_cols = list(value_cols) + list(key_cols)
        factory = connection_factory or self._connection_factory()
        df.select(*key_cols, *value_cols).foreachPartition(
            lambda rows: run_dml_partition(rows, sql, param_cols, factory, batch_size)
        )

    def upsert(
        self,
        df: DataFrame,
        key_cols: list[str],
        value_cols: list[str],
        connection_factory=None,
        batch_size: int = 1000,
        dialect: str = "mysql",
    ) -> None:
        """MERGE-equivalent, per ``dialect``: MySQL ``INSERT ... ON
        DUPLICATE KEY UPDATE`` or sqlite ``ON CONFLICT ... DO UPDATE``
        (``key_cols`` must be the table's unique key)."""
        if self.table is None:
            raise ValueError("JDBC upsert requires table=")
        sql = upsert_sql(self.table, key_cols, value_cols, dialect)
        param_cols = list(key_cols) + list(value_cols)
        factory = connection_factory or self._connection_factory()
        df.select(*key_cols, *value_cols).foreachPartition(
            lambda rows: run_dml_partition(rows, sql, param_cols, factory, batch_size)
        )


def _check_identifier(name: str) -> str:
    """DML statements interpolate identifiers (placeholders only bind
    values); allow only plain [A-Za-z0-9_.] names to keep injection out."""
    if not name or not all(ch.isalnum() or ch in "_." for ch in name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


# placeholder per DB-API paramstyle: mysql-connector is pyformat (%s),
# sqlite3 is qmark (?). The sqlite dialect exists so the executor-side DML
# path can run end-to-end against a real in-process database in CI.
_PLACEHOLDER = {"mysql": "%s", "sqlite": "?"}


def _dialect_placeholder(dialect: str) -> str:
    if dialect not in _PLACEHOLDER:
        raise ValueError(
            f"unsupported DML dialect {dialect!r}; "
            f"supported: {sorted(_PLACEHOLDER)}"
        )
    return _PLACEHOLDER[dialect]


def update_sql(
    table: str, key_cols: list[str], value_cols: list[str], dialect: str = "mysql"
) -> str:
    """``UPDATE t SET v1=%s, ... WHERE k1=%s AND ...`` (placeholder per
    dialect paramstyle; mysql pyformat is what the reference uses)."""
    if not key_cols or not value_cols:
        raise ValueError("update_sql needs both key_cols and value_cols")
    ph = _dialect_placeholder(dialect)
    sets = ", ".join(f"{_check_identifier(c)} = {ph}" for c in value_cols)
    where = " AND ".join(f"{_check_identifier(c)} = {ph}" for c in key_cols)
    return f"UPDATE {_check_identifier(table)} SET {sets} WHERE {where}"


def upsert_sql(
    table: str, key_cols: list[str], value_cols: list[str], dialect: str = "mysql"
) -> str:
    """The MERGE: MySQL ``INSERT ... ON DUPLICATE KEY UPDATE`` /
    sqlite ``INSERT ... ON CONFLICT (keys) DO UPDATE SET``."""
    if not key_cols or not value_cols:
        raise ValueError("upsert_sql needs both key_cols and value_cols")
    cols = [_check_identifier(c) for c in list(key_cols) + list(value_cols)]
    ph = _dialect_placeholder(dialect)
    placeholders = ", ".join(ph for _ in cols)
    head = (
        f"INSERT INTO {_check_identifier(table)} ({', '.join(cols)}) "
        f"VALUES ({placeholders})"
    )
    if dialect == "mysql":
        updates = ", ".join(
            f"{c} = VALUES({c})" for c in map(_check_identifier, value_cols)
        )
        return f"{head} ON DUPLICATE KEY UPDATE {updates}"
    keys = ", ".join(_check_identifier(c) for c in key_cols)
    updates = ", ".join(
        f"{c} = excluded.{c}" for c in map(_check_identifier, value_cols)
    )
    return f"{head} ON CONFLICT ({keys}) DO UPDATE SET {updates}"


def run_dml_partition(
    rows, sql: str, param_cols: list[str], connection_factory, batch_size: int = 1000
) -> int:
    """Executor-side body of update/upsert: one connection per partition,
    executemany in ``batch_size`` chunks, single commit, close. Pure
    function of (rows, factory) so it unit-tests against a fake connection
    without a cluster or a database."""
    conn = connection_factory()
    n = 0
    try:
        cur = conn.cursor()
        batch: list[tuple] = []
        for row in rows:
            batch.append(tuple(row[c] for c in param_cols))
            if len(batch) >= batch_size:
                cur.executemany(sql, batch)
                n += len(batch)
                batch = []
        if batch:
            cur.executemany(sql, batch)
            n += len(batch)
        conn.commit()
        cur.close()
        return n
    finally:
        conn.close()


class SqlSource(Source):
    """Run a SQL string in Catalyst over the session's registered views —
    the Spark-native home of the reference's execute_query(native_sql)."""

    def __init__(self, query: str):
        self.query = query

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.sql(self.query)


class MemorySource(Source):
    """Pre-merged in-memory frame injection (EPC:50,109-112)."""

    def __init__(self, data: pd.DataFrame | list[dict] | DataFrame, schema: str | None = None):
        self.data = data
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        if isinstance(self.data, DataFrame):
            return self.data
        if self.schema:
            return spark.createDataFrame(self.data, self.schema)
        return spark.createDataFrame(self.data)


class TextSource(Source):
    """Line-oriented text source/sink (``spark.read.text``) — raw-corpus
    ingest before any structure exists (one line = one row, column
    ``value``; ``wholetext=True`` flips to one FILE per row for
    document-per-file layouts). The splittable line format is the 100 TB
    shape; whole-file rows are bounded by the largest single document.
    Writing requires exactly one string column (Spark's text-sink
    contract) — select/alias upstream."""

    def __init__(self, path: str, wholetext: bool = False,
                 line_sep: str | None = None):
        self.path = path
        self.wholetext = wholetext
        self.line_sep = line_sep

    def read(self, spark: SparkSession) -> DataFrame:
        # wholetext/lineSep must go through text()'s own parameters — the
        # generic .option("wholetext", ...) key is silently IGNORED by the
        # text reader (probed: option-form returned per-line rows)
        return spark.read.text(
            self.path, wholetext=self.wholetext, lineSep=self.line_sep
        )

    def write(self, df: DataFrame, mode: str = "append") -> None:
        df.write.mode(mode).text(self.path)


class BinaryFileSource(Source):
    """Raw-bytes file source (``binaryFile`` format) — the multimodal
    ingest front door: each file becomes ``[path, modificationTime,
    length, content binary]``, feeding the opaque-binary-column contract
    of operators/multimodal.py (header probe, payload near-dup, decode
    tiers) without any per-file driver loop. ``path_glob`` maps to
    ``pathGlobFilter`` (e.g. ``"*.png"``) so pruning happens at listing
    time, not after a full read. Read-only by Spark's own contract (no
    binaryFile writer exists); persist extracted frames as parquet with
    the binary column instead.

    100 TB note: millions of small files are a listing/driver-memory
    problem for ANY engine — compact small media into parquet-with-
    binary-column (this source is the ingest step that gets you there)
    and size ``spark.sql.files.maxPartitionBytes`` for the large ones.
    """

    def __init__(self, path: str, path_glob: str | None = None):
        self.path = path
        self.path_glob = path_glob

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("binaryFile")
        if self.path_glob:
            reader = reader.option("pathGlobFilter", self.path_glob)
        return reader.load(self.path)
