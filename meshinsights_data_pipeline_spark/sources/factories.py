"""Concrete sources: parquet, CSV, JDBC (read+write), SQL-over-views, memory.

Reference parity:
- ParquetSource: the testdata scan path (TESTDATA.md); replaces the ADX scan
  for this engine's correctness substrate (SURVEY §2.1 S1/S2).
- CsvSource: OPS:537-552 CSVDataLoader day-1 path (S9).
- JdbcSource: MySQL scan/sink (S3/S4/S5/S6, src/plugins/mysql_plugin.py).
  Env-var config preserved (mysql_plugin.py:66-76): MYSQL_HOST/PORT/USER/
  PASSWORD/DATABASE. Full-query pushdown via the ``query`` option; writes
  via df.write.jdbc. Engine-level retry is intentionally absent — Spark task
  retry + JDBC driver options cover it (SURVEY §2.13 D7).
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
