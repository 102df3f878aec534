"""Source ABC — the engine's data-access contract.

Reference parity: DBConnector ABC (src/plugins/base.py:4-58) defined
connect/disconnect/execute_query/is_connected plus context-manager support.
In a Spark-native engine the connection lifecycle belongs to the
SparkSession and the data-source options, so the contract shrinks to
``read(spark) -> DataFrame`` (lazy) plus an optional ``write``. The
native-query-passthrough idiom (the reference pushes whole KQL/SQL strings
to the remote engine, src/plugins/README.md:33-39) survives two ways:
- SqlSource: the query body runs in Catalyst over registered views;
- JdbcSource(query=...): the query body is pushed down to the remote RDBMS
  verbatim via the JDBC ``query`` option — the same full-pushdown semantics.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class Source(ABC):
    """A lazily-readable table source. Stateless; options at construction."""

    @abstractmethod
    def read(self, spark: SparkSession) -> DataFrame:
        """Return a lazy DataFrame for this source."""

    def write(self, df: DataFrame, mode: str = "append") -> None:
        """Optional sink path (S5/S6). Default: unsupported."""
        raise NotImplementedError(f"{type(self).__name__} is read-only")

    # Context-manager parity with DBConnector (base.py:51-58); no-ops here
    # because Spark owns connection lifecycle.
    def __enter__(self) -> "Source":
        return self

    def __exit__(self, *exc) -> None:
        return None
