"""Registry of driver-checkable queries.

Every implemented operator from SURVEY.md §2 gets a named entry here: a
callable ``(spark, sf_dir) -> DataFrame`` plus (for deterministic operators)
an equivalent DuckDB SQL string the driver runs side-by-side as a
correctness oracle. Approximate / nondeterministic operators (k-means
derived, ANN) register with ``oracle=None`` → rows-only check, with recall
assertions living in ``tests/``.

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL (the driver hash compares columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# import for side effect: populate the registry
from vector_db_spark.queries import vector  # noqa: E402,F401

try:
    from vector_db_spark.queries import relational  # noqa: E402,F401
except ImportError:  # phase 1+
    pass
try:
    from vector_db_spark.queries import text  # noqa: E402,F401
except ImportError:  # phase 4+
    pass
try:
    from vector_db_spark.queries import indexing  # noqa: E402,F401
except ImportError:  # phase 2/3+
    pass
try:
    from vector_db_spark.queries import pquant  # noqa: E402,F401
except ImportError:  # phase 3+
    pass
try:
    from vector_db_spark.queries import stream  # noqa: E402,F401
except ImportError:  # phase 5+
    pass
try:
    from vector_db_spark.queries import multimodal  # noqa: E402,F401
except ImportError:  # phase 4+
    pass
