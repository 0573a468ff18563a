"""Query registry: the engine's declared operator surface (SURVEY.md §2b).

Every operator the engine claims is registered here as a named query —
a ``(spark, sf_dir) -> DataFrame`` callable — optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
The driver hash-compares the two at sf0.01; that pair IS the correctness
contract for the operator.

Import side effects: importing this package loads every query module so
the registry is fully populated.
"""

from motorway_spark.queries.registry import QUERIES, ORACLES, query, get_queries, get_oracles

# Populate the registry.
#
# ORDER MATTERS: the driver's correctness sweep runs queries in
# registration order under a global budget (round 1 stopped at entry 50,
# leaving everything after setops unverified).  Families that have never
# had a driver CORRECTNESS row therefore register FIRST; the families
# already verified green in round 1 (relational, tpch_extra, joins,
# windows) register LAST.
from motorway_spark.queries import timeseries  # noqa: F401,E402
from motorway_spark.queries import profiling  # noqa: F401,E402
from motorway_spark.queries import dedup  # noqa: F401,E402
from motorway_spark.queries import pipelines  # noqa: F401,E402
from motorway_spark.queries import similarity  # noqa: F401,E402
from motorway_spark.queries import text  # noqa: F401,E402
from motorway_spark.queries import multimodal  # noqa: F401,E402
from motorway_spark.queries import udfs  # noqa: F401,E402
from motorway_spark.queries import scalar_functions  # noqa: F401,E402
from motorway_spark.queries import scans  # noqa: F401,E402
from motorway_spark.queries import streaming_queries  # noqa: F401,E402
from motorway_spark.queries import setops  # noqa: F401,E402
# tpch_extra/joins before relational/windows: they carry this round's new
# entries (q11/q13/q16/q20, recursive CTE, lateral, salted join), which
# should sweep before families that are fully green already.
from motorway_spark.queries import tpch_extra  # noqa: F401,E402
from motorway_spark.queries import joins  # noqa: F401,E402
from motorway_spark.queries import relational  # noqa: F401,E402
from motorway_spark.queries import windows  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLES", "query", "get_queries", "get_oracles"]
