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
from motorway_spark.queries import sampling  # noqa: F401,E402
from motorway_spark.queries import tpch_extra  # noqa: F401,E402
from motorway_spark.queries import joins  # noqa: F401,E402
from motorway_spark.queries import relational  # noqa: F401,E402
from motorway_spark.queries import windows  # noqa: F401,E402

# Explicit sweep priority (round 3). The driver's per-round correctness
# budget is ~50 queries, taken in registration order, so module import
# order alone no longer expresses the right priority: after two rounds,
# 35 queries have never had a driver CORRECTNESS row and 4 recorded a
# failure whose fix is in code but unverified. Those sweep FIRST, in
# this order; everything already driver-green keeps its relative order
# after them.
_SWEEP_PRIORITY = [
    # -- never driver-verified (r1+r2): the whole streaming family --
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
    "stream_filter_route",
    "stream_stateful_user_totals",
    "stream_stateful_user_totals_tws",
    "stream_static_enrich",
    "stream_kafka_topic_agg",
    "stream_longpoll_agg",
    "stream_stream_join",
    "stream_topk_heavy_hitters",
    "stream_scd2_current",
    # -- never verified: non-parquet scans --
    "scan_csv",
    "scan_json",
    "scan_orc",
    "scan_csv_corrupt",
    # -- never verified: set-op variants --
    "set_intersect_all",
    "set_except_all",
    "distinct_rows",
    "drop_duplicates_subset",
    # -- never verified: TPC-H subquery shapes --
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    "q16_parts_supplier",
    "q17_small_quantity",
    "q20_dominant_supplier",
    "q21_waiting_supplier",
    # -- never verified: SQL-surface + skew + agg/fn stragglers --
    "sql_api_recursive_cte",
    "sql_api_lateral_topn",
    "join_salted_skew",
    "agg_grouping_sets",
    "agg_percentile_approx",
    "fn_null_semantics",
    "fn_bitwise",
    "fn_url",
    # -- recorded FAIL/ERR with the fix in code: must re-verify --
    "sessionize_native",
    "fn_math",
    "pivot_status_by_priority",
    "asof_join",
    # -- new in round 3 (never had a driver row): sampling/packing
    # family, capped LSH, quantization, composite pipeline --
    "sample_stratified_exact",
    "split_train_test",
    "balance_classes",
    "pack_sequences",
    "dedup_minhash_capped",
    "embedding_quantize_int8",
    "pipeline_pretraining_mix",
    # -- formerly-vacuous date windows, now non-empty: re-confirm
    # (already have an r1 row, so these rank behind never-seen work) --
    "q5_local_supplier",
    "q9_profit",
    "q10_returned_items",
    "q12_shipmode_buckets",
    "q22_acctbal_subquery",
]


def _reorder_for_sweep() -> None:
    ordered = {n: QUERIES[n] for n in _SWEEP_PRIORITY if n in QUERIES}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


_reorder_for_sweep()

__all__ = ["QUERIES", "ORACLES", "query", "get_queries", "get_oracles"]
