"""Physical-plan guardrails: reject plans that won't survive a cluster.

A 100 TB deployment dies from a handful of recognizable plan shapes —
an accidental cartesian product, a row-at-a-time Python UDF in the hot
path, a scan that reads every column for a two-column projection. The
repo's test suite asserts these properties per query
(tests/test_plan_audit.py); this module makes the same checks available
AT RUNTIME as a pre-flight gate, so a pipeline can refuse to launch a
query whose plan regressed (e.g. after a schema change broke a join
key and Catalyst silently fell back to a nested loop).

Reference analogue: motorway has no planner and therefore no plan
checks — its per-message crash isolation (/root/reference/motorway/
intersection.py:135-143) catches bad RECORDS at runtime; this catches
bad PLANS before any record is read.

Usage::

    from motorway_spark.planguard import audit_plan, assert_plan_safe

    report = audit_plan(df)           # inspect
    assert_plan_safe(df)              # raise PlanGuardError on violation

All checks read Spark's own explain output (the pre-execution physical
plan); nothing is executed and no data is read.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Row-at-a-time Python evaluation (BatchEvalPython) is the ~10-100x
# slow path vs Arrow-vectorized (ArrowEvalPython / pandas UDFs); at
# 100 TB it is effectively an outage.
_ROW_UDF_NODE = "BatchEvalPython"
_CARTESIAN_NODE = "CartesianProduct"
_NESTED_LOOP_NODE = "BroadcastNestedLoopJoin"


@dataclass
class GuardReport:
    """Outcome of a plan audit: violations are fatal under
    ``assert_plan_safe``; warnings are informational."""

    violations: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    plan: str = ""

    @property
    def ok(self) -> bool:
        return not self.violations


class PlanGuardError(RuntimeError):
    """A guarded query's physical plan contains a forbidden shape."""

    def __init__(self, report: GuardReport):
        self.report = report
        super().__init__(
            "plan guard rejected the query:\n- "
            + "\n- ".join(report.violations)
        )


def _formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _count_top_level_fields(inner: str) -> int:
    """Top-level field count of a ``struct<...>`` body: commas inside
    nested ``struct<>``/``array<>``/``map<>`` type arguments don't
    separate scan columns, so count only depth-0 commas.  Spark may
    truncate long schemas to ``a:int,b:int, ... N more fields`` — fold
    the announced remainder back in."""
    if not inner:
        return 0
    # split into TOP-LEVEL segments (depth-0 commas only): commas and
    # truncation markers inside nested struct/array/map type arguments
    # must not count toward the scan's width
    depth = 0
    segments: list[str] = []
    start = 0
    for i, ch in enumerate(inner):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            segments.append(inner[start:i])
            start = i + 1
    segments.append(inner[start:])
    n = len(segments)
    for seg in segments:
        more = re.fullmatch(r"\s*\.\.\.\s*(\d+)\s+more fields?\s*", seg)
        if more:
            # this segment IS the truncation marker: it stands for N
            # fields, and was counted as one segment above
            n += int(more.group(1)) - 1
    return n


def _read_schema_widths(plan: str) -> list[tuple[int, str]]:
    """(column_count, line) per scan's ReadSchema entry."""
    out = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            out.append((_count_top_level_fields(inner), line))
    return out


def audit_plan(
    df: DataFrame,
    *,
    allow_nested_loop: bool = False,
    allow_row_udf: bool = False,
    max_scan_columns: int | None = None,
) -> GuardReport:
    """Inspect ``df``'s physical plan (no execution) and report
    cluster-hostile shapes.

    - ``CartesianProduct`` is always a violation: the O(n²) exchange no
      cluster survives. (An explicitly broadcast nested loop over a tiny
      side is a different node and allowed unless ``allow_nested_loop``
      is left False and one appears — then it's a violation too, since
      an UNINTENDED nested loop is usually a dropped join key.)
    - ``BatchEvalPython`` (row-at-a-time Python UDF) is a violation
      unless ``allow_row_udf``: the vectorized Arrow path exists for
      every UDF shape this engine ships.
    - ``max_scan_columns``: any scan whose ReadSchema is wider than this
      is a violation — a projection that defeated column pruning.
    """
    report = GuardReport(plan=_formatted_plan(df))
    plan = report.plan

    if _CARTESIAN_NODE in plan:
        report.violations.append(
            f"{_CARTESIAN_NODE}: O(n^2) join — add/repair an equality key "
            "or broadcast the small side explicitly"
        )
    if _NESTED_LOOP_NODE in plan and not allow_nested_loop:
        report.violations.append(
            f"{_NESTED_LOOP_NODE}: non-equi or keyless join fell back to a "
            "nested loop — pass allow_nested_loop=True only if the "
            "broadcast side is provably tiny"
        )
    if _ROW_UDF_NODE in plan and not allow_row_udf:
        report.violations.append(
            f"{_ROW_UDF_NODE}: row-at-a-time Python UDF in the plan — "
            "use a pandas_udf / applyInPandas (Arrow) form"
        )
    if max_scan_columns is not None:
        for n, line in _read_schema_widths(plan):
            if n > max_scan_columns:
                report.violations.append(
                    f"scan reads {n} columns (> {max_scan_columns}): column "
                    f"pruning defeated — {line[:120]}"
                )
    return report


def assert_plan_safe(df: DataFrame, **kwargs) -> GuardReport:
    """``audit_plan`` that raises :class:`PlanGuardError` on violation;
    returns the (clean) report otherwise so callers can log it."""
    report = audit_plan(df, **kwargs)
    if not report.ok:
        raise PlanGuardError(report)
    return report
