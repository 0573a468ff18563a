"""CLI surface: ``python -m motorway_spark`` list/run/explain/check.

The reference is driven from shell scripts around examples/app.py; the
engine's equivalent operational surface must stay importable and
argument-stable.
"""

from __future__ import annotations

from motorway_spark.__main__ import main

from tests.conftest import SF_SMOKE


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out
    assert "oracle-paired" in out
    # oracle-paired entries are starred, rows-only are not
    assert "* dedup_exact" in out
    assert "  agg_approx_distinct" in out


def test_cli_unknown_name_is_error(capsys):
    assert main(["run", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_run_and_explain(spark, capsys):
    assert main(["--sf-dir", SF_SMOKE, "run", "filter_project", "--show", "3"]) == 0
    out = capsys.readouterr().out
    assert "== filter_project ==" in out
    assert main(["--sf-dir", SF_SMOKE, "explain", "filter_project"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_cli_check(spark, capsys):
    assert main(["--sf-dir", SF_SMOKE, "check", "dedup_exact"]) == 0
    out = capsys.readouterr().out
    assert "ok   dedup_exact" in out


def test_cli_sql_over_manifest_table(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from motorway_spark.sinks import UpsertParquetSink

    d = str(tmp_path / "clitab")
    s = UpsertParquetSink(spark, d, key_cols=["k"], num_buckets=2)
    s.upsert_batch(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        batch_id=0,
    )
    assert (
        main(
            [
                "--sf-dir",
                SF_SMOKE,
                "sql",
                "SELECT COUNT(*) AS n, SUM(v) AS sv FROM mytab WHERE k >= 3",
                "--table",
                f"mytab={d}",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "7" in out and "84" in out
    # malformed spec is a usage error, not a crash
    assert main(["sql", "SELECT 1", "--table", "nodir"]) == 2
