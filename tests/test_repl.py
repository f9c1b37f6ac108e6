"""REPL coverage (the raft-cli analog, reference src/raftcli.c): the
-c one-shot path, multi-statement splitting (incl. semicolons inside
quoted literals), table formatting, and the error exit code — driven
through main(argv) in-process so the suite's shared JVM is reused
rather than forking a second SparkSession per test."""

from __future__ import annotations

import raft_c_spark.repl as repl


def test_format_rows_empty_and_truncation(spark):
    from pyspark.sql import Row

    assert repl.format_rows([]) == "(empty set)"
    rows = [Row(a=i, b="x" * (i % 3)) for i in range(50)]
    out = repl.format_rows(rows, max_rows=40)
    assert "... (10 more rows)" in out
    assert out.splitlines()[0].split() == ["a", "b"]


def test_one_shot_command_path(spark, tmp_path, capsys, monkeypatch):
    # reuse the suite's SparkSession: getOrCreate inside repl.main
    # returns the active one, and stop() must not kill it for later
    # tests — stub it out.
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.stop", lambda self: None
    )
    base = 1_700_000_000_000_000_000
    rc = repl.main(
        [
            "--warehouse",
            str(tmp_path / "replwh"),
            "-c",
            "CREATEDB r; USE r; CREATE s;"
            f"INSERT INTO s VALUES ({base}, 1.5), ({base + 1}, 2.5);"
            "SELECT avg(value) FROM s",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "2.0" in out  # avg(1.5, 2.5)


def test_one_shot_error_sets_exit_code(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.stop", lambda self: None
    )
    rc = repl.main(
        ["--warehouse", str(tmp_path / "replwh2"), "-c", "SELECT value FROM ghost"]
    )
    err = capsys.readouterr().err
    assert rc == 1
    assert "error:" in err


def test_statement_split_respects_quotes(spark, tmp_path, capsys, monkeypatch):
    """A ';' inside a quoted literal must not split the statement —
    CREATE with a dup-policy literal parses as ONE statement."""
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.stop", lambda self: None
    )
    rc = repl.main(
        [
            "--warehouse",
            str(tmp_path / "replwh3"),
            "-c",
            "CREATEDB q; USE q; CREATE t 7d 'ignore'",
        ]
    )
    assert rc == 0
