"""CLI surface: list / run / sql."""

from __future__ import annotations

import json

from frinesis_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "agg_group_sum" in names and len(names) >= 60


def test_cli_run(capsys, sf_dir):
    assert main(["--sf-dir", sf_dir, "--limit", "3", "run", "sort_limit"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    assert "o_totalprice" in json.loads(lines[0])


def test_cli_run_unknown(capsys):
    assert main(["run", "nope_not_a_query"]) == 2


def test_cli_sql(capsys, sf_dir):
    code = main(
        ["--sf-dir", sf_dir, "sql", "SELECT COUNT(*) AS n FROM nation"]
    )
    assert code == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n"] == 25
