"""Query-runner CLI surface: list, execute to parquet, head printing."""

import pyarrow.parquet as pq

from opps_feedcrawler_ray.pipelines.runner import main

SF = "/root/testdata/sf0.001"


def test_runner_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "source_stats" in out and "doc_md5" in out
    assert len(out) > 200
    assert out == sorted(out)


def test_runner_unknown_query(capsys):
    assert main(["definitely_not_a_query", "--sf-dir", SF]) == 2


def test_runner_writes_parquet(ray_session, tmp_path, capsys):
    out = str(tmp_path / "res.parquet")
    assert main(["source_stats", "--sf-dir", SF, "--out", out]) == 0
    t = pq.read_table(out)
    assert t.num_rows == 20
    assert "source" in t.column_names


def test_runner_prints_head(ray_session, capsys):
    assert main(["doc_md5", "--sf-dir", SF, "--head", "3"]) == 0
    printed = capsys.readouterr().out
    assert "md5" in printed
