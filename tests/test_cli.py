"""CLI surface (SURVEY §3.1: the `scrapy crawl` analogue)."""

from __future__ import annotations

import json
import os

import pytest

from scrupyst_ray.cli import build_parser, cmd_export, cmd_stats


@pytest.mark.usefixtures("ray_session")
def test_crawl_export_stats_roundtrip(smoke_corpus, tmp_path, capsys):
    ap = build_parser()
    wd = str(tmp_path / "cliwd")
    args = ap.parse_args(
        [
            "crawl",
            "--pages", os.path.join(smoke_corpus, "pages"),
            "--seeds", os.path.join(smoke_corpus, "seeds.parquet"),
            "--workdir", wd,
            "--budget", "4",
            "--seen-shards", "4",
            "--fetch-buckets", "4",
            "--max-rounds", "3",
        ]
    )
    # cmd_crawl calls ray.shutdown() — run its body against the session
    # fixture instead by invoking the engine path via the parsed args
    from scrupyst_ray.cli import _config_from_args
    from scrupyst_ray.pipelines.crawl import CrawlEngine

    cfg = _config_from_args(args)
    eng = CrawlEngine.for_corpus(args.pages, args.workdir, cfg)
    eng.init_frontier(args.seeds)
    res = eng.run(max_rounds=3)
    eng.shutdown_actors()
    assert res.total_fetched > 0

    # stats subcommand prints one JSON object per committed round
    rc = cmd_stats(ap.parse_args(["stats", "--workdir", wd]))
    assert rc == 0
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 3
    assert sum(r["fetched"] for r in lines) == res.total_fetched

    # export subcommand feeds the artifact through the S4 sink
    out = str(tmp_path / "feed")
    rc = cmd_export(
        ap.parse_args(
            ["export", "--workdir", wd, "-o", out, "--format", "jsonl"]
        )
    )
    assert rc == 0
    files = [f for f in os.listdir(out)] if os.path.isdir(out) else [out]
    assert files
    hits = 0
    first = None
    for f in files:
        p = os.path.join(out, f) if os.path.isdir(out) else f
        with open(p) as fh:
            for line in fh:
                row = json.loads(line)
                if first is None:
                    first = row
                # artifact carries fetch-miss (404) rows too; fetched counts
                # only the 200s
                if row["status"] == 200:
                    hits += 1
    assert hits == res.total_fetched
    assert "url" in first and "status" in first
    assert isinstance(first["fp"], str)  # binary exports as hex in jsonl


def test_missing_subcommand_errors():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_stats_on_missing_workdir(tmp_path, capsys):
    rc = cmd_stats(build_parser().parse_args(["stats", "--workdir", str(tmp_path / "nope")]))
    assert rc == 1
