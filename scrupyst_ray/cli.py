"""Command-line entry points — the ``scrapy <command>`` analogue.

The reference's primary CLI is ``scrapy crawl <spider>``
(``scrapy/cmdline.py`` → ``scrapy/commands/crawl.py:21-33``); its other
first-party commands are ``bench`` (``commands/bench.py``) and inspection
helpers.  Here a "spider" is a (page-store, seed-list, CrawlConfig) triple,
so the CLI surface is:

    python -m scrupyst_ray crawl  --pages DIR --seeds FILE --workdir DIR ...
    python -m scrupyst_ray export --workdir DIR --format jsonl -o OUT
    python -m scrupyst_ray stats  --workdir DIR

``crawl`` runs (or resumes — the workdir IS the JOBDIR) a crawl and prints
per-round stats; ``export`` feeds the crawl artifact through the feed-export
sink (S4); ``stats`` pretty-prints the committed round manifests.

This module owns a Ray session (scripts only — library code never calls
``ray.init``, per the repo contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--budget", type=int, default=8,
                   help="per-host fetches per round (CONCURRENT_REQUESTS_PER_DOMAIN)")
    p.add_argument("--download-delay", type=float, default=0.0)
    p.add_argument("--depth-limit", type=int, default=0)
    p.add_argument("--no-robots", action="store_true",
                   help="disable robots.txt obedience (ROBOTSTXT_OBEY=False)")
    p.add_argument("--allowed-domains", nargs="*", default=[])
    p.add_argument("--autothrottle", action="store_true")
    p.add_argument("--closespider-pagecount", type=int, default=0)
    p.add_argument("--max-rounds", type=int, default=0)
    p.add_argument("--seen-shards", type=int, default=16)
    p.add_argument("--fetch-buckets", type=int, default=16)
    p.add_argument("--max-round-candidates", type=int, default=1_000_000)


def _config_from_args(args) -> "CrawlConfig":
    from scrupyst_ray.config import CrawlConfig

    return CrawlConfig(
        concurrent_requests_per_domain=args.budget,
        download_delay=args.download_delay,
        depth_limit=args.depth_limit,
        robotstxt_obey=not args.no_robots,
        allowed_domains=list(args.allowed_domains),
        autothrottle_enabled=args.autothrottle,
        closespider_pagecount=args.closespider_pagecount,
        max_rounds=args.max_rounds,
        seen_shards=args.seen_shards,
        fetch_buckets=args.fetch_buckets,
        max_round_candidates=args.max_round_candidates,
    )


def cmd_crawl(args) -> int:
    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from scrupyst_ray.pipelines.crawl import CrawlEngine

    cfg = _config_from_args(args)
    if args.seeds and args.seeds_from_sitemaps:
        # the frontier init is idempotent, so the second call would be a
        # silent no-op — refuse instead of ignoring --seeds (ADVICE r1)
        print(
            "error: --seeds and --seeds-from-sitemaps are mutually "
            "exclusive (the frontier is initialized once)",
            file=sys.stderr,
        )
        if owns_session:
            ray.shutdown()
        return 2
    eng = CrawlEngine.for_corpus(args.pages, args.workdir, cfg,
                                 store_dir=args.store_dir)

    def _derived_seeds(path: str, spec: str, build) -> str:
        """Build (or reuse) a derived seed parquet; a sidecar records the
        source spec so a rerun with different seed args rebuilds instead of
        silently crawling the old list (ADVICE r1)."""
        sidecar = path + ".src"
        if not (
            os.path.exists(path)
            and os.path.exists(sidecar)
            and open(sidecar).read() == spec
        ):
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.concat_tables([ray.get(r) for r in build().to_arrow_refs()])
            pq.write_table(tbl, path + ".tmp")
            os.replace(path + ".tmp", path)
            with open(sidecar + ".tmp", "w") as f:
                f.write(spec)
            os.replace(sidecar + ".tmp", sidecar)
        return path

    if args.seeds_from_sitemaps:
        from scrupyst_ray.sources.sitemap_seeds import seeds_from_sitemaps

        spec = (
            f"sitemaps={args.seeds_from_sitemaps!r} "
            f"follow={args.sitemap_follow!r} rules={args.sitemap_rules!r}"
        )
        smp = _derived_seeds(
            os.path.join(args.workdir, "seeds.sitemap.parquet"),
            spec,
            lambda: seeds_from_sitemaps(
                args.pages,
                args.seeds_from_sitemaps,
                follow=args.sitemap_follow,
                rules=args.sitemap_rules,
            ),
        )
        eng.init_frontier(smp)
    if args.seeds:
        seeds_path = args.seeds
        if not seeds_path.endswith(".parquet"):
            # csv / jsonl seed lists go through the reader registry (S2) and
            # land as a parquet file the engine's idempotent init consumes
            from scrupyst_ray.sources.readers import read_seeds

            seeds_path = _derived_seeds(
                os.path.join(args.workdir, "seeds.norm.parquet"),
                f"seeds={args.seeds!r} mtime={os.path.getmtime(args.seeds)}",
                lambda: read_seeds(args.seeds),
            )
        eng.init_frontier(seeds_path)
    res = eng.run(max_rounds=args.max_rounds or None)
    eng.shutdown_actors()
    for r in res.rounds:
        print(json.dumps({"round": r.round, "fetched": r.fetched,
                          "admitted": r.admitted, "deferred": r.deferred,
                          "wall_s": round(r.wall_s, 2)}))
    print(json.dumps({"total_fetched": res.total_fetched,
                      "rounds": len(res.rounds),
                      "stopped": res.stopped_reason}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_export(args) -> int:
    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from scrupyst_ray.pipelines.crawl import CrawlResult
    from scrupyst_ray.stages.export import export_dataset

    res = CrawlResult(args.workdir, [], "")
    ds = res.fetched_dataset()
    export_dataset(ds, args.output, fmt=args.format, fields=args.fields)
    print(json.dumps({"output": args.output, "format": args.format}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Run the composed training-data curation pipeline (quality gate →
    exact dedup → Jaccard near-dedup → decontamination) over a documents
    table and write the survivors through the resumable partition-per-source
    sink; prints the funnel as JSON."""
    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from scrupyst_ray.pipelines.curation import curate_corpus

    funnel, _ = curate_corpus(
        args.sf_dir,
        out_dir=args.output,
        min_tokens=args.min_tokens,
        neardup_threshold=args.neardup_threshold,
    )
    print(json.dumps({"funnel": dict(funnel), "output": args.output}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    rounds_dir = os.path.join(args.workdir, "rounds")
    if not os.path.isdir(rounds_dir):
        print(f"no rounds under {args.workdir}", file=sys.stderr)
        return 1
    for d in sorted(os.listdir(rounds_dir)):
        mp = os.path.join(rounds_dir, d, "MANIFEST.json")
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            print(json.dumps(m["stats"]))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="scrupyst_ray")
    sub = ap.add_subparsers(dest="command", required=True)

    c = sub.add_parser("crawl", help="run or resume a crawl over a page table")
    c.add_argument("--pages", required=True,
                   help="parquet page table (url, warc_ts, html[, text, lang])")
    c.add_argument("--seeds", default=None,
                   help="seed list (parquet/csv/jsonl with a url column); "
                        "omit when resuming an existing workdir")
    c.add_argument("--seeds-from-sitemaps", nargs="*", default=None,
                   metavar="URL",
                   help="seed from sitemap documents in the page table "
                        "(robots.txt urls contribute their Sitemap: lines) — "
                        "the SitemapSpider start path")
    c.add_argument("--sitemap-follow", nargs="*", default=None,
                   help="regexes choosing which sitemapindex entries to "
                        "follow (default: all)")
    c.add_argument("--sitemap-rules", nargs="*", default=None,
                   help="url regexes choosing which urlset entries seed "
                        "(default: all)")
    c.add_argument("--workdir", required=True,
                   help="checkpoint dir (reference JOBDIR); reuse to resume")
    c.add_argument("--store-dir", default=None,
                   help="bucketed page-store dir (default: alongside workdir)")
    _add_config_args(c)
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("export", help="export the crawl artifact (feed export)")
    e.add_argument("--workdir", required=True)
    e.add_argument("--output", "-o", required=True)
    e.add_argument("--format", default="jsonl",
                   choices=["jsonl", "json", "csv", "xml", "parquet"])
    e.add_argument("--fields", nargs="*", default=None)
    e.set_defaults(fn=cmd_export)

    s = sub.add_parser("stats", help="print committed round manifests")
    s.add_argument("--workdir", required=True)
    s.set_defaults(fn=cmd_stats)

    cu = sub.add_parser(
        "curate",
        help="composed training-data curation over a documents table "
             "(gate → dedup → near-dedup → decontaminate → partitioned sink)",
    )
    cu.add_argument("--sf-dir", required=True,
                    help="directory holding documents.parquet")
    cu.add_argument("--output", "-o", required=True,
                    help="resumable partition-per-source output dir")
    cu.add_argument("--min-tokens", type=int, default=15)
    cu.add_argument("--neardup-threshold", type=float, default=0.4)
    cu.set_defaults(fn=cmd_curate)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
