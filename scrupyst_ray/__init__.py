"""scrupyst_ray — a Ray-Data-native crawl/frontier engine.

A from-scratch rebuild of the data-processing capabilities of the reference
engine (NotBadCrawler/scrupyst, a Scrapy fork) on top of ``ray.data``:

- columnar frontier / page / edge tables (Arrow) instead of per-object flow,
- stateless vectorized kernels inside ``map_batches`` (fingerprinting, text
  extraction, link extraction, filters),
- host-sharded stateful actors for the URL-seen set (bloom + exact) and
  politeness (token bucket + robots cache),
- an iterative superstep driver (one Ray Data pipeline per frontier round)
  with per-round Parquet checkpoints and exact resume.

Nothing is imported from the reference; semantics are reimplemented from its
observed behavior (file:line citations in each module's docstring) and from
the public w3lib / Scrapy / RFC 9309 documentation.
"""

__version__ = "0.1.0"
