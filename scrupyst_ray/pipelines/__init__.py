"""End-to-end Ray Data pipelines: the crawl superstep engine plus the
training-data operators (dedup, similarity, text analysis)."""
