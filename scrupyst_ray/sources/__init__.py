"""Sources: synthetic Common-Crawl-style corpus generator + parquet readers."""
