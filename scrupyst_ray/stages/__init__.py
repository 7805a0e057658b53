"""Stateless batch transforms (Arrow in/out) composing the crawl pipeline."""
