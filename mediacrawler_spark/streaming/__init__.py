"""Structured Streaming variants of the crawl engine's incremental ops."""
