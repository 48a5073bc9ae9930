"""Relational operators of the crawl engine: frontier pop (priority
queue), dedup family, similarity search, stats aggregations."""
