"""Structured Streaming surfaces of the engine (SURVEY.md §2.8)."""
