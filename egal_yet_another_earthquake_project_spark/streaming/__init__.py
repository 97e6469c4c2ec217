"""Structured Streaming layer (SURVEY §2.9): bronze archival, silver
typed/deduped streams, trailing-window views."""
