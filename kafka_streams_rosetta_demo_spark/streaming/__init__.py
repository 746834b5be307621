"""Structured Streaming layer (filled in a later milestone)."""
