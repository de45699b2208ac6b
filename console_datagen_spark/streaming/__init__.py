"""Structured Streaming surface: generator stream, counters, health."""
