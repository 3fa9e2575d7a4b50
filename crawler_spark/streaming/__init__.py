"""Structured Streaming surface: frontier ingest, windowed politeness
accounting, stateful per-host budget tracking."""
