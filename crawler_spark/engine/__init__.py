"""Frontier superstep engine: snapshot store, crawl rounds, fixture corpus,
reference simulator (SURVEY.md §7 M2/M3/M6)."""
