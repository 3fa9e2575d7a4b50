"""Sources: deterministic crawl fixtures and the synthetic (no-network)
fetch layer used by the frontier engine and tests."""
