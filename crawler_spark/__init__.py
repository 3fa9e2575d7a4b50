"""crawler_spark — a PySpark-native crawl/analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference crawler (LexiconIndonesia/crawler): URL
canonicalization + dedup, content dedup (exact + simhash), a priority/politeness
frontier scheduler, pagination expansion, retry/DLQ routing, parse-to-spans
extraction, plus the large-scale training-data operators (MinHash-LSH dedup,
ANN similarity, text quality/language stats) that a 100 TB pipeline needs.

Layout:
    kernels/    pure-Python/numpy kernels (golden-tested vs the reference)
    functions/  Spark column expressions + vectorized pandas UDFs
    operators/  set-oriented DataFrame operators (dedup, frontier, similarity)
    sources/    deterministic fixture generators + the synthetic fetcher
    plans/      snapshot tables, robots, the frontier superstep engine
    streaming/  Structured Streaming variants
"""

__version__ = "0.1.0"
