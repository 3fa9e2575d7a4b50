"""Spark-side function layer: vectorized pandas UDFs for the kernels that need
Python (urllib quirks, md5-vote simhash, HTML parsing) and pure column-expression
builders for everything Catalyst can codegen (scores, classification, backoff,
hamming, text stats)."""
