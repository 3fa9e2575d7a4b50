"""Pure kernels: no Spark imports here.

Every kernel is golden-tested against the observed behavior of the reference
implementation (values minted by running the reference's pure modules, see
tests/). The Spark layer wraps these in vectorized pandas UDFs or re-expresses
them as built-in column expressions.
"""
