"""Deterministic per-document kernels (pure NumPy / pure Python).

These are the batch-local building blocks that run inside
``applyInPandas`` / ``mapInPandas`` stages; nothing in this package
imports pyspark.
"""
