"""Spark-facing layer: session helpers, the distributed extraction job,
checkpointed writes, and the testdata adapter."""
