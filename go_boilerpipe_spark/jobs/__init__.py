"""jobs package: spark-submit entry points."""
