"""Job-level plans (the reference's pipeline, Spark-first)."""
