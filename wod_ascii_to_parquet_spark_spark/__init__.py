"""wod_ascii_to_parquet_spark_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``CI-CMG/wod-ascii-to-parquet-spark`` (a Java/Spark WOD
ASCII→GeoParquet converter), rebuilt Spark-first:

- All relational capability (scans, filters, joins, aggregations, windows,
  sorts, set ops, scalar functions) is expressed with the DataFrame/SQL API
  so Catalyst/Tungsten/AQE pick the physical plan.
- The WOD fixed-width ASCII parse — driver-side in the reference
  (``DatasetYearTrain.java:141-209``) — is a distributed ``mapPartitions``
  record-assembly source here (``sources/wod_ascii.py``).
- Geohash (external lib + Sedona in the reference) is a vectorized
  numpy/pandas UDF plus a pure-Column variant (``functions/geohash.py``).
- The partitioned sorted GeoParquet write (``DatasetYearTrain.java:128-139``)
  is ``repartition(geohash3) → sortWithinPartitions(geohash) →
  write.partitionBy(geohash3)`` (``plans/convert.py``) — the reference's dead
  global sort is intentionally omitted.
- LLM-data-pipeline operators (dedup families, similarity search, text
  analysis, multimodal plumbing) are first-class (``operators/``).

Every public operator is registered in ``registry.py`` with a DuckDB oracle
SQL string where SQL-expressible; ``/root/repo/__spark_entry__.py`` exposes
them to the correctness driver.
"""

__version__ = "0.1.0"
