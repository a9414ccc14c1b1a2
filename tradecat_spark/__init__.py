"""tradecat_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tukuaiai/tradecat (see SURVEY.md).

Layout
------
- ``session``    : tuned SparkSession builders (local test / bench profiles)
- ``catalog``    : loaders for the driver's parquet test tables
- ``operators/`` : relational + time-series operators (rollups, latest-per-
                   group, gaps, as-of joins, upsert-merge, dedup, similarity,
                   text analysis)
- ``functions/`` : column-level function library (EWM folds, TA indicators)
- ``indicators/``: the registered indicator surface (reference §2.9 parity)
- ``signals/``   : declarative rule compiler (reference §2.10 parity)
- ``streaming/`` : Structured Streaming ingest / rollup / signal engines
- ``plans/``     : the declared query registry consumed by __spark_entry__

Everything is DataFrame-first: logical plans are declared via the DataFrame
API and Catalyst picks the physical strategy. Python executes only inside
Arrow-batched ``applyInPandas`` groups where the semantics are genuinely
recursive (EWM/Wilder families, path-dependent indicators).
"""

__version__ = "0.1.0"
