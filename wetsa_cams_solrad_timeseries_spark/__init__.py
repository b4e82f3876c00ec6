"""PySpark-native analytics engine with the capabilities of
alberthnahas/wetsa-cams-solrad-timeseries, rebuilt Spark-first.

Layout
------
- ``session``    — SparkSession factory pinning the semantics the engine
  relies on (UTC session timezone, ANSI off, AQE on, Arrow on).
- ``catalog``    — loaders for the driver test tables and temp-view helpers.
- ``functions``  — scalar expression library (SURVEY.md §2.7 F1–F13 plus
  cross-engine hashing and array math used by the extension operators).
- ``sources``    — readers: CAMS expert-CSV (commented header), plain CSV
  with declared schemas, glob + filename-metadata extraction.
- ``operators``  — relational/time-series/LLM-pipeline operators: tumbling
  window aggregation, dense-grid reindex, broadcast dimension joins, as-of
  join, QC flag filters, OLS regression aggregates, sessionization,
  dedup (exact/MinHash-LSH/SimHash/n-gram Jaccard), similarity search,
  text analysis, multimodal column plumbing.
- ``pipelines``  — the three reference pipelines (ingest / compile /
  compare) re-expressed as Spark jobs.
- ``streaming``  — Structured Streaming twins of the batch window ops.
- ``sinks``      — CSV / Parquet / NetCDF-export writers.
"""

__version__ = "0.1.0"
