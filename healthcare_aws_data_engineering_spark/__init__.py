"""PySpark-native analytics engine with the query and data-processing
capabilities of the Healthcare-AWS-Data_engineering reference pipeline.

Layers (mirrors SURVEY.md §7.1):

- :mod:`.sources`   — scans/sinks (FHIR bundle JSON, parquet tables, CSV labs).
- :mod:`.functions` — scalar column-expression builders (FHIR extraction
  ladders, clinical banding, penalty scoring, date math, linear fit).
- :mod:`.operators` — reusable relational operators (latest-per-key, max-case
  pivot, keyed dedup, top-k, monthly rollup) plus large-scale training-data
  extensions (MinHash/SimHash dedup, ANN similarity, text analysis).
- :mod:`.plans`     — full query plans (ETL, report queries, ad-hoc surface,
  feature table).
- :mod:`.ml`        — broadcast-parameter ML inference (impute/scale/PCA/
  KMeans column math, XGBoost pandas_udf scoring).
- :mod:`.streaming` — incremental ingest (Structured Streaming availableNow =
  Glue job-bookmark parity).

Everything is expressed with the DataFrame API / Spark SQL so Catalyst can
push filters, prune columns and pick join strategies; Python UDFs appear only
where semantics genuinely require them (Arrow-batched, never per-row).
"""

__version__ = "0.1.0"
