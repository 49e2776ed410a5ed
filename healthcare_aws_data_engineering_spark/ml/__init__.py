"""ML inference layer (SURVEY §2.10 M1–M7): the reference's fitted
sklearn preprocessing chain and XGBoost risk models re-expressed as Spark
column math + one Arrow-vectorized pandas UDF.

Parity principle: never refit — the stored parameters (medians, scaler
moments, PCA components, k-means centers, boosted trees) were extracted
once from the reference artifacts into ``params/*.json`` by
``tools/extract_ml_params.py`` and are applied verbatim.
"""
