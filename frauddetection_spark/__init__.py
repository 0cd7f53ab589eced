"""frauddetection_spark — a PySpark-native analytics engine.

Re-expresses the dataflow semantics of researchonbigdata/FraudDetection
(a pandas/torch graph-fraud-detection codebase) as idiomatic Spark
DataFrame/SQL, plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Entry points:
    - :func:`frauddetection_spark.session.get_spark`
    - :mod:`frauddetection_spark.sources.tables` (explicit schemas + loaders)
    - :mod:`frauddetection_spark.plans.registry` (the query catalog that
      backs ``__spark_entry__.py``)
"""

__version__ = "0.1.0"
