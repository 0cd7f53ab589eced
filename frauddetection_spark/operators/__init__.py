"""Reusable operator implementations (graph message-passing, dedup,
similarity search, text analysis). Queries in
:mod:`frauddetection_spark.queries` compose these."""
