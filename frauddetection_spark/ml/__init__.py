"""MLlib boundary (SURVEY.md §2.7): engineered features + graph
feature propagation + classifier pipelines + oracle-checked metrics."""
