from frauddetection_spark.sources.tables import SCHEMAS, TABLE_NAMES, load_table, register_views

__all__ = ["SCHEMAS", "TABLE_NAMES", "load_table", "register_views"]
