from frauddetection_spark.plans.registry import REGISTRY, QuerySpec, load_all, register

__all__ = ["REGISTRY", "QuerySpec", "load_all", "register"]
