"""Query modules. Importing :func:`frauddetection_spark.plans.load_all`
pulls every module in, populating the registry."""
