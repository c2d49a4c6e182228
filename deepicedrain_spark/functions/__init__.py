from deepicedrain_spark.functions import projection, reshape, strings, timeutils  # noqa: F401
