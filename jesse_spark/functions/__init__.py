from jesse_spark.functions import audio  # noqa: F401
