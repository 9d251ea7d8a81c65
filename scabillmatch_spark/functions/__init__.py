from scabillmatch_spark.functions import pk, similarity, text  # noqa: F401
