from shaha_spark.operators import dedup, multimodal, similarity, textops  # noqa: F401
