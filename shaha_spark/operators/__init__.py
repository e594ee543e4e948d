from shaha_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    skew,
    textops,
)
