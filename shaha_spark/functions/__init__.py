from shaha_spark.functions.hashers import (  # noqa: F401
    HASHERS,
    available_algorithms,
    digest_length,
    get_hasher,
    hash_expr,
    resolve_hashers,
)
