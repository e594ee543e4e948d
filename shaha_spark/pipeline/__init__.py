from shaha_spark.pipeline.append import append_merge  # noqa: F401
from shaha_spark.pipeline.build import (  # noqa: F401
    build,
    dedup_records,
    dedup_words,
    hash_fanout,
    read_hashdb,
    read_sidecar,
    sort_for_write,
    words_from_lines,
    write_hashdb,
    write_sidecar,
)
from shaha_spark.pipeline.curate import curate_corpus  # noqa: F401
from shaha_spark.pipeline.forget import (  # noqa: F401
    forget_digests,
    forget_preimages,
    plan_forget,
)
from shaha_spark.pipeline.stats import info, scan_stats  # noqa: F401
