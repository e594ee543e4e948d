from shaha_spark.streaming.build_stream import incremental_build  # noqa: F401
from shaha_spark.streaming.dedup_stream import (  # noqa: F401
    stream_exact_dedup,
    stream_minhash_signatures,
)
from shaha_spark.streaming.debounce_stream import (  # noqa: F401
    debounce_retained_batch,
    stream_debounce,
)
from shaha_spark.streaming.joins import stream_window_join  # noqa: F401
from shaha_spark.streaming.stateful import (  # noqa: F401
    running_totals,
    stream_ewma,
    stream_rolling_quantile,
)
from shaha_spark.streaming.windows import (  # noqa: F401
    session_event_counts,
    sliding_event_counts,
    watermarked_event_counts,
)
