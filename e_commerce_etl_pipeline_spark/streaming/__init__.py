from .incremental import (  # noqa: F401
    incremental_upsert_stream,
    near_dup_index_stream,
    read_assignment,
    run_incremental_batch,
)
from .scoring import (  # noqa: F401
    quality_score_stream,
    read_stream_audit,
    read_stream_scores,
)
from .span_dedup import (  # noqa: F401
    read_deduped_docs,
    read_segment_store,
    span_dedup_stream,
)
from .token_accounting import (  # noqa: F401
    bpe_token_stream,
    read_stream_token_counts,
    read_token_stream_audit,
)
