from .ewma import ewma_stateful  # noqa: F401
from .stateful import sessionize_stateful  # noqa: F401
from .transitions import transitions_stateful  # noqa: F401
from .windows import (  # noqa: F401
    purchase_view_interval_join,
    purchase_view_interval_join_outer,
    tumbling_counts,
    sliding_counts,
    session_aggregate,
    dedup_first_event,
    windowed_topk,
    rank_topk,
)
