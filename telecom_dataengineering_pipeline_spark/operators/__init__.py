from .dedup import dedup_keep_latest, drop_duplicates_on_key
from .joins import anti_join_violations, broadcast_star_join, left_join_nonnull_filter
from .windows import sliding_count_by_time, with_prev_event

__all__ = [
    "dedup_keep_latest",
    "drop_duplicates_on_key",
    "anti_join_violations",
    "broadcast_star_join",
    "left_join_nonnull_filter",
    "sliding_count_by_time",
    "with_prev_event",
]
