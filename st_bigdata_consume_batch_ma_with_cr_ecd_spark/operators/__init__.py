from .aggregates import grouped_max, max_by_agg, sum_coalesce  # noqa: F401
from .asof import asof_backfill, asof_join  # noqa: F401
from .dedup import drop_rank, latest_per_group, top_n_per_group  # noqa: F401
from .joins import broadcast_lookup_join, join_preaggregated, not_in_anti_join  # noqa: F401
from .setops import union_all_by_name, union_distinct_by_name, union_slices  # noqa: F401
