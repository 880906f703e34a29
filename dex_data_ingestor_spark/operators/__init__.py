from dex_data_ingestor_spark.operators.incremental import (
    incremental_window,
    bootstrap_start,
    Bookmark,
)
from dex_data_ingestor_spark.operators.dedup import dedup_first
from dex_data_ingestor_spark.operators.asof import latest_per_key, asof_lookup
from dex_data_ingestor_spark.operators.merge import merge_upsert
from dex_data_ingestor_spark.operators.surrogate import (
    surrogate_key_hash,
    surrogate_key_dense,
)
from dex_data_ingestor_spark.operators.pct import (
    period_over_period,
    period_over_period_multi,
)
from dex_data_ingestor_spark.operators.skew import salted_join
from dex_data_ingestor_spark.operators.sketch import kmv_distinct
from dex_data_ingestor_spark.operators.dedup import dedup_first as keep_first
from dex_data_ingestor_spark.operators import (
    corpus,
    multimodal,
    neardup,
    quality,
    text,
    vector,
)

__all__ = [
    "incremental_window",
    "bootstrap_start",
    "Bookmark",
    "dedup_first",
    "keep_first",
    "latest_per_key",
    "asof_lookup",
    "merge_upsert",
    "surrogate_key_hash",
    "surrogate_key_dense",
    "period_over_period",
    "period_over_period_multi",
    "salted_join",
    "kmv_distinct",
    "corpus",
    "multimodal",
    "neardup",
    "quality",
    "text",
    "vector",
]
