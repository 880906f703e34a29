from dex_data_ingestor_spark.functions.scalars import (
    apy_compound,
    apy_compound_monthly,
    pct_change,
    normalize_symbol,
    pct_to_fraction,
    tvl_naive,
    tvl_q96,
    token_price_ratio_q96,
    derived_price,
    derived_tvl,
    md5_int64,
)
from dex_data_ingestor_spark.functions.decimalq96 import token_prices_q96_exact

__all__ = [
    "apy_compound",
    "apy_compound_monthly",
    "pct_change",
    "normalize_symbol",
    "pct_to_fraction",
    "tvl_naive",
    "tvl_q96",
    "token_price_ratio_q96",
    "derived_price",
    "derived_tvl",
    "md5_int64",
    "token_prices_q96_exact",
]
