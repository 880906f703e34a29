"""Exact-decimal Uniswap-V3 price math (the engine's one sanctioned
Pandas-UDF slow path).

The reference computes token prices from ``sqrt_price_x96`` under a
50-digit decimal context with 18-dp ROUND_DOWN quantization
(reference: src/utils/utils.py:9,130-171). Spark's DecimalType tops out
at precision 38, and ``(sqrt_price/2^96)^2`` needs ~58 digits of
headroom for large pools — so the exact path runs in an Arrow-batched
pandas UDF with Python ``decimal`` (prec 50), vectorized per batch.
Everything around it (the join producing inputs, the writes consuming
outputs) stays JVM-side.

Contract reproduced:
- ``p1/p0 = (sqrt_price_x96 / 2^96)^2 * 10^(d0 - d1)``
- exactly one of token0_usd/token1_usd known -> derive the other side
- quantize to 18 dp, ROUND_DOWN
- decimal InvalidOperation (e.g. division by a zero ratio) -> 0
  (reference: utils.py:161-169)
"""

from __future__ import annotations

import decimal
from decimal import Decimal

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, StructField, StructType

Q96 = Decimal(2) ** 96
_QUANT = Decimal(1).scaleb(-18)  # 18 decimal places

PRICE_PAIR_SCHEMA = StructType(
    [
        StructField("token0_price_usd", DecimalType(38, 18)),
        StructField("token1_price_usd", DecimalType(38, 18)),
    ]
)


def _price_pair_py(
    sqrt_price_x96, decimals0, decimals1, token0_usd, token1_usd
) -> tuple[Decimal | None, Decimal | None]:
    """Pure-python single-row kernel (also used by unit tests)."""
    with decimal.localcontext() as ctx:
        ctx.prec = 50
        try:
            sp = Decimal(str(sqrt_price_x96))
            ratio = (sp / Q96) ** 2  # token1 per token0
            if decimals0 is not None and decimals1 is not None:
                ratio *= Decimal(10) ** (int(decimals0) - int(decimals1))
            p0 = Decimal(str(token0_usd)) if token0_usd is not None else None
            p1 = Decimal(str(token1_usd)) if token1_usd is not None else None
            if p0 is None and p1 is None:
                raise ValueError("at least one side's USD price is required")
            if p0 is None:
                p0 = p1 / ratio
            elif p1 is None:
                p1 = p0 * ratio
            return (
                p0.quantize(_QUANT, rounding=decimal.ROUND_DOWN),
                p1.quantize(_QUANT, rounding=decimal.ROUND_DOWN),
            )
        except decimal.InvalidOperation:
            return Decimal(0).quantize(_QUANT), Decimal(0).quantize(_QUANT)
        except decimal.DivisionByZero:
            return Decimal(0).quantize(_QUANT), Decimal(0).quantize(_QUANT)


@F.pandas_udf(PRICE_PAIR_SCHEMA)
def token_prices_q96_exact(
    sqrt_price_x96: pd.Series,
    decimals0: pd.Series,
    decimals1: pd.Series,
    token0_usd: pd.Series,
    token1_usd: pd.Series,
) -> pd.DataFrame:
    """Vectorized (Arrow-batched) exact price pair; see module docstring."""
    out0, out1 = [], []
    for sp, d0, d1, u0, u1 in zip(
        sqrt_price_x96, decimals0, decimals1, token0_usd, token1_usd
    ):
        if pd.isna(sp):
            out0.append(None)
            out1.append(None)
            continue
        p0, p1 = _price_pair_py(
            sp,
            None if pd.isna(d0) else int(d0),
            None if pd.isna(d1) else int(d1),
            None if pd.isna(u0) else u0,
            None if pd.isna(u1) else u1,
        )
        out0.append(p0)
        out1.append(p1)
    return pd.DataFrame(
        {"token0_price_usd": out0, "token1_price_usd": out1}
    )
