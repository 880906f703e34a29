"""dex_data_ingestor_spark — PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
daemon ``Query-Web3/dex-data-ingestor`` (see /root/repo/SURVEY.md) as an
idiomatic Spark engine: declarative DataFrame plans, broadcast dimension
joins, window-function as-of / period-over-period analytics, a
set-oriented merge-upsert operator, incremental watermark protocol,
Structured Streaming jobs, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns).

Nothing here is a port: the reference executes row-at-a-time SQL strings
against MySQL; this package declares logical plans and lets Catalyst and
Tungsten pick physical strategies designed to hold at 100 TB.
"""

from dex_data_ingestor_spark.session import get_session, configure_session
from dex_data_ingestor_spark.io import load_table, load_tables, TABLES

__all__ = [
    "get_session",
    "configure_session",
    "load_table",
    "load_tables",
    "TABLES",
]

__version__ = "0.1.0"
