from dex_data_ingestor_spark.sources.config import MultiEnvConfig
from dex_data_ingestor_spark.sources.snapshot_cdf import (
    SnapshotCdfDataSource,
)
from dex_data_ingestor_spark.sources.jdbc import (
    jdbc_reader,
    jdbc_incremental_reader,
    jdbc_writer,
)

__all__ = [
    "MultiEnvConfig",
    "SnapshotCdfDataSource",
    "jdbc_reader",
    "jdbc_incremental_reader",
    "jdbc_writer",
]
