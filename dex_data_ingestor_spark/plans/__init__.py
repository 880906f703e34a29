from dex_data_ingestor_spark.plans.testbed import QUERIES, ORACLE_SQL, flagship

__all__ = ["QUERIES", "ORACLE_SQL", "flagship"]
