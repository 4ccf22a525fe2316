"""cds_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing (at least) the query and
data-processing capabilities of the CBIIT/cds-etl reference pipeline
(a single-process pandas ETL for NCI Cancer Data Service metadata), plus
the relational/analytic surface and LLM-data-pipeline operators a
100 TB-scale deployment needs.

Layout:
    session    — SparkSession factory tuned for the engine
    catalog    — table registry over the parquet test tables
    plans/     — declared oracle-checkable query set (SURVEY.md §2.2)
    operators/ — ETL operator library re-expressing the reference's
                 surface (cds_transformation_functions.py et al.) as
                 composable DataFrame transforms
    functions/ — scalar/vector/text column-function library
    sources/   — edge adapters (Excel driver-side; CSV/Parquet scale path)
    streaming/ — Structured Streaming operators over event tables
"""

from cds_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
