"""conte_to_fresco_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
pipeline ``j-mckerracher/conte-to-fresco-etl`` (pandas/NumPy/PyArrow, see
/root/reference) as idiomatic Spark DataFrame programs, and extends them
with large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis).

Design rules (SURVEY.md §7):
  * DataFrame / Spark SQL only — no RDDs, no row-at-a-time Python UDFs on
    the hot path; every reference scalar function maps to built-in
    ``pyspark.sql.functions`` expressions (SURVEY §2.11).
  * Catalyst supplies chunking, memory management, join strategy and
    partitioned writes that the reference hand-rolls (SURVEY §4).
  * Outputs carry fixed, explicit schemas (reference
    conte-etl-step-2-processor.py:1382-1405).
"""

from conte_to_fresco_etl_spark.session import get_spark
from conte_to_fresco_etl_spark.operators.join import process_month
from conte_to_fresco_etl_spark.operators.transforms import transform_folder
from conte_to_fresco_etl_spark.pipeline import run_step1, run_step2

__all__ = [
    "get_spark",
    "process_month",
    "transform_folder",
    "run_step1",
    "run_step2",
]
__version__ = "0.1.0"
