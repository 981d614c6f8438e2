"""smart_data_lake_spark — a PySpark-native data-pipeline automation engine.

A from-scratch rebuild of the capabilities of smart-data-lake/smart-data-lake
(reference surveyed in SURVEY.md): declarative DataObjects + Actions forming a
DAG, executed in prepare/init/exec phases with incremental execution modes,
SCD2 historization, deduplication, data-quality expectations and streaming —
all expressed directly on the PySpark DataFrame API so Catalyst/Tungsten and
AQE do the physical planning.

Design stance (vs. the reference, see SURVEY.md §1.3): no GenericDataFrame
abstraction layer — `pyspark.sql.DataFrame` is the one and only frame type.
"""

from smart_data_lake_spark.session import build_session, get_session
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.subfeed import SparkSubFeed
from smart_data_lake_spark.partitions import PartitionValues

__version__ = "0.1.0"

__all__ = [
    "build_session",
    "get_session",
    "InstanceRegistry",
    "SparkSubFeed",
    "PartitionValues",
]
