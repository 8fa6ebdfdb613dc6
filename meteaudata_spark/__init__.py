"""meteaudata_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of modelEAU/metEAUdata.

Two planes (SURVEY §7.1):
  * metadata plane (driver): provenance, lineage, naming/versioning —
    ported semantics from the reference, written Spark-first;
  * data plane (executors): lazy Spark DataFrames; every operator is a
    Catalyst plan built from pyspark.sql.functions.
"""

from meteaudata_spark.metadata import (
    DataProvenance,
    FunctionInfo,
    IndexMetadata,
    Parameters,
    ProcessingConfig,
    ProcessingStep,
    ProcessingType,
)
from meteaudata_spark.timeseries import TimeSeries
from meteaudata_spark.signal import Signal
from meteaudata_spark.dataset import Dataset
from meteaudata_spark.session import get_spark
from meteaudata_spark.plans.opcache import release_operator_caches

__all__ = [
    "DataProvenance",
    "Dataset",
    "FunctionInfo",
    "IndexMetadata",
    "Parameters",
    "ProcessingConfig",
    "ProcessingStep",
    "ProcessingType",
    "Signal",
    "TimeSeries",
    "get_spark",
    "release_operator_caches",
]

__version__ = "0.1.0"
