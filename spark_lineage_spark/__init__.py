"""spark_lineage_spark — a PySpark-native analytics engine with lineage capture.

A brand-new engine with the query and data-processing capabilities of the
reference (``thesquelched/spark-lineage``, a Spark SQL lineage-listener
library): the full Spark SQL operator surface, observed by a lineage
extractor that records inputs / outputs / column-level derivations per
executed query, plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Reference provenance: ``/root/reference`` was empty at survey time
(SURVEY.md §0); behavior is reconstructed from public knowledge of the
reference project and built Spark-first, not ported.
"""

from spark_lineage_spark.session import LineageSession, build_spark, tune_runtime
from spark_lineage_spark.plans.model import (
    ColumnLineage,
    DatasetRef,
    LineageReport,
    RunMetadata,
)
from spark_lineage_spark.plans.reporters import (
    BufferedNetworkReporter,
    CompositeReporter,
    ConsoleReporter,
    InMemoryReporter,
    JsonlReporter,
    Reporter,
    reporter_from_conf,
)

__all__ = [
    "LineageSession",
    "build_spark",
    "tune_runtime",
    "DatasetRef",
    "ColumnLineage",
    "LineageReport",
    "RunMetadata",
    "Reporter",
    "reporter_from_conf",
    "BufferedNetworkReporter",
    "ConsoleReporter",
    "JsonlReporter",
    "InMemoryReporter",
    "CompositeReporter",
]

__version__ = "0.1.0"
