"""lightning_metastore_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of zetaris/lightning-metastore.

Architecture (see SURVEY.md): the reference is a Spark catalog/federation
plugin — every relational operator is delegated to Catalyst. This package
re-expresses that design Spark-first in pure Python:

- ``model``      JSON-file metastore (mirrors LightningHdfsModel layout)
- ``parser``     Lightning DDL dialect dispatcher (REGISTER/USL/DQ/...)
- ``catalog``    per-source catalog units + ``lightning.*`` name resolver
- ``context``    LightningContext — the user-facing session wrapper
- ``plans``      relational query library (delegated Spark SQL surface)
- ``operators``  dedup / similarity / DQ — 100TB-scale DataFrame programs
- ``functions``  text-analysis column function library (JVM-side exprs)
- ``sources``    unstructured (binaryFile) modality tables + multimodal
- ``streaming``  Structured Streaming extensions over event sources
"""

__version__ = "0.1.0"

from lightning_metastore_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark", "__version__"]
