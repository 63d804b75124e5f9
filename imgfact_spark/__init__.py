"""imgfact_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the kleinercubs/ImgFact reference pipeline
(multi-modal KG construction: triple extraction, entity linking, image
grounding, canonicalization, graph materialization) as idiomatic Spark
DataFrame programs.  See SURVEY.md for the operator-by-operator mapping.

Design rules (BASELINE.json north rule):
  * DataFrame/SQL only — no RDD code, no per-row Python UDFs.
  * Heavy kernels are Arrow-batched pandas UDFs / applyInPandas.
  * Every stage is checkpoint-resumable with per-partition lineage.
  * Skewed head entities: salted two-phase aggregation + AQE skew join.
"""

__version__ = "0.1.0"

from imgfact_spark.session import get_spark  # noqa: F401
