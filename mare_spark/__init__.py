"""mare_spark — a PySpark-native analytics engine with the capabilities of
mcapuccini/MaRe, extended with a relational surface and LLM-data-pipeline
operators, designed for 100 TB scale.

Public surface:
* :func:`mare_spark.session.get_spark` — tuned SparkSession factory
* :class:`mare_spark.dataset.MaRe` — container-pipeline API parity with the
  reference (map / reduce / repartitionBy / cache / collectReduce)
* :mod:`mare_spark.operators` — dedup, similarity, text analysis, multimodal
* :mod:`mare_spark.registry` — the declared-query corpus + DuckDB oracles
"""

from mare_spark.session import get_spark
from mare_spark.tables import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
