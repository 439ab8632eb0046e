"""PySpark-native analytics engine with the capabilities of
``aivoric/Data-Engineering-ND-DataLake-Project-4`` (the "Sparkify" data-lake ETL),
generalized into a reusable operator surface and extended with the
LLM-training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing, streaming).

Everything is expressed Spark-first: declarative DataFrame / SQL plans
optimized by Catalyst, Arrow-batched Pandas UDFs only where built-ins
genuinely cannot express the semantics. Nothing on the data path ever
calls ``collect()`` — scale (100 TB / 1000 executors) is handled by
partitioning, broadcast, AQE and map-side combine, not driver loops.
"""

from data_engineering_nd_datalake_project_4_spark.session import get_spark, session_builder

__all__ = ["get_spark", "session_builder"]

__version__ = "0.1.0"
