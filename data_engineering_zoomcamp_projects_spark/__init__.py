"""data_engineering_zoomcamp_projects_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the full declared capability
surface of the reference pipeline (``Tannongma/data-engineering-zoomcamp-projects``,
see SURVEY.md): relational query core, ingestion/ETL, SQL transformation
layer, structured streaming over event data, and LLM-training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Design posture (100 TB north star):
- DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
- Broadcast joins for bounded dimensions; shuffle joins hash-partitioned
  on the join key for facts; no ``collect()`` on data paths.
- Filters/projections expressed so they push into the parquet scan.
- Python only at the edges (driver-side orchestration) or Arrow-batched
  Pandas UDFs where built-ins genuinely cannot express the op.
"""

__version__ = "0.1.0"
