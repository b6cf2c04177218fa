"""PySpark-native ODS/analytics engine.

A ground-up Spark rebuild of the capabilities of the reference ELT
platform ``trangdam-de/ods-v3-dbt`` (see SURVEY.md): windowed
incremental ingestion, a declarative schema catalog, scalar cleansing
transforms, nine upsert/refresh strategies, revenue analytics,
freshness-guarded datamart rollups, dbt-style model running with
data-quality assertions, run-metadata logging, a Structured-Streaming
micro-batch wrapper — plus LLM-data-pipeline operators (fuzzy dedup,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Everything is expressed through the DataFrame/SQL API so Catalyst
owns the physical plan; no RDDs, no row-at-a-time Python UDFs in hot
paths.
"""

__version__ = "0.1.0"
