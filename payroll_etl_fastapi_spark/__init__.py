"""payroll_etl_fastapi_spark — a PySpark-native analytics engine.

Brand-new, idiomatic-Spark implementation of the query and data-processing
capabilities of the reference ``anatol1986/payroll-etl-fastapi`` (a pandas→Postgres
payroll ETL with four SQL-over-HTTP KPI endpoints), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
structured streaming) designed for 100 TB scale.

Layout:
  session     — SparkSession factory with scale-tuned defaults (AQE, UTC, shuffle)
  schemas     — explicit StructTypes (fixed-DDL philosophy; never infer curated tables)
  sources     — CSV ingest/normalization, parquet star-schema storage, testdata registry
  operators   — upsert (parquet MERGE analog), dedup family, similarity search
  functions   — text analysis, vector math (built-in column expressions, no slow UDFs)
  plans       — the four reference KPI queries + the driver-facing analytics suite
  streaming   — Structured Streaming over the events table
"""

__version__ = "0.1.0"
