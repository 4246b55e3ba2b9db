from payroll_etl_fastapi_spark.sources.registry import load_table, register_views

__all__ = ["load_table", "register_views"]
