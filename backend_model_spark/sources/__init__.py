from backend_model_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    TABLE_SCHEMAS,
    load_table,
    register_views,
)
