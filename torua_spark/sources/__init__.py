from torua_spark.sources.catalog import TABLES, kv_view, load_table, register_views  # noqa: F401
