from tile_processor_spark.sources.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
