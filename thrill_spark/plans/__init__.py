"""Query registry: every implemented SURVEY §2 operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string."""
