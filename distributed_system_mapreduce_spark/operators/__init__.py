"""Query operators. Each module exposes QUERIES (name -> callable
taking (spark, sf_dir) -> DataFrame) and ORACLES (name -> DuckDB SQL
string over the same tables) used by __spark_entry__.py."""
