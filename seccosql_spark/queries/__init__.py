"""Named queries backing __spark_entry__.py: one entry per implemented
operator from SURVEY.md §2, each with a DuckDB-oracle SQL twin (or an
explicit rows-only marker for non-SQL-expressible iterative ops)."""
