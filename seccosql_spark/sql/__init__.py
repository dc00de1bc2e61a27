"""SQL dialect layer: a thin preprocessor for the three constructs the
reference's grammar has that Spark SQL lacks (SURVEY.md §2.6); all standard
SQL is handed to ``spark.sql`` untouched so Catalyst owns the lifecycle."""
