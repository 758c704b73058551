"""Query-builder modules. Each module exports

- ``QUERIES: dict[str, Callable[(SparkSession, sf_dir str), DataFrame]]``
- ``ORACLE:  dict[str, str]`` — DuckDB-runnable ANSI SQL per query name
  (omitted for non-SQL-expressible operators → driver does a weaker
  rows-only check).

``frinesis_spark.registry`` merges them into the driver contract.
"""
