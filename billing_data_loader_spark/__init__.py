"""PySpark-native analytics engine with the capabilities of
vgrabelnikov/Billing-Data-Loader (serverless billing-CSV -> ClickHouse ETL),
re-expressed Spark-first and extended with LLM-data-pipeline operators.

Built from public knowledge only (Apache Spark / PySpark APIs, DuckDB for the
test oracle). The reference mount was empty at build time (SURVEY.md §0), so
reference parity targets come from SURVEY.md §2's reconstructed inventory.

Layout:
    session.py    - SparkSession builder + runtime prep (UTC, AQE, Arrow)
    tables.py     - explicit StructType schemas + loaders for fixture tables
    oracle.py     - local replica of the driver's DuckDB comparison loop
    operators/    - relational operators (joins, aggs, windows, set ops, ...)
    sources/      - scan/sink connectors (CSV, JSONL, partitioned parquet, ...)
    functions/    - scalar-function suites + determinism helpers
    plans/        - query registry consumed by __spark_entry__.py
    streaming/    - Structured Streaming operators
"""

__version__ = "0.1.0"
