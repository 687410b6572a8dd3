"""backend_model_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference repo (an Airbnb price-prediction backend:
CSV/SQL ETL + pandas feature engineering + Keras regression, see
``/root/reference``), extended with the relational, text, dedup,
similarity, and streaming operators a 100 TB training-data pipeline
needs.

Design stance (see SURVEY.md §7):

* Everything is declared through the DataFrame/SQL API so Catalyst owns
  physical planning (pushdown, pruning, join selection, AQE).
* Explicit ``StructType`` schemas everywhere; Parquet at rest.
* Python UDFs only where built-ins genuinely can't express the
  semantics, and then always Arrow-batched (``pandas_udf`` /
  ``applyInPandas`` / ``mapInPandas``).
* Every operator is exposed as a named ``(spark, sf_dir) -> DataFrame``
  callable in :mod:`backend_model_spark.plans.registry`, with a
  DuckDB-runnable ANSI-SQL oracle wherever the semantics are exact.
"""

__version__ = "0.1.0"
