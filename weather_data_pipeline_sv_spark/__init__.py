"""weather_data_pipeline_sv_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ``sejalv/weather-data-pipeline-sv`` (a
Postgres/PostGIS + Airflow weather ETL), per ``SURVEY.md``:

- bronze/silver/gold medallion pipeline over Parquet (``plans/``)
- cleaning + quality scoring (``plans/cleaning.py``)
- IDW spatial aggregation to postal-code x hour grain (``plans/aggregation.py``)
- serving queries (``plans/queries.py``)
- merge-by-key writers replacing ON CONFLICT upserts (``operators/merge.py``)
- large-scale training-data operators: dedup, similarity search, text
  analysis, multimodal plumbing (``operators/``, ``functions/``)

Everything is declarative DataFrame API + built-in functions; no Python UDFs
in the core hot path, so Catalyst/Tungsten handle pushdown, pruning,
broadcast and whole-stage codegen.
"""

__version__ = "0.1.0"
