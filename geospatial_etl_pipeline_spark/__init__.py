"""geospatial_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``bird70/geospatial_ETL_pipeline`` (a single-machine arcpy geospatial ETL
script), widened into a general analytics engine:

- relational core (scans, filters, joins, aggregates, windows, set ops)
- the reference's geospatial/raster dataflow (ASC grid -> clip-by-region ->
  product naming -> nested JSON metadata), re-expressed as declarative
  DataFrame plans
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column plumbing)
- Structured Streaming surface over the ``events`` table

Design rules (see README.md):
- DataFrame/SQL first; Catalyst picks the physical plan.
- Tiny dimensions are broadcast; big joins shuffle on their keys.
- UDFs only where built-ins cannot express the semantics, and then
  Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
- Every query in ``plans.catalog`` carries an ANSI-SQL oracle so results
  are differentially tested against DuckDB.
"""

__version__ = "0.1.0"
