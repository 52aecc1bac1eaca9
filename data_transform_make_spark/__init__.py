"""data_transform_make_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL service ``jordanburger22/data-transform-make``
(studied read-only at /root/reference; see SURVEY.md for the operator
inventory), extended with the relational/window/streaming surface Spark
provides natively and the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) mandated by BASELINE.json.

Design rules (SURVEY.md §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst pick physical.
  * No row-at-a-time Python in hot paths; Pandas UDFs only where built-in
    expressions genuinely cannot express the semantics.
  * Every operator designed for 100 TB: broadcast only dimension tables,
    partition/shuffle on explicit keys, filters and projections pushed to
    the Parquet scan.
"""

__version__ = "0.1.0"
