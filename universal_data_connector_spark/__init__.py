"""universal_data_connector_spark — a PySpark-native analytics & ETL engine.

A from-scratch rebuild of the capabilities of
``ThatNinjaGuy/universal-data-connector`` (a Hazelcast-Jet YAML-pipeline
ETL system; see SURVEY.md), re-expressed Spark-first:

* declarative YAML pipelines (source -> transformations -> sink) compiled
  to DataFrame lineages and executed as batch jobs or Structured
  Streaming queries (``plans/``, ``sources/``, ``sinks/``),
* the full relational operator surface (joins, aggregations, windows,
  sorts, set ops) the reference lacks but the north star mandates
  (``operators/relational.py``),
* LLM-training-data operators designed for 100 TB scale: exact & near
  deduplication, similarity search, text analysis, multimodal binary
  columns (``operators/dedup.py``, ``operators/similarity.py``,
  ``operators/text.py``, ``operators/multimodal.py``),
* a control plane mirroring the reference REST API (``manager.py``).

Everything is built on the public Apache Spark DataFrame / SQL /
Structured Streaming API; Catalyst + Tungsten pick physical strategies.
"""

__version__ = "0.1.0"
