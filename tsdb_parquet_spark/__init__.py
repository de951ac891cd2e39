"""tsdb_parquet_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project Shubham4359/TSDB_Parquet (a Go program that converts
Prometheus TSDB blocks into a FrostDB/Parquet columnar table and queries it
back — see SURVEY.md), re-expressed Spark-first:

- time-series-over-Parquet data model with dynamic label columns
  (wide view + canonical map form), sorted physical layout;
- a Prometheus-matcher query frontend compiled to Catalyst ``Column``
  predicates (reference: ``hello.go:302-318``), plus a PromQL expression
  parser/engine (``promql_expr.py``) and a pure-Python Prometheus TSDB
  block reader (``tsdb_block.py``) that ingests the reference's own
  committed block bytes;
- the full relational operator surface (joins, aggregations, windows,
  set ops, scalar functions) via the DataFrame/SQL API;
- LLM-data-pipeline operators (dedup exact/MinHash/SimHash/Jaccard,
  similarity search, text analysis, multimodal column plumbing);
- Structured Streaming jobs mirroring the batch semantics, including
  continuous-aggregate rollup maintenance (``rollup.py``);
- a Spark-4 Python DataSource for TSDB blocks (``datasource.py``,
  ``spark.read.format("tsdb")``) and table maintenance — compaction,
  retention, partition health (``maintenance.py``).

Everything is pure PySpark: Catalyst + Tungsten do the optimization; the
engine is a thin, tested Python layer (SURVEY.md §7.0).
"""

from tsdb_parquet_spark.session import get_spark
from tsdb_parquet_spark.tables import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
