"""cirro_annotation_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
CirroBio/Cirro-Annotation (see SURVEY.md), re-expressed Spark-first:

- ``manifest``  — the reference's declarative transform IR (glob scan →
  project/rename → melt → token-union → Parquet), compiled to lazy
  DataFrame pipelines (reference: annotation/commands/run_annotate.py:177-253).
- ``sources``   — delimited-text discovery + sniffed readers, HDF ingest.
- ``operators`` — reshaping, joins (broadcast/semi/anti/as-of/range),
  dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
  similarity search, text analysis, multimodal column plumbing.
- ``streaming`` — Structured Streaming equivalents for the event table.
- ``suites``    — the named query inventory exposed through
  ``__spark_entry__.py`` (queries + DuckDB oracle SQL).

Everything targets 100 TB scale: declarative plans so Catalyst can push
filters/prune columns, broadcast for small dims, no row-at-a-time Python
UDFs in hot paths, AQE on.
"""

__version__ = "0.1.0"
