"""credix_data_pipeline_spark — a brand-new PySpark-native CDC / incremental-ingest
engine with the capabilities of ``brendajanuario/credix-data-pipeline``.

The reference (read-only at /root/reference) is a Dagster + dbt + BigQuery + GCP
Datastream medallion CDC pipeline.  This engine re-expresses every capability
Spark-first (see SURVEY.md for the file:line capability map):

* change-feed tail        -> Structured Streaming file source (sources/feed.py)
* watermark checkpointing -> streaming checkpoint + lineage snapshot fencing
* dbt MERGE upsert        -> key-partitioned copy-on-write MERGE into a
                             snapshot-committed lakehouse table (lakehouse/)
* silver cleaning         -> vectorized Arrow pandas UDFs (functions/normalize.py)
* gold analytics          -> pure DataFrame plans (plans/gold.py)
* Elementary monitoring   -> lineage + metrics sidecar table (streaming/lineage.py)

No code is copied from the reference; it is a different engine with the same
query semantics, designed for multi-executor clusters at 10^10-event scale and
verified at small scale against pure-Python and DuckDB oracles.
"""

__version__ = "0.1.0"
