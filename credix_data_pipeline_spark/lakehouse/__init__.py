"""Snapshot-committed lakehouse table layer.

The reference gets ACID table semantics from managed engines: BigQuery MERGE
(dbt ``incremental_strategy='merge'``, dbt/business_case/models/silver/
installments_clean.sql:1-8), hash-isolated temp tables per run
(credix_pipeline/utils/gcs_operations.py:35-40) and a BigLake **Iceberg**
catalog for silver (dbt/business_case/catalogs.yml:1-9).  This sandbox has no
Iceberg runtime jar, so the engine implements the same table contract from
scratch, Iceberg-style:

* parquet data files, hash-bucket partitioned on the table key
* JSON snapshot manifests with atomic exclusive-create commits
* optimistic concurrency (a losing committer gets CommitConflict)
* snapshot ids + parent chain -> history, time travel, fencing
* schema evolution as metadata-only commits (add-column)
* copy-on-write MERGE that rewrites only dirty buckets

On a real cluster with ``iceberg-spark-runtime`` on the classpath, the apply
path (operators/apply.py) can target a genuine Iceberg catalog instead; the
semantics here are deliberately identical (snapshot isolation, CoW MERGE,
ADD COLUMNS) so the swap is a sink change, not an engine change.  That claim
is interface-tested: ``lakehouse/contract.py`` pins the exact ``MergeSink``
surface apply_batch needs, and tests/test_sink_contract.py drives the same
apply code through a second (in-memory) implementation plus a real-Iceberg
smoke that runs wherever the jar ships.
"""

from credix_data_pipeline_spark.lakehouse.table import CommitConflict, LakeTable

__all__ = ["LakeTable", "CommitConflict"]
