"""S10 archive-on-success + S4 change-file formats (SURVEY §2.1).

The reference moves successfully-loaded landing files to an `archive/`
prefix (gcp_resource.py:88-109) and its Datastream feed is Avro
(datastream_streams.tf:73-79).  Archive is fully testable here; avro needs
the external spark-avro module, so its test asserts the gated behavior and
exercises the full round-trip only when the module is present.
"""

from __future__ import annotations

import os

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.sources.feed import (
    FeedSpec,
    avro_available,
    write_feed,
)
from credix_data_pipeline_spark.streaming import runner

SPEC = dict(
    n_events=3_000,
    n_conversations=40,
    turns_per_conversation=8,
    events_per_chunk=1_000,
)


def _rows(spark, table_path):
    t = LakeTable.load(spark, table_path)
    df = read_clean(t)
    return sorted(tuple(str(r[c]) for c in sorted(df.columns)) for r in df.collect())


def test_archive_on_success(spark, tmp_path):
    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    feed2, table2 = str(tmp_path / "feed2"), str(tmp_path / "table2")
    write_feed(spark, feed, FeedSpec(**SPEC))
    write_feed(spark, feed2, FeedSpec(**SPEC))

    stats = runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=4,
        collect_stats=False, archive=True,
    )
    assert stats.batches > 0

    # every processed chunk moved out of the landing zone...
    landing = os.path.join(feed, "pre")
    assert not any(d.startswith("chunk=") for d in os.listdir(landing))
    # ...and into _archive/ preserving the relative layout
    arch = os.path.join(feed, runner.ARCHIVE_DIR, "pre")
    archived = sorted(d for d in os.listdir(arch) if d.startswith("chunk="))
    assert len(archived) == 3  # 3000 events / 1000 per chunk

    # resume after full archive is a clean no-op (checkpoint is past them)
    stats2 = runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=4,
        collect_stats=False, archive=True,
    )
    assert stats2.batches == 0

    # archived replay state == un-archived replay state of the same feed
    runner.replay(
        spark, feed2, table2, chunks_per_batch=2, num_buckets=4,
        collect_stats=False,
    )
    assert _rows(spark, table) == _rows(spark, table2)
    # the un-archived feed keeps its landing chunks
    assert any(
        d.startswith("chunk=") for d in os.listdir(os.path.join(feed2, "pre"))
    )


def test_avro_feed_round_trip_or_gated(spark, tmp_path):
    feed, table = str(tmp_path / "af"), str(tmp_path / "at")
    spec = FeedSpec(file_format="avro", **SPEC)
    if not avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_feed(spark, feed, spec)
        return
    write_feed(spark, feed, spec)
    stats = runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=4,
        collect_stats=False,
    )
    assert stats.rows_in > 0
    assert len(_rows(spark, table)) > 0


def test_avro_rejects_inflight_evolution(spark, tmp_path):
    spec = FeedSpec(file_format="avro", evolution_frac=0.5, **SPEC)
    with pytest.raises((RuntimeError, ValueError)):
        write_feed(spark, str(tmp_path / "ae"), spec)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported feed format"):
        write_feed(
            spark, str(tmp_path / "uf"), FeedSpec(file_format="orc2", **SPEC)
        )
