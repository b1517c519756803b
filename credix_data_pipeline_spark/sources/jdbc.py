"""JDBC watermark source — batch parity with the reference's pull extractor
(SURVEY §2.1 S1/S2).

The reference's Dagster assets pull deltas straight from Postgres with a
watermark predicate baked into the SQL so the *source* plans the scan:

* cnpj: ``SELECT <16 cols> FROM oltp.business_case_cnpj_ws WHERE
  updated_at > :wm OR created_at > :wm ORDER BY updated_at DESC``
  (credix_pipeline/credix_pipeline/assets/cnpj_assets.py:24-50)
* installments: ``... WHERE GREATEST(COALESCE(invoice_issue_date,'1900-01-01'),
  COALESCE(paid_date,'1900-01-01'), ...) > :wm``
  (credix_pipeline/credix_pipeline/assets/installments_assets.py:36-57)

The engine's canonical front door is the change-file feed (`sources/feed.py`
— the Datastream analogue), but a user replacing the reference still needs
the pull path for tables without logical replication.  This module builds the
same watermark scans for ``spark.read.format("jdbc")``:

* the delta predicate is embedded in the pushdown query (``dbtable`` is a
  derived-table subquery) so the database evaluates it — identical to the
  reference, and the only sane plan at 100 TB (never full-scan then filter);
* the read is *partitioned* (``partitionColumn``/``lowerBound``/``upperBound``
  /``numPartitions``) so a large delta lands as N parallel executor scans,
  not one driver-side cursor — the reference's single-process pandas read is
  the scale bottleneck this replaces;
* ``fetchsize`` mirrors the reference loader's 20 000-row batches
  (docker/data-loader/parquet_to_postgres.py:67,99-102).

No JDBC driver jar ships in this sandbox, so tests cover the query/option
construction (the part this module owns) and gate the live ``.load()``
behind driver availability; on a real cluster add
``--jars postgresql-<ver>.jar`` and everything below runs unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

DEFAULT_EPOCH = "1900-01-01"  # reference watermark default (cdc_helpers.py:12-20)
DEFAULT_FETCHSIZE = 20_000    # reference loader batch size (parquet_to_postgres.py:67)


def _q(ident: str) -> str:
    """Quote a SQL identifier (ANSI double quotes), rejecting injection."""
    if not ident.replace("_", "").replace(".", "").isalnum():
        raise ValueError(f"invalid identifier: {ident!r}")
    return ".".join(f'"{part}"' for part in ident.split("."))


def _lit_ts(value: str) -> str:
    """A timestamp literal — strict shape check, then quoted."""
    ok = value.replace("-", "").replace(":", "").replace(" ", "").replace(".", "")
    if not ok.isdigit():
        raise ValueError(f"invalid watermark literal: {value!r}")
    return f"'{value}'"


def watermark_query(
    table: str,
    columns: list[str],
    watermark: str,
    watermark_cols: list[str],
    order_desc: bool = True,
    limit: int | None = None,
) -> str:
    """The cnpj-shaped delta query: ``col_a > wm OR col_b > wm`` (S1/P2).

    ``limit`` mirrors the reference's (commented) safety cap
    (cnpj_assets.py:46).
    """
    if not watermark_cols:
        raise ValueError("watermark_cols must name at least one column")
    cols = ", ".join(_q(c) for c in columns)
    wm = _lit_ts(watermark)
    pred = " OR ".join(f"{_q(c)} > {wm}" for c in watermark_cols)
    sql = f"SELECT {cols} FROM {_q(table)} WHERE {pred}"
    if order_desc:
        sql += f" ORDER BY {_q(watermark_cols[0])} DESC"
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
    return sql


def greatest_watermark_query(
    table: str,
    columns: list[str],
    watermark: str,
    nullable_date_cols: list[str],
    epoch: str = DEFAULT_EPOCH,
) -> str:
    """The installments-shaped delta query:
    ``GREATEST(COALESCE(c1, epoch), COALESCE(c2, epoch), ...) > wm`` (S2/P3).
    """
    if not nullable_date_cols:
        raise ValueError("nullable_date_cols must name at least one column")
    cols = ", ".join(_q(c) for c in columns)
    coalesced = ", ".join(
        f"COALESCE({_q(c)}, {_lit_ts(epoch)})" for c in nullable_date_cols
    )
    return (
        f"SELECT {cols} FROM {_q(table)} "
        f"WHERE GREATEST({coalesced}) > {_lit_ts(watermark)}"
    )


@dataclass
class JdbcWatermarkSource:
    """A partitioned JDBC delta read, fully declared before any connection.

    ``partition_column`` must be numeric/date/timestamp (Spark JDBC contract);
    each of the ``num_partitions`` executors issues its own range-bounded copy
    of the pushdown query, so the source database sees N index scans instead
    of one giant cursor.
    """

    url: str
    query: str
    partition_column: str | None = None
    lower_bound: str | None = None
    upper_bound: str | None = None
    num_partitions: int = 8
    fetchsize: int = DEFAULT_FETCHSIZE
    driver: str | None = None
    properties: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        """The exact option map handed to ``spark.read.format("jdbc")``."""
        opts = {
            "url": self.url,
            # derived-table pushdown: the DB plans scan+filter+sort (S1)
            "dbtable": f"({self.query}) AS delta",
            "fetchsize": str(self.fetchsize),
        }
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                # fail here, not at an opaque JDBC load-time parse of 'None'
                raise ValueError(
                    "partition_column requires both lower_bound and "
                    "upper_bound (Spark JDBC partitioned-read contract)"
                )
            opts.update(
                {
                    "partitionColumn": self.partition_column,
                    "lowerBound": str(self.lower_bound),
                    "upperBound": str(self.upper_bound),
                    "numPartitions": str(self.num_partitions),
                }
            )
        if self.driver:
            opts["driver"] = self.driver
        opts.update(self.properties)
        return opts

    def reader(self, spark: SparkSession):
        return spark.read.format("jdbc").options(**self.options())

    def load(self, spark: SparkSession) -> DataFrame:
        return self.reader(spark).load()
