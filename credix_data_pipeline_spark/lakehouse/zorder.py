"""Z-order (Morton-curve) clustering expression for maintenance rewrites.

``compaction.sort-order = zorder(conv_id,ts)`` lays each bucket's rows down
along a space-filling curve over BOTH columns, so with file splitting
(``compaction.target-file-rows``) every written file covers a narrow range
in EVERY z-dimension at once — a point lookup on the key AND an event-time
slice both prune files/row groups, where a lexicographic ``conv_id,ts``
sort serves only the leading column (the Delta ``OPTIMIZE ZORDER BY`` /
Iceberg ``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
analogue).

Mechanics — entirely JVM-side expressions (whole-stage codegen, no UDF):

* each dimension is normalized to 16 bits (15 at 4 dims — the
  interleave must stay inside the long's 63 value bits or the sign bit
  would flip the sort across the curve's halves):
  - numeric / timestamp / date: min-max scaled against the REWRITE SET's
    own bounds (one tiny agg job per compaction — maintenance cost, never
    ingest); range locality preserved.
  - string: ``xxhash64 & 0xFFFF`` — equality locality (all rows of one
    key cluster at one z-cell), which is exactly what a point lookup
    needs; range scans over strings don't prune (documented trade-off —
    Delta's range-id variant needs a sampling pass; the hash variant is
    deterministic and zero-pass).
  - NULLs map to cell 0 (cluster together at the origin).
* the 16-bit words interleave bit-by-bit into one 64-bit z-value
  (≤ 4 dimensions), and the writer sorts within each bucket partition by
  that single expression.

Determinism: same input rows + same bounds → same z-values → same file
layout; the bounds are data-derived, no clock or RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

BITS = 16
MAX_DIMS = 4


def parse_zorder(order: str) -> list[str] | None:
    """``"zorder(a, b)"`` → ``["a", "b"]``; None when not a zorder spec."""
    s = order.strip()
    if not (s.lower().startswith("zorder(") and s.endswith(")")):
        return None
    cols = [c.strip() for c in s[len("zorder("):-1].split(",") if c.strip()]
    if not cols:
        raise ValueError("zorder() needs at least one column")
    if len(cols) > MAX_DIMS:
        raise ValueError(
            f"zorder supports at most {MAX_DIMS} columns "
            f"({BITS} bits each in a 64-bit z-value), got {len(cols)}"
        )
    return cols


def _is_rangeable(dt: T.DataType) -> bool:
    return isinstance(
        dt,
        (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType,
            T.TimestampType, T.DateType, T.BooleanType,
        ),
    )


def zorder_expr(df: DataFrame, cols: list[str], schema: T.StructType) -> Column:
    """The 64-bit z-value over ``cols`` for rows of ``df``.

    Range-typed dimensions are scaled against ``df``'s own min/max (ONE
    small agg job here — the caller is a maintenance rewrite); string
    dimensions hash.  The returned Column references only ``cols``, so it
    can be used as a pure sort expression without materializing a column.
    """
    by_name = {f.name: f.dataType for f in schema.fields}
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise ValueError(f"zorder references unknown column(s) {unknown}")

    # keep the interleave inside the long's 63 value bits: at 4 dims the
    # 16th bit of the last word would land on the SIGN bit, flipping the
    # signed sort order across the curve's two halves — 15 bits per dim
    # instead (32768 cells) costs nothing perceptible and stays positive
    bits = min(BITS, 63 // len(cols))
    cells = (1 << bits) - 1

    rangeable = [c for c in cols if _is_rangeable(by_name[c])]
    bounds: dict[str, tuple[float, float]] = {}
    if rangeable:
        aggs = []
        for c in rangeable:
            v = F.col(c).cast("double")
            aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
        row = df.agg(*aggs).first()
        for c in rangeable:
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            if lo is not None and hi is not None and hi > lo:
                bounds[c] = (float(lo), float(hi))

    words: list[Column] = []
    for c in cols:
        dt = by_name[c]
        if _is_rangeable(dt):
            b = bounds.get(c)
            if b is None:  # all-null or constant dimension: one cell
                words.append(F.lit(0).cast("long"))
                continue
            lo, hi = b
            scaled = F.round(
                (F.col(c).cast("double") - F.lit(lo))
                / F.lit(hi - lo) * F.lit(float(cells))
            ).cast("long")
            clamped = F.greatest(
                F.lit(0).cast("long"),
                F.least(F.lit(cells).cast("long"), scaled),
            )
            words.append(F.coalesce(clamped, F.lit(0).cast("long")))
        else:
            words.append(
                F.pmod(F.xxhash64(F.col(c)), F.lit(cells + 1)).cast("long")
            )

    n = len(words)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, w in enumerate(words):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(w, bit).bitwiseAND(F.lit(1).cast("long")),
                    bit * n + i,
                )
            )
    return z.alias("_zvalue")
