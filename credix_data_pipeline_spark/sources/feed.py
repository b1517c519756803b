"""Synthetic CDC change feed: generator + reader (SURVEY §2.1 S3/S4).

Plays the role the reference delegates to GCP Datastream: an ordered stream of
insert/update/delete change files (Avro rotated at 100 MB / 60 s,
``terraform/modules/datastream/datastream_streams.tf:71-79``).  Here the feed
is a directory of parquet *chunks* (``chunk=K/``), each a contiguous-ish LSN
range — the rotation analogue — plus a tiny JSON manifest and a schema
registry file (the Datastream discovery analogue).

Determinism contract: every field is a pure arithmetic function of the event
id, using only multiply/mod hashes — reproducible bit-for-bit by the pure-
Python oracle in tests (no engine-specific hash like xxhash64).  Generation
runs distributed through ``spark.range`` column expressions, so the same knob
set scales from 10^3 (pytest) to 10^10 (the north-rule shape) without a
driver-side loop.

Knobs (FIXTURES.md §2): #conversations, turns/conversation, delete ratio,
duplicate ratio, out-of-order shuffle window, hot-key skew, events/chunk, and
an evolution switch-point after which events carry ``tool_meta``.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, EVOLVED_COLUMN

# Word list with Unicode edge cases (accents, fullwidth, ligature, NBSP) so
# text normalization is pinned against the oracle (FIXTURES determinism rules).
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "café", "naïve", "reçu", "Ｗｉｄｅ", "ﬁre", "über", "jalapeño", "søren",
    "data", "spark", "merge", "stream", "turn", "tool", "agent", "reply",
    "plan step", "  pad  ", "MiXeD", "ño",
]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "calculator", "browser", "python"]
# Partial-update column sets (FeedSpec.patch_pct): which payload columns a
# patch event carries, picked per event by hash — text-only (the TOAST
# shape: the big column changed), role+tool, and text+ts.
PATCH_VARIANTS = (("text",), ("role", "tool"), ("text", "ts"))

# Prime modulus for the portable hash (Mersenne M31).  Must exceed the
# largest key space a bench run asks for — a smaller modulus silently caps
# distinct (conv, turn) keys at MOD and turns an insert-heavy feed into an
# update-heavy one.  (e + c) * MULT stays under 2^63 for n_events up to
# ~3.4e9, which bounds in-sandbox runs; beyond that the Spark LongType and
# Python int results would diverge on overflow.
MOD = 2_147_483_647
MULT = 2_654_435_761  # Knuth multiplicative constant

BASE_EPOCH_S = 1_700_000_000  # 2023-11-14T22:13:20Z; fixed feed epoch


def _h(col, c: int):
    """Portable hash as a Spark column: ((e + c) * MULT) % MOD.

    Stays far below 2^63 so Spark LongType and Python int agree exactly.
    """
    return ((col + F.lit(c)) * F.lit(MULT)) % F.lit(MOD)


def h_py(e: int, c: int) -> int:
    """The same portable hash in pure Python (for the oracle)."""
    return ((e + c) * MULT) % MOD


@dataclass(frozen=True)
class FeedSpec:
    """Seeded feed shape.  All fields feed pure functions of the event id."""

    n_events: int = 10_000
    n_conversations: int = 500
    turns_per_conversation: int = 10
    delete_pct: int = 5  # % of events that are deletes
    duplicate_pct: int = 3  # % of events re-emitted verbatim (at-least-once)
    hot_pct: int = 0  # % of events redirected to conversation 0 (skew)
    shuffle_window: int = 64  # out-of-order jitter in LSNs across chunks
    events_per_chunk: int = 2_000  # rotation analogue
    evolution_frac: float | None = None  # chunks >= frac*n carry tool_meta
    # Chunk file format.  "avro" matches the reference's Datastream output
    # (Avro files rotated at 100 MB / 60 s, datastream_streams.tf:73-79) and
    # needs the external spark-avro module on the classpath
    # (spark-submit --packages org.apache.spark:spark-avro_2.13:<ver>);
    # "parquet" is the default and always available.
    file_format: str = "parquet"
    # Sharded-upstream fan-in (SURVEY §2.8 ST+): with n_shards > 1 the feed
    # carries only the events whose conversation lands in `shard`
    # (conv % n_shards == shard) — the classic sharded-OLTP layout where
    # each source database owns a DISJOINT key range and one lake table
    # fans the shards in.  Event ids / LSNs stay global, so the union of
    # all shards is exactly the n_shards=1 feed and the pure-Python oracle
    # of the unsharded spec is the oracle for the fanned-in table.
    n_shards: int = 1
    shard: int = 0
    # Partial-update (patch) events: % of would-be updates emitted as
    # op="P" rows that carry ONLY a subset of payload columns (listed in
    # the envelope's ``patch_cols`` array; the rest are NULL meaning
    # "unchanged", not "set to null") — the Postgres-TOAST / Debezium
    # unavailable-column shape.  0 keeps the feed schema byte-identical
    # to the classic one (no patch_cols column at all).
    patch_pct: int = 0
    # Which column sets patch events carry (picked per event by hash).
    # Default mixes three shapes; a TOAST-realistic feed narrows it to
    # (("text",),) — patches then touch ONE column, the shape the fold's
    # per-column pruning is built for.
    patch_variants: tuple = PATCH_VARIANTS

    @property
    def n_keys(self) -> int:
        return self.n_conversations * self.turns_per_conversation

    @property
    def n_chunks(self) -> int:
        return max(1, -(-self.n_events // self.events_per_chunk))

    @property
    def evolution_chunk(self) -> int | None:
        if self.evolution_frac is None:
            return None
        return int(self.n_chunks * self.evolution_frac)


def change_events_df(spark: SparkSession, spec: FeedSpec) -> DataFrame:
    """The full event stream as one DataFrame (before chunking/duplication).

    Column-only construction => embarrassingly parallel, deterministic under
    any partitioning — the property that lets the identical feed be produced
    at local[8] and local[32] for the scaling-efficiency benchmark.
    """
    e = F.col("id")
    df = spark.range(0, spec.n_events)

    key_id = _h(e, 1) % F.lit(spec.n_keys)
    conv_nat = (key_id / F.lit(spec.turns_per_conversation)).cast("long")
    conv = F.when(_h(e, 2) % 100 < F.lit(spec.hot_pct), F.lit(0)).otherwise(conv_nat)
    turn = (key_id % F.lit(spec.turns_per_conversation)).cast("int")

    is_del = _h(e, 3) % 100 < F.lit(spec.delete_pct)
    # Patches replace a slice of the would-be updates (never inserts or
    # deletes): op="P" + patch_cols listing the carried columns, the
    # uncarried payload written as NULL-meaning-unchanged.
    is_patch = (
        (~is_del)
        & (_h(e, 4) % 3 != 0)
        & (_h(e, 37) % 100 < F.lit(spec.patch_pct))
    )
    patch_variant = (_h(e, 41) % len(spec.patch_variants)).cast("int")
    # I vs U is cosmetic for an upsert engine (both arms of the MERGE insert
    # when the key is absent); mark the key's plausible first event as I.
    op = (
        F.when(is_del, F.lit("D"))
        .when(is_patch, F.lit("P"))
        .when(_h(e, 4) % 3 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )

    lsn = e + F.lit(1)
    commit_ts = F.timestamp_seconds(F.lit(BASE_EPOCH_S) + e)

    words_arr = F.array(*[F.lit(w) for w in WORDS])
    n_words = (F.lit(3) + _h(e, 13) % 8).cast("int")
    picked = F.array(
        *[F.element_at(words_arr, (_h(e, 7 + j) % len(WORDS) + 1).cast("int"))
          for j in range(10)]
    )
    body = F.array_join(F.slice(picked, 1, n_words), " ")
    # Leading/trailing junk whitespace on ~25% of texts (normalization fodder).
    text = F.when(_h(e, 23) % 4 == 0, F.concat(F.lit("  "), body, F.lit(" \t"))).otherwise(body)

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (_h(e, 17) % 4 + 1).cast("int"))
    tool = F.when(role == "tool",
                  F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (_h(e, 19) % 4 + 1).cast("int")))
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH_S) + lsn)

    if spec.n_shards > 1:
        # disjoint key ownership: this shard emits only its conversations
        # (the FINAL conv — hot-skew redirects to conv 0 stay in shard 0)
        df = df.filter(conv % F.lit(spec.n_shards) == F.lit(spec.shard))

    null_s = F.lit(None).cast("string")
    null_t = F.lit(None).cast("timestamp")

    def _payload(name, val, null_lit):
        """NULL on deletes; on patches NULL unless the variant carries it."""
        carried = F.lit(False)
        for i, cols in enumerate(spec.patch_variants):
            if name in cols:
                carried = carried | (patch_variant == F.lit(i))
        return (
            F.when(is_del, null_lit)
            .when(is_patch & ~carried, null_lit)
            .otherwise(val)
            .alias(name)
        )

    pcols = (
        [
            F.when(
                is_patch,
                F.element_at(
                    F.array(*[
                        F.array(*[F.lit(c) for c in cols])
                        for cols in spec.patch_variants
                    ]),
                    patch_variant + 1,
                ),
            ).alias("patch_cols")
        ]
        if spec.patch_pct > 0
        else []
    )
    out = df.select(
        op.alias("op"),
        lsn.cast("long").alias("lsn"),
        commit_ts.alias("commit_ts"),
        F.format_string("conv%08d", conv.cast("int")).alias("conv_id"),
        turn.alias("turn_idx"),
        _payload("role", role, null_s),
        _payload("text", text, null_s),
        _payload("tool", tool, null_s),
        _payload("ts", ts, null_t),
        *pcols,
    )
    if spec.evolution_frac is not None:
        tool_meta = F.when(
            (F.col("role") == "tool"),
            F.format_string('{"call_id": %d}', (F.col("lsn") * 31) % 9973),
        )
        out = out.withColumn(EVOLVED_COLUMN.name, tool_meta)
    return out


def chunk_expr(spec: FeedSpec):
    """Chunk (file-group) assignment: lsn order + bounded jitter.

    Events land within ``shuffle_window`` LSNs of their in-order chunk, so the
    feed is *locally* out of order (the reference's Datastream files are
    commit-ordered; real network reorder is bounded) — exercising LWW without
    a global sort in the generator.
    """
    jitter = _h(F.col("lsn") - 1, 29) % F.lit(max(1, spec.shuffle_window))
    pos = F.col("lsn") - 1 + jitter - F.lit(spec.shuffle_window // 2)
    pos = F.greatest(pos, F.lit(0))
    return F.least(
        (pos / F.lit(spec.events_per_chunk)).cast("int"),
        F.lit(spec.n_chunks - 1),
    )


def _peek_avro_schema(paths: list[str]) -> T.StructType:
    """Reader schema for a pre-registry avro feed: the writer schema from
    the first container file's header (driver-side, header bytes only)."""
    from credix_data_pipeline_spark.sources import avro_lite

    for p in paths:
        cands = (
            [p] if p.endswith(".avro")
            else sorted(
                os.path.join(r, fn)
                for r, _, fns in os.walk(p)
                for fn in fns
                if fn.endswith(".avro")
            )
        )
        for fpath in cands:
            with open(fpath, "rb") as fh:
                return avro_lite.from_avro_schema(
                    avro_lite.decode_schema(fh.read(65536))
                )
    raise FileNotFoundError(f"no .avro files under {paths}")


def avro_available(spark: SparkSession) -> bool:
    """True iff the 'avro' data source resolves — the exact lookup the
    reader/writer performs (class presence alone is not enough; the
    external module must be registered)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def write_feed(spark: SparkSession, path: str, spec: FeedSpec) -> dict:
    """Materialize the feed directory: chunk=K/*.<format> + _feed.json +
    _schema.json (schema registry; grows at the evolution point)."""
    if spec.file_format not in ("parquet", "avro"):
        raise ValueError(f"unsupported feed format {spec.file_format!r}")
    # avro without the external spark-avro module falls back to the
    # vendored pure-Python OCF codec (sources/avro_lite.py) — the write
    # is still distributed (per-partition encode) and reads stay Arrow-
    # batched, so S4's "change files are Avro" shape runs everywhere
    lite_avro = spec.file_format == "avro" and not avro_available(spark)
    os.makedirs(path, exist_ok=True)
    df = change_events_df(spark, spec)
    base = df.withColumn("chunk", chunk_expr(spec))

    evo_chunk = spec.evolution_chunk
    has_evo = spec.evolution_frac is not None
    if has_evo:
        # tool_meta exists only for events whose *base* chunk is past the
        # switch-point; a duplicate re-emission must carry identical payload
        # (same lsn => same bytes) even when it lands in a later chunk.
        base = base.withColumn(
            EVOLVED_COLUMN.name,
            F.when(F.col("chunk") >= evo_chunk, F.col(EVOLVED_COLUMN.name)),
        )

    # At-least-once duplicates: re-emit ~duplicate_pct% of events verbatim
    # (same lsn & payload), landing one chunk later.
    dup_chunked = base.filter(
        _h(F.col("lsn") - 1, 31) % 100 < F.lit(spec.duplicate_pct)
    ).withColumn(
        "chunk", F.least(F.col("chunk") + F.lit(1), F.lit(spec.n_chunks - 1))
    )
    allev = base.unionByName(dup_chunked)
    fmt = spec.file_format

    def _write_group(df, sub):
        if lite_avro:
            from credix_data_pipeline_spark.sources import avro_lite

            sch = T.StructType(
                [f for f in df.schema.fields if f.name != "chunk"]
            )
            avro_lite.write_avro_partitioned(
                df, os.path.join(path, sub), sch
            )
        else:
            df.write.partitionBy("chunk").mode("overwrite").format(
                fmt
            ).save(os.path.join(path, sub))

    if has_evo:
        _write_group(
            allev.filter(F.col("chunk") < evo_chunk).drop(
                EVOLVED_COLUMN.name
            ),
            "pre",
        )
        _write_group(allev.filter(F.col("chunk") >= evo_chunk), "post")
    else:
        _write_group(allev, "pre")

    # Enumerate chunk dirs in replay order (chunk id = arrival order).
    chunks: list[str] = []
    for sub in ("pre", "post"):
        root = os.path.join(path, sub)
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith("chunk="):
                chunks.append((int(d.split("=")[1]), os.path.join(sub, d)))
    chunks = [p for _, p in sorted(chunks)]

    # NB: StructType.add() mutates in place — build a fresh StructType.
    base_schema = CHANGE_SCHEMA
    if spec.patch_pct > 0:
        # partial-update feeds carry the patch_cols ENVELOPE column —
        # registered like any other writer schema so reads project it
        base_schema = T.StructType([
            *CHANGE_SCHEMA.fields,
            T.StructField("patch_cols", T.ArrayType(T.StringType()), True),
        ])
    evolved = T.StructType([*base_schema.fields, EVOLVED_COLUMN])
    schema = base_schema if not has_evo else evolved
    # Per-subdir reader schemas — the schema-registry analogue of
    # Datastream's discovery output: a chunk group is read with the schema
    # its writer used, and groups align via unionByName (works identically
    # for parquet and avro; avro cannot pad late-added columns on its own).
    schemas = {"pre": base_schema.jsonValue()}
    if has_evo:
        schemas["post"] = evolved.jsonValue()
    manifest = {
        "spec": asdict(spec),
        "chunks": chunks,
        "n_chunks": spec.n_chunks,
        "evolution_chunk": evo_chunk,
        "format": fmt,
        "schema": schema.jsonValue(),
        "schemas": schemas,
    }
    with open(os.path.join(path, "_feed.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_feed.json")) as f:
        return json.load(f)


def append_chunk(spark: SparkSession, path: str, df: DataFrame) -> str:
    """Append one chunk of change events to an existing feed (the
    dead-letter REQUEUE path: repaired events re-enter the stream as a
    fresh chunk at the tail, so any replica tailing the feed picks them up
    through the normal replay loop).  The chunk gets its own subdir +
    schema-registry entry — requeued rows may carry an older feed shape
    than the live head, and the per-subdir registry is exactly the
    mechanism that aligns them (``read_chunks`` unionByName).  Manifest
    update is atomic (tmp + rename)."""
    import uuid as _uuid

    # Exclusive append lock (O_EXCL create is atomic on a local/posix fs):
    # the manifest update is read-modify-write, so two concurrent appends
    # would compute the same ordinal and the losing rename would drop the
    # winner's chunk entry — refuse loudly instead of losing data.
    lock = os.path.join(path, "_feed.lock")
    try:
        lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"another append to the feed at {path} is in progress "
            "(_feed.lock exists); retry when it completes — or remove a "
            "stale lock left by a crash"
        ) from None
    try:
        man = read_manifest(path)
        ordinal = len(man["chunks"])
        # uuid dir: even a crashed/raced append can never overwrite
        # another append's already-written chunk files
        sub = f"requeue-{_uuid.uuid4().hex[:12]}"
        rel = f"{sub}/chunk={ordinal}"
        fmt = man.get("format", "parquet")
        if fmt == "avro" and not avro_available(df.sparkSession):
            from credix_data_pipeline_spark.sources import avro_lite

            avro_lite.write_avro_partitioned(
                df, os.path.join(path, rel), df.schema, chunk_col=None
            )
        else:
            df.write.mode("overwrite").format(fmt).save(
                os.path.join(path, rel)
            )
        man["chunks"].append(rel)
        man.setdefault("schemas", {})[sub] = df.schema.jsonValue()
        tmp = os.path.join(path, f"_feed.json.tmp-{ordinal}")
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(path, "_feed.json"))
        return rel
    finally:
        os.close(lock_fd)
        os.unlink(lock)


def read_chunks(
    spark: SparkSession,
    path: str,
    chunk_paths: list[str],
    file_format: str = "parquet",
    schemas: dict[str, dict] | None = None,
) -> DataFrame:
    """Batch-read a set of chunk dirs.

    With ``schemas`` (the manifest's per-subdir schema registry), each chunk
    group is read with its WRITER schema and the groups align via
    ``unionByName(allowMissingColumns=True)`` — this is how in-flight column
    adds surface to the engine, and it is format-agnostic: avro cannot pad a
    late-added column itself (no reader-schema defaults), and the explicit
    schema also spares parquet the per-file footer merge.  Without
    ``schemas`` (a pre-registry manifest), parquet falls back to
    ``mergeSchema`` discovery and other formats to engine inference.
    """
    def _read(paths: list[str], schema: T.StructType | None) -> DataFrame:
        if file_format == "avro" and not avro_available(spark):
            # vendored OCF decode: binaryFile scan → mapInPandas, typed
            # under the registry schema (sources/avro_lite.py)
            from credix_data_pipeline_spark.sources import avro_lite

            if schema is None:
                schema = _peek_avro_schema(paths)
            return avro_lite.read_avro_dirs(spark, paths, schema)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        elif file_format == "parquet":
            reader = reader.option("mergeSchema", "true")
        # NB: load() positionals are (path, format, ...) — pass ONE list
        df = reader.format(file_format).load(paths)
        if "chunk" in df.columns:  # partition col inferred from dir names
            df = df.drop("chunk")
        return df

    if not schemas:
        return _read([os.path.join(path, c) for c in chunk_paths], None)

    groups: dict[str, list[str]] = {}
    for c in chunk_paths:
        sub = c.split(os.sep, 1)[0] if os.sep in c else c.split("/", 1)[0]
        groups.setdefault(sub, []).append(os.path.join(path, c))
    out: DataFrame | None = None
    for sub in sorted(groups):  # deterministic group order
        schema = (
            T.StructType.fromJson(schemas[sub]) if sub in schemas else None
        )
        part = _read(groups[sub], schema)
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=True)
        )
    return out
