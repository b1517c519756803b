"""Pure-Python replay oracle (SURVEY §5.2.1, FIXTURES determinism rules).

Replays the *same* deterministic feed spec event-by-event in global LSN order
into a dict — the ~30-line LWW reference implementation the engine's final
table state must equal byte-for-byte on per-turn text under stable
(conv_id, turn_idx) ordering (BASELINE.json ``input_hint``).
"""

from __future__ import annotations

from datetime import datetime, timezone

from credix_data_pipeline_spark.functions.normalize import normalize_text_py
from credix_data_pipeline_spark.sources.feed import (
    BASE_EPOCH_S,
    PATCH_VARIANTS,
    ROLES,
    TOOLS,
    WORDS,
    FeedSpec,
    h_py,
)


def _utc(seconds: int) -> datetime:
    return datetime.fromtimestamp(seconds, tz=timezone.utc)


def event_py(e: int, spec: FeedSpec) -> dict:
    """Reproduce one change event exactly as sources/feed.change_events_df."""
    key_id = h_py(e, 1) % spec.n_keys
    conv = key_id // spec.turns_per_conversation
    if h_py(e, 2) % 100 < spec.hot_pct:
        conv = 0
    turn = key_id % spec.turns_per_conversation

    is_del = h_py(e, 3) % 100 < spec.delete_pct
    is_patch = (
        (not is_del)
        and (h_py(e, 4) % 3 != 0)
        and (h_py(e, 37) % 100 < spec.patch_pct)
    )
    op = (
        "D" if is_del
        else ("P" if is_patch
              else ("I" if h_py(e, 4) % 3 == 0 else "U"))
    )
    lsn = e + 1

    n_words = 3 + h_py(e, 13) % 8
    body = " ".join(
        WORDS[h_py(e, 7 + j) % len(WORDS)] for j in range(n_words)
    )
    text = f"  {body} \t" if h_py(e, 23) % 4 == 0 else body
    role = ROLES[h_py(e, 17) % 4]
    tool = TOOLS[h_py(e, 19) % 4] if role == "tool" else None

    variants = getattr(spec, "patch_variants", PATCH_VARIANTS)
    patch_cols = (
        list(variants[h_py(e, 41) % len(variants)])
        if is_patch
        else None
    )

    def _pv(name, val):
        if is_del:
            return None
        if is_patch and name not in patch_cols:
            return None  # uncarried on a patch: "unchanged", not "null"
        return val

    ev = {
        "op": op,
        "lsn": lsn,
        "commit_ts": _utc(BASE_EPOCH_S + e),
        "conv_id": f"conv{conv:08d}",
        "turn_idx": turn,
        "role": _pv("role", role),
        "text": _pv("text", text),
        "tool": _pv("tool", tool),
        "ts": _pv("ts", _utc(BASE_EPOCH_S + lsn)),
    }
    if spec.patch_pct > 0:
        ev["patch_cols"] = patch_cols
    if spec.evolution_frac is not None:
        ev["tool_meta"] = (
            '{"call_id": %d}' % ((lsn * 31) % 9973)
            if (role == "tool" and not is_del and chunk_py(e, spec) >= spec.evolution_chunk)
            else None
        )
    return ev


def shard_py(e: int, spec: FeedSpec) -> int:
    """Which shard (sources/feed.FeedSpec n_shards/shard) event ``e`` lands
    in: conv % n_shards, after the hot-skew redirect — mirrors the
    change_events_df filter exactly."""
    key_id = h_py(e, 1) % spec.n_keys
    conv = key_id // spec.turns_per_conversation
    if h_py(e, 2) % 100 < spec.hot_pct:
        conv = 0
    return conv % spec.n_shards


def chunk_py(e: int, spec: FeedSpec) -> int:
    lsn = e + 1
    jitter = h_py(lsn - 1, 29) % max(1, spec.shuffle_window)
    pos = max(lsn - 1 + jitter - spec.shuffle_window // 2, 0)
    return min(pos // spec.events_per_chunk, spec.n_chunks - 1)


_ENVELOPE = ("op", "lsn", "commit_ts", "patch_cols")


def replay_oracle(spec: FeedSpec, normalize: bool = True) -> dict[tuple, dict]:
    """Global-LSN-order LWW replay → {(conv_id, turn_idx): row}.

    Partial-update events (op="P") fold: only the columns listed in
    ``patch_cols`` change, everything else is carried from the current
    row (or NULL when the key doesn't exist — a patch revives/creates
    with just its carried columns, the engine's documented semantic)."""
    state: dict[tuple, dict] = {}
    for e in range(spec.n_events):  # e order == lsn order
        ev = event_py(e, spec)
        k = (ev["conv_id"], ev["turn_idx"])
        if ev["op"] == "D":
            state.pop(k, None)
        elif ev["op"] == "P":
            cur = state.get(k)
            row = (
                dict(cur)
                if cur is not None
                else {
                    c: (ev[c] if c in ("conv_id", "turn_idx") else None)
                    for c in ev
                    if c not in _ENVELOPE
                }
            )
            for c in ev["patch_cols"]:
                row[c] = (
                    normalize_text_py(ev[c])
                    if normalize and c == "text"
                    else ev[c]
                )
            row["_lsn"] = ev["lsn"]
            state[k] = row
        else:
            row = {c: ev[c] for c in ev if c not in _ENVELOPE}
            if normalize:
                row["text"] = normalize_text_py(row["text"])
            row["_lsn"] = ev["lsn"]
            state[k] = row
    return state


def oracle_sorted_rows(spec: FeedSpec, normalize: bool = True) -> list[tuple]:
    """Stable (conv_id, turn_idx)-ordered [(conv_id, turn_idx, text)] for the
    byte-equality invariant."""
    state = replay_oracle(spec, normalize=normalize)
    return sorted(
        (k[0], k[1], v["text"]) for k, v in state.items()
    )
