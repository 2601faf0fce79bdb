"""Deterministic synthetic transcript tables (the BASELINE.json input_hint
shape: conv_id, turn_idx, role, text, tool, ts).

Generation is pure-numpy vectorized, seeded (seed=42 by default, FIXTURES.md),
and derives from nothing external. Tables are cached as sharded Parquet under
/tmp so the Ray pipeline and the DuckDB oracle read byte-identical inputs
(the driver's DuckDB can `read_parquet('<dir>/*.parquet', filename=true)`).

Violation seeding mirrors FIXTURES.md §1 (V3-V13): each recipe targets a
disjoint, deterministic row set so expected per-rule counts are exact.
The fixture style follows the reference's seeded-violation integration
fixtures (scripts/test_phase2_integration.py:26-57 in /root/reference).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GENERATOR_VERSION = "4"
CACHE_ROOT = "/tmp/bdvr_transcripts"
EPOCH_US = np.int64(1_735_689_600_000_000)  # 2025-01-01T00:00:00 UTC in µs

TOOLS = np.array(
    ["search_web", "run_code", "read_file", "sql_query", "calc", "fetch_url"],
    dtype=object,
)
WORDS = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango".split(),
    dtype=object,
)

# conversations-per-sf for the driver's three scale factors
SF_N_CONVS = {"sf0.001": 240, "sf0.01": 2400, "sf0.1": 24000}
N_SHARDS = 8


def _conv_ids(conv_idx: np.ndarray) -> np.ndarray:
    return np.char.add("conv-", np.char.zfill(conv_idx.astype("U8"), 8)).astype(object)


def generate(
    n_convs: int,
    *,
    seed: int = 42,
    violations: bool = True,
    mean_len: int = 18,
    hot_convs: int = 2,
    hot_len: int = 1500,
    n_shards: int = N_SHARDS,
    conv_offset: int = 0,
) -> tuple[pa.Table, np.ndarray]:
    """Return (table, shard_assignment). Rows are sorted by (conv, turn)
    except for appended duplicate rows (which land at the end of their shard).
    ``conv_offset`` shifts conv ids/shards for chunked generation of very
    large tables (each chunk is independent and memory-bounded).
    """
    rng = np.random.default_rng(seed)

    lengths = 2 + rng.geometric(1.0 / mean_len, size=n_convs)
    if n_convs > hot_convs:
        lengths[:hot_convs] = hot_len  # heavy tail: exercises hot-key handling
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])

    conv_idx = np.repeat(np.arange(conv_offset, conv_offset + n_convs), lengths)
    turn_idx = (np.arange(total) - np.repeat(offsets, lengths)).astype(np.int64)

    # roles: turn0=system, then user/assistant alternating, ~8% tool turns
    r = rng.random(total)
    role = np.where(turn_idx % 2 == 1, "user", "assistant").astype(object)
    role[(turn_idx >= 2) & (r < 0.08)] = "tool"
    role[turn_idx == 0] = "system"

    tool = np.full(total, None, dtype=object)
    is_tool = role == "tool"
    tool[is_tool] = TOOLS[rng.integers(0, len(TOOLS), size=int(is_tool.sum()))]

    # text: deterministic fn of (conv_id, turn_idx) + variable-length filler
    w1 = WORDS[(conv_idx * 7 + turn_idx * 3) % len(WORDS)]
    w2 = WORDS[(conv_idx * 11 + turn_idx * 5) % len(WORDS)]
    reps = rng.integers(0, 12, size=total)
    filler = np.char.multiply(np.full(total, " lorem", dtype="U6"), reps).astype(object)
    conv_ids = _conv_ids(conv_idx)
    text = (
        "turn "
        + turn_idx.astype("U8").astype(object)
        + " of "
        + conv_ids
        + ": "
        + w1
        + " "
        + w2
        + filler
    )

    # ts: per-conv start spaced 60s apart, per-turn deltas 1..120s, grouped cumsum
    deltas = rng.integers(1, 121, size=total).astype(np.int64) * 1_000_000
    cs = np.cumsum(deltas)
    group_cs = cs - np.repeat(cs[offsets] - deltas[offsets], lengths)
    ts = EPOCH_US + conv_idx * 60_000_000 + group_cs

    shard = (conv_idx % n_shards).astype(np.int64)

    if violations:
        n_seed = max(3, total // 2000)
        # eligible rows: not turn 0 and not in the hot convs (keeps recipes local)
        eligible = np.flatnonzero(
            (turn_idx >= 2) & (conv_idx >= conv_offset + hot_convs)
        )
        perm = rng.permutation(eligible)
        _used: list[int] = []

        def grab(k):
            out = perm[len(_used) : len(_used) + k]
            _used.extend(out.tolist())
            return out

        i_turn_neg = grab(n_seed)      # V3: turn_idx = -3 -> range + contiguity
        i_role_bad = grab(n_seed)      # V4: role vocabulary
        i_tool_pat = grab(n_seed)      # V5: tool pattern
        i_tool_role = grab(n_seed)     # V6: tool set while role=user
        i_text_empty = grab(n_seed)    # V7
        i_text_null = grab(n_seed)     # V8
        i_ts_low = grab(n_seed)        # V11: ts in 1970
        i_ts_high = grab(n_seed)       # V11: ts in 2200
        i_ts_mono = grab(n_seed)       # ts decreasing within conv
        i_dup_key = grab(n_seed)       # V9: duplicated (conv_id, turn_idx)
        i_dup_row = grab(n_seed)       # V13: whole-row duplicates

        turn_idx[i_turn_neg] = -3
        role[i_role_bad] = "narrator"
        role[i_tool_pat] = "tool"
        tool[i_tool_pat] = "Bad Tool!"
        role[i_tool_role] = "user"
        tool[i_tool_role] = "sneaky_tool"
        text[i_text_empty] = ""
        text[i_text_null] = None
        ts[i_ts_low] = np.int64(4 * 86_400_000_000)        # 1970-01-05
        ts[i_ts_high] = np.int64(7_258_118_400_000_000)    # 2200-01-01
        ts[i_ts_mono] = ts[i_ts_mono] - np.int64(3_600_000_000)  # 1h back

        # duplicated keys: copy rows, change the text (key dup, not row dup)
        dup_key_rows = {
            "conv_idx": conv_idx[i_dup_key],
            "turn_idx": turn_idx[i_dup_key],
            "role": role[i_dup_key],
            "tool": tool[i_dup_key],
            "text": np.char.add(text[i_dup_key].astype("U"), " (retry)").astype(object),
            "ts": ts[i_dup_key] + 1_000_000,
            "shard": shard[i_dup_key],
        }
        # whole-row duplicates: exact copies
        dup_row_rows = {
            "conv_idx": conv_idx[i_dup_row],
            "turn_idx": turn_idx[i_dup_row],
            "role": role[i_dup_row],
            "tool": tool[i_dup_row],
            "text": text[i_dup_row],
            "ts": ts[i_dup_row],
            "shard": shard[i_dup_row],
        }

        conv_idx = np.concatenate([conv_idx, dup_key_rows["conv_idx"], dup_row_rows["conv_idx"]])
        turn_idx = np.concatenate([turn_idx, dup_key_rows["turn_idx"], dup_row_rows["turn_idx"]])
        role = np.concatenate([role, dup_key_rows["role"], dup_row_rows["role"]])
        tool = np.concatenate([tool, dup_key_rows["tool"], dup_row_rows["tool"]])
        text = np.concatenate([text, dup_key_rows["text"], dup_row_rows["text"]])
        ts = np.concatenate([ts, dup_key_rows["ts"], dup_row_rows["ts"]])
        shard = np.concatenate([shard, dup_key_rows["shard"], dup_row_rows["shard"]])

        # V10: gaps — drop one mid-conversation row from n_seed distinct convs
        gap_convs = (np.arange(n_seed) * 17 + hot_convs + 1) % n_convs
        gap_convs = np.unique(gap_convs[gap_convs >= hot_convs])
        drop_rows = offsets[gap_convs] + 1  # drop turn_idx==1
        keep = np.ones(conv_idx.size, dtype=bool)
        keep[drop_rows] = False
        conv_idx, turn_idx, role, tool, text, ts, shard = (
            a[keep] for a in (conv_idx, turn_idx, role, tool, text, ts, shard)
        )

        # V12: conversations spanning shards — odd turns to a different shard
        span_convs = (np.arange(max(2, n_seed // 2)) * 13 + hot_convs + 3) % n_convs
        span_convs = np.unique(span_convs[span_convs >= hot_convs]) + conv_offset
        span_mask = np.isin(conv_idx, span_convs) & (turn_idx % 2 == 1)
        shard[span_mask] = (shard[span_mask] + 1) % n_shards

    conv_ids = _conv_ids(conv_idx)
    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    return table, shard


def sf_name_of(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return name if name.startswith("sf") else "sf0.01"


def ensure_transcripts(
    sf: str,
    *,
    clean: bool = False,
    n_convs: int | None = None,
    seed: int = 42,
    n_shards: int = N_SHARDS,
    mean_len: int = 18,
) -> str:
    """Generate-and-cache the transcript table for a scale factor (or an
    explicit ``n_convs``). Returns the directory of shard_*.parquet files.
    Atomic (tmp dir + rename) so concurrent callers are safe.
    """
    sf = sf_name_of(sf)
    if n_convs is None:
        n_convs = SF_N_CONVS.get(sf, SF_N_CONVS["sf0.01"])
    tag = f"{sf}-n{n_convs}-s{seed}" + (f"-m{mean_len}" if mean_len != 18 else "") \
        + ("-clean" if clean else "")
    out_dir = os.path.join(CACHE_ROOT, f"v{GENERATOR_VERSION}", tag)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir
    tmp = out_dir + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    # convs per generation chunk — bounds peak memory at ~4.5M rows/chunk
    CHUNK = max(1000, 4_500_000 // mean_len)
    if n_convs <= CHUNK:
        table, shard = generate(
            n_convs, seed=seed, violations=not clean, n_shards=n_shards,
            mean_len=mean_len,
        )
        for s in range(n_shards):
            mask = shard == s
            if not mask.any():
                continue
            sub = table.filter(pa.array(mask))
            pq.write_table(sub, os.path.join(tmp, f"shard_{s:04d}.parquet"))
    else:
        # ONE file per shard, one row group per generation chunk
        # (ParquetWriter streams, so peak memory stays one chunk): a
        # per-(chunk, shard) file layout produced chunks*shards tiny
        # files, and every extra file costs the scan a footer fetch plus
        # a read task — at 2304 files that was ~6 s of pure serial
        # driver time per validation run, the dominant Amdahl term in
        # the measured scaling pair
        writers: dict[int, pq.ParquetWriter] = {}
        try:
            for ci, off in enumerate(range(0, n_convs, CHUNK)):
                nc = min(CHUNK, n_convs - off)
                table, shard = generate(
                    nc, seed=seed + ci, violations=not clean,
                    n_shards=n_shards, conv_offset=off, mean_len=mean_len,
                )
                for s in range(n_shards):
                    mask = shard == s
                    if not mask.any():
                        continue
                    sub = table.filter(pa.array(mask))
                    w = writers.get(s)
                    if w is None:
                        w = pq.ParquetWriter(
                            os.path.join(tmp, f"shard_{s:04d}.parquet"),
                            sub.schema)
                        writers[s] = w
                    w.write_table(sub)
        finally:
            for w in writers.values():
                w.close()
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out_dir
