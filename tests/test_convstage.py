"""Direct unit tests for the segment-merge core (no Ray): hot conversations
spread over many segments, overlap flagging, monotonicity semantics."""

import numpy as np
import pandas as pd

from bio_data_validation_ray.stages.convstage import (
    exact_conv_frame,
    merge_segments_frame,
)


def seg_row(conv, shard, lo, hi, n=None, dup=0, mn=None, mx=None, mono=True):
    n = n if n is not None else (hi - lo + 1)
    mn = mn if mn is not None else lo * 1000
    mx = mx if mx is not None else hi * 1000
    return {"shard": shard, "conv_id": conv, "seg_turn_lo": lo,
            "seg_turn_hi": hi, "seg_n": n, "seg_dup": dup,
            "seg_min_ts": mn, "seg_max_ts": mx, "seg_mono_ok": mono}


def merge(rows):
    return merge_segments_frame(pd.DataFrame(rows)).set_index("conv_id")


def test_shards_string_matches_independent_reference():
    """The multi-shard 'shards' column is built from the merge's own
    per-(conv, shard) pair arrays; pin it (and n_shards/main_shard)
    against an INDEPENDENT pandas-groupby reference over the raw
    segments — sorted-set join, lexicographic main-shard tie-break on
    max row count."""
    import numpy as np

    rng = np.random.default_rng(4)
    rows = []
    for i in range(4000):
        rows.append({
            "shard": f"shard_{rng.integers(0, 7):02d}.parquet",
            "conv_id": f"conv-{rng.integers(0, 900):05d}",
            "seg_turn_lo": (lo := int(rng.integers(0, 50))),
            "seg_turn_hi": lo + int(rng.integers(1, 8)) - 1,
            "seg_n": int(rng.integers(1, 8)),
            "seg_dup": int(rng.integers(0, 2)),
            "seg_min_ts": int(1e15 + rng.integers(0, 1e9)),
            "seg_max_ts": int(1e15 + rng.integers(1e9, 2e9)),
            "seg_mono_ok": bool(rng.random() < 0.9),
        })
    df = pd.DataFrame(rows)
    out = merge_segments_frame(df).set_index("conv_id")
    ref_shards = df.groupby("conv_id")["shard"].agg(
        lambda s: ",".join(sorted(set(s))))
    ref_nsh = df.groupby("conv_id")["shard"].nunique()
    per_pair = df.groupby(["conv_id", "shard"])["seg_n"].sum()

    def ref_main(conv):
        p = per_pair.loc[conv]
        mx = p.max()
        return sorted(p[p == mx].index)[0]

    assert len(out) == len(ref_shards)
    for conv in ref_shards.index:
        assert out.loc[conv, "n_shards"] == ref_nsh[conv]
        assert out.loc[conv, "main_shard"] == ref_main(conv), conv
        expect = (ref_shards[conv] if ref_nsh[conv] > 1
                  else out.loc[conv, "main_shard"])
        assert out.loc[conv, "shards"] == expect, conv


class TestSegmentMerge:
    def test_hot_conv_many_disjoint_segments(self):
        # a 1M-turn conversation split into 100 tiling segments (the
        # hot-conversation path: per-batch partials ARE the salt buckets —
        # no single task ever holds the whole conversation)
        rows = [
            seg_row("hot", "s0", i * 10_000, (i + 1) * 10_000 - 1)
            for i in range(100)
        ]
        out = merge(rows)
        r = out.loc["hot"]
        assert r["n_rows"] == 1_000_000
        assert r["contiguous"] and r["mono_ok"] and not r["needs_exact"]
        assert r["dup_turns"] == 0 and r["n_shards"] == 1

    def test_gap_detected_across_segments(self):
        rows = [seg_row("c", "s0", 0, 9), seg_row("c", "s0", 11, 20)]
        r = merge(rows).loc["c"]
        assert not r["contiguous"] and not r["needs_exact"]

    def test_overlap_flags_exact(self):
        rows = [seg_row("c", "s0", 0, 10), seg_row("c", "s1", 5, 20)]
        r = merge(rows).loc["c"]
        assert r["needs_exact"]

    def test_cross_segment_ts_regression(self):
        # segment 2 starts earlier in time than segment 1 ended
        rows = [
            seg_row("c", "s0", 0, 9, mn=0, mx=10_000),
            seg_row("c", "s0", 10, 19, mn=5_000, mx=20_000),
        ]
        r = merge(rows).loc["c"]
        assert not r["mono_ok"] and not r["needs_exact"]
        # and the non-regressing variant is fine
        rows2 = [
            seg_row("d", "s0", 0, 9, mn=0, mx=4_000),
            seg_row("d", "s0", 10, 19, mn=5_000, mx=20_000),
        ]
        assert merge(rows2).loc["d"]["mono_ok"]

    def test_multi_shard_and_main_shard(self):
        rows = [
            seg_row("c", "s_b", 0, 9),            # 10 rows
            seg_row("c", "s_a", 10, 29),          # 20 rows -> main
        ]
        r = merge(rows).loc["c"]
        assert r["n_shards"] == 2
        assert r["main_shard"] == "s_a"
        assert r["shards"] == "s_a,s_b"

    def test_main_shard_tie_breaks_lexicographically(self):
        rows = [seg_row("c", "s_b", 0, 9), seg_row("c", "s_a", 10, 19)]
        assert merge(rows).loc["c"]["main_shard"] == "s_a"

    def test_within_segment_dups_counted(self):
        rows = [seg_row("c", "s0", 0, 9, n=12, dup=2)]
        r = merge(rows).loc["c"]
        assert r["dup_turns"] == 2 and r["n_distinct"] == 10
        assert r["contiguous"]  # distinct turns still tile 0..9

    def test_many_convs_vectorized(self):
        rng = np.random.default_rng(0)
        rows = []
        for i in range(5000):
            rows.append(seg_row(f"conv-{i:06d}", f"s{i % 7}", 0, 19))
        out = merge_segments_frame(pd.DataFrame(rows))
        assert len(out) == 5000
        assert out["contiguous"].all() and (out["n_shards"] == 1).all()


class TestExactFrame:
    def make_rows(self, turns, ts, conv="c", shard="s0"):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": turns,
                "ts": pd.to_datetime(np.asarray(ts) * 1_000, unit="us"),
                "shard": shard,
            }
        )

    def test_exact_dup_and_gap(self):
        rows = self.make_rows([0, 1, 1, 3], [10, 20, 25, 40])
        res, _ = exact_conv_frame(rows)
        r = res.set_index("conv_id").loc["c"]
        assert r["dup_turns"] == 1 and not r["contiguous"]

    def test_exact_mono_with_duplicate_turns(self):
        # EXISTS-pair definition: duplicate turn values don't create false
        # positives; a genuinely earlier ts at a later turn does
        ok = self.make_rows([0, 1, 1, 2], [10, 30, 20, 40])
        res, _ = exact_conv_frame(ok)
        assert res.iloc[0]["mono_ok"]
        bad = self.make_rows([0, 1, 2], [10, 40, 30])
        res2, _ = exact_conv_frame(bad)
        assert not res2.iloc[0]["mono_ok"]

    def test_exact_rowdups_with_content(self):
        rows = self.make_rows([0, 1, 1], [10, 20, 20])
        rows["role"] = ["user", "assistant", "assistant"]
        rows["text"] = ["a", "b", "b"]
        rows["tool"] = [None, None, None]
        _, rowdups = exact_conv_frame(rows)
        assert len(rowdups) == 1 and rowdups.iloc[0]["turn_idx"] == 1
