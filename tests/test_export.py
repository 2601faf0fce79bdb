"""Clean-data export (pipelines/export.py)."""

import glob
import os

import pandas as pd

SF = "sf0.001"


def test_clean_export_integrity(ray_session, tmp_path):
    """Survivors carry byte-identical text (north-star per-turn equality),
    no excluded conversation or flagged row key remains, duplicates
    collapse to one copy, and the sink rewrite is idempotent."""
    from bio_data_validation_ray.pipelines.export import (
        exclusions_from_violations,
        write_clean_output,
    )
    from bio_data_validation_ray.pipelines.queries import run_validation
    from bio_data_validation_ray.sources.transcripts import ensure_transcripts

    _, vio = run_validation(f"/root/testdata/{SF}")
    d = ensure_transcripts(SF)
    out_dir = str(tmp_path / "clean")
    summary = write_clean_output(d, out_dir, violations=vio)
    clean = pd.read_parquet(out_dir)
    assert summary["rows_out"] == len(clean)

    bad_convs, bad_rows = exclusions_from_violations(vio)
    assert bad_convs and bad_rows  # the seeded fixture flags both kinds
    assert not clean["conv_id"].isin(bad_convs).any()
    keys = set(zip(clean["conv_id"], clean["turn_idx"].astype(int)))
    assert not (keys & bad_rows)
    # duplicates collapsed: survivor rows unique on the full data key
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "shard"]
    assert not clean.duplicated(cols).any()

    # byte-identical passthrough: every survivor row exists verbatim in
    # the input (join on the full key incl. text)
    raw = pd.concat(
        [pd.read_parquet(f).assign(shard=os.path.basename(f))
         for f in sorted(glob.glob(d + "/*.parquet"))],
        ignore_index=True,
    )
    merged = clean.merge(raw.drop_duplicates(cols), on=cols, how="left",
                         indicator=True)
    assert (merged["_merge"] == "both").all()

    # idempotent rewrite
    files1 = sorted(os.listdir(out_dir))
    write_clean_output(d, out_dir, violations=vio)
    assert sorted(os.listdir(out_dir)) == files1
    assert len(pd.read_parquet(out_dir)) == len(clean)


def test_cross_block_dup_collapse(ray_session):
    """A whole-row duplicate pair that STRADDLES two Ray blocks (each block
    locally deduped already) collapses to one copy — per-batch
    drop_duplicates alone would miss it because blocks are not files
    (row-group splits / dynamic block splitting)."""
    import ray.data as rd

    from bio_data_validation_ray.pipelines.export import (
        DATA_COLS,
        collapse_cross_block_dups,
    )

    def mk(rows):
        return pd.DataFrame(rows, columns=DATA_COLS + ["shard"])

    dup = ("c1", 0, "user", "same text", None,
           pd.Timestamp("2024-01-01"), "s0.parquet")
    blk_a = mk([dup, ("c1", 1, "assistant", "uniq a", None,
                      pd.Timestamp("2024-01-01"), "s0.parquet")])
    blk_b = mk([dup, ("c2", 0, "user", "uniq b", "search",
                      pd.Timestamp("2024-01-02"), "s1.parquet")])
    # two from_pandas datasets union → the dup pair sits in separate blocks
    ds = rd.from_pandas(blk_a).union(rd.from_pandas(blk_b))
    out = collapse_cross_block_dups(ds).to_pandas()
    cols = DATA_COLS + ["shard"]
    assert len(out) == 3
    assert not out.duplicated(cols).any()
    expected = (pd.concat([blk_a, blk_b]).drop_duplicates(cols)
                .sort_values(cols).reset_index(drop=True))
    got = out[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected)


def test_clean_export_resumable_parity(ray_session, tmp_path):
    """The export driven by a RESUMABLE run's violations (group dirs +
    conv-final) must produce the same survivors as one driven by a direct
    run."""
    from bio_data_validation_ray.pipelines.export import write_clean_output
    from bio_data_validation_ray.pipelines.validate import (
        validate_dir,
        validate_resumable,
    )
    from bio_data_validation_ray.sources.transcripts import ensure_transcripts

    d = ensure_transcripts(SF)
    r1 = str(tmp_path / "direct")
    validate_dir(d, run_dir=r1, resume=False, concurrency=2)
    r2 = str(tmp_path / "resumable")
    validate_resumable(d, run_dir=r2, files_per_pass=3, concurrency=2)
    out1 = str(tmp_path / "clean1")
    out2 = str(tmp_path / "clean2")
    write_clean_output(d, out1,
                       violations=pd.read_parquet(os.path.join(r1, "violations")))
    write_clean_output(d, out2,
                       violations=pd.read_parquet(os.path.join(r2, "violations")))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "shard"]
    a = pd.read_parquet(out1)[cols].sort_values(cols).reset_index(drop=True)
    b = pd.read_parquet(out2)[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
