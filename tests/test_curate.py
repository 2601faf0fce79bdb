"""Composed curation pipeline (pipelines/curate.py)."""

import numpy as np
import pandas as pd

from bio_data_validation_ray.functions.dedup import char_shingles
from bio_data_validation_ray.pipelines.curate import curate_documents


def _docs():
    rng = np.random.default_rng(47)
    letters = list("abcdefghijklmnop")
    words = ["".join(rng.choice(letters, 6)) for _ in range(200)]
    base = [" ".join(rng.choice(words, 40)) + "." for _ in range(20)]
    rows = list(enumerate(base))
    rows.append((100, base[3]))             # exact duplicate of doc 3
    # near duplicate: periodic strings share the same 5-gram set
    p1, p2 = "abcab " * 20 + "x.", "abcab " * 24 + "x."
    assert np.array_equal(char_shingles(p1), char_shingles(p2))
    rows.append((101, p1))
    rows.append((102, p2))
    rows.append((103, "too short."))        # quality fail
    # digit heavy but alpha-sufficient (low_alpha has priority otherwise):
    # per repeat: 8 alpha, 5 digit, 15 chars -> 53% alpha, 33% digit
    rows.append((104, "abcdefgh 12345 " * 10 + "x."))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_curate_verdicts(ray_session):
    import ray.data as rd

    df = _docs()
    out = curate_documents(rd.from_pandas(df), min_tokens=3,
                           require_terminal_punct=False)
    v = out.set_index("doc_id")
    assert v.loc[3, "keep"] and v.loc[3, "stage"] == ""
    assert not v.loc[100, "keep"] and v.loc[100, "stage"] == "exact_dup"
    assert v.loc[101, "keep"]                      # canonical of the pair
    assert v.loc[102, "stage"] == "near_dup"       # set-equal, text differs
    assert v.loc[103, "stage"] == "too_short"
    assert v.loc[104, "stage"] == "digit_heavy"
    assert int(out["keep"].sum()) == 21            # 20 base + p1

    # quality-failed doc never canonicalizes its group: plant a smaller-id
    # quality-failed copy of doc 5's text
    df2 = pd.concat(
        [pd.DataFrame([(0, ""),], columns=["doc_id", "text"]),
         _docs().assign(doc_id=lambda d: d["doc_id"] + 1000)],
        ignore_index=True,
    )
    out2 = curate_documents(rd.from_pandas(df2), min_tokens=3,
                            require_terminal_punct=False)
    v2 = out2.set_index("doc_id")
    assert v2.loc[0, "stage"] == "too_short"       # empty text fails quality
    assert v2.loc[1003, "keep"]                    # still canonical


def test_curate_distributed_sink_matches_driver(ray_session, tmp_path):
    import ray.data as rd

    df = _docs()
    ds = rd.from_pandas([df.iloc[i:i + 5] for i in range(0, len(df), 5)])
    drv = curate_documents(ds, min_tokens=3, require_terminal_punct=False)
    out_dir = str(tmp_path / "verdicts")
    counts = curate_documents(ds, out_dir=out_dir, min_tokens=3,
                              require_terminal_punct=False, nparts=4)
    written = pd.read_parquet(out_dir).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        written[["doc_id", "keep", "stage"]], drv, check_dtype=False)
    truth_counts = drv.groupby("stage").size().to_dict()
    assert dict(zip(counts["stage"], counts["n"])) == truth_counts


def test_curate_all_quality_failed_and_empty(ray_session, tmp_path):
    """An all-quality-failed shard (and an empty dataset) must yield
    verdicts, not a hash-join crash on a schemaless empty side."""
    import ray.data as rd

    from bio_data_validation_ray.pipelines.curate import curate_documents

    bad = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                        "text": ["short", "tiny", "x"]})
    # collect path
    v = curate_documents(rd.from_pandas(bad))
    assert (~v["keep"]).all() and (v["stage"] == "too_short").all()
    # distributed sink path
    counts = curate_documents(rd.from_pandas(bad),
                              out_dir=str(tmp_path / "out"))
    assert dict(zip(counts["stage"], counts["n"])) == {"too_short": 3}
    # empty dataset
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(dtype=np.int64),
        "text": pd.Series(dtype=object)}))
    v2 = curate_documents(empty)
    assert len(v2) == 0 and list(v2.columns) == ["doc_id", "keep", "stage"]


def test_enrich_null_attribute_is_a_hit(ray_session):
    """A reference key whose first attribute is legitimately null is a HIT
    (the old first-column-isna membership test called it a miss and let
    the fallback overwrite the reference row)."""
    import ray.data as rd

    from bio_data_validation_ray.stages.enrich import EnrichStage

    ref = pd.DataFrame({"k": np.int64([1, 2]),
                        "v": pd.array([pd.NA, 7], dtype="Int64")})
    batch = pd.DataFrame({"k": np.int64([1, 2, 3])})

    def fb(keys):
        return pd.DataFrame({"k": keys.astype(np.int64),
                             "v": np.int64(999)})

    st = EnrichStage(ref_data=ref, key_col="k", ref_key="k",
                     add_cols=["v"], fallback=fb)
    out = st(batch).set_index("k")
    assert out.loc[1, "enrich_status"] == "hit"      # null attr, still a hit
    assert pd.isna(out.loc[1, "v"])                  # not overwritten by fb
    assert out.loc[2, "enrich_status"] == "hit"
    assert out.loc[3, "enrich_status"] == "fallback"
    assert int(out.loc[3, "v"]) == 999
