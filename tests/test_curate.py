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
