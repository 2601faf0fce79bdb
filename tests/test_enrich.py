"""EnrichStage unit tests: once-per-actor reference loading, deduped
lookups, and the hit -> fallback -> miss waterfall
(bio_lookups.py:614-800 / cache_manager.py analogs)."""

import numpy as np
import pandas as pd
import pytest

from bio_data_validation_ray.stages.enrich import (
    FALLBACK,
    HIT,
    MISS,
    STATUS_COL,
    EnrichStage,
)


def ref_frame():
    return pd.DataFrame({"key": [1, 2, 3], "val": ["a", "b", "c"]})


def test_hit_miss_statuses():
    st = EnrichStage(key_col="k", ref_key="key", add_cols=["val"],
                     ref_data=ref_frame())
    out = st(pd.DataFrame({"k": [1, 2, 9]}))
    assert list(out["val"]) == ["a", "b", None] or out["val"].isna().iloc[2]
    assert list(out[STATUS_COL]) == [HIT, HIT, MISS]
    assert st.stats() == {"hits": 2, "misses": 1, "fallback_hits": 0}


def test_fallback_waterfall():
    def fb(keys):
        sub = keys[keys == 9]
        return pd.DataFrame({"key": sub, "val": ["fb"] * len(sub)})

    st = EnrichStage(key_col="k", ref_key="key", add_cols=["val"],
                     ref_data=ref_frame(), fallback=fb)
    out = st(pd.DataFrame({"k": [1, 9, 77]}))
    assert list(out[STATUS_COL]) == [HIT, FALLBACK, MISS]
    assert out["val"].iloc[1] == "fb"
    assert st.stats()["fallback_hits"] == 1


def test_repeated_keys_deduped_and_state_persists():
    st = EnrichStage(key_col="k", ref_key="key", add_cols=["val"],
                     ref_data=ref_frame())
    out = st(pd.DataFrame({"k": [1, 1, 1, 2]}))
    assert list(out["val"]) == ["a", "a", "a", "b"]
    # distinct-key accounting: 2 probes, not 4 (bio_lookups.py:645)
    assert st.stats()["hits"] == 2
    st(pd.DataFrame({"k": [3]}))
    assert st.stats()["hits"] == 3  # same actor, accumulated state


def test_ref_path_loaded_once(tmp_path):
    p = tmp_path / "ref.parquet"
    ref_frame().to_parquet(p)
    st = EnrichStage(key_col="k", ref_key="key", add_cols=["val"],
                     ref_path=str(p))
    out = st(pd.DataFrame({"k": [3]}))
    assert list(out["val"]) == ["c"]


def test_requires_exactly_one_source():
    with pytest.raises(ValueError):
        EnrichStage(key_col="k", ref_key="key", add_cols=["val"])


def test_actor_pool_pipeline(ray_session):
    import ray
    import ray.data as rd

    ref = ray.put(ref_frame())
    ds = rd.from_pandas(pd.DataFrame({"k": np.arange(1, 6)}))
    out = ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs=dict(key_col="k", ref_key="key",
                                   add_cols=["val"], ref_data=ref),
        batch_format="pandas", concurrency=2,
    ).to_pandas().sort_values("k")
    assert list(out["val"].fillna("-")) == ["a", "b", "c", "-", "-"]
    assert list(out[STATUS_COL]) == [HIT, HIT, HIT, MISS, MISS]
