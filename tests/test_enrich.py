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
    assert st.stats() == {"hits": 2, "misses": 1, "fallback_hits": 0,
                          "ref_reloads": 0}


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


def test_ref_ttl_reloads_expired_index(tmp_path):
    """cache_manager.py:173-180 TTL semantics: an index older than
    ref_ttl_s reloads from storage at the next batch; within the TTL the
    cached index keeps serving (even if the file changed)."""
    p = tmp_path / "ref.parquet"
    ref_frame().to_parquet(p)
    st = EnrichStage(key_col="k", ref_key="key", add_cols=["val"],
                     ref_path=str(p), ref_ttl_s=3600)
    assert list(st(pd.DataFrame({"k": [3]}))["val"]) == ["c"]
    # reference updates on disk; TTL not expired -> cached value served
    pd.DataFrame({"key": [3], "val": ["NEW"]}).to_parquet(p)
    assert list(st(pd.DataFrame({"k": [3]}))["val"]) == ["c"]
    assert st.stats()["ref_reloads"] == 0
    # force expiry: age the load timestamp past the TTL
    st._loaded_at -= 7200
    assert list(st(pd.DataFrame({"k": [3]}))["val"]) == ["NEW"]
    assert st.stats()["ref_reloads"] == 1


def test_ref_ttl_requires_path():
    with pytest.raises(ValueError):
        EnrichStage(key_col="k", ref_key="key", add_cols=["val"],
                    ref_data=ref_frame(), ref_ttl_s=60)


def test_enrich_dataset_wrapper(ray_session):
    """enrich_dataset exposes the actor-pool knobs as parameters and
    produces the same rows as the raw map_batches spelling."""
    import ray
    import ray.data as rd

    from bio_data_validation_ray.stages.enrich import enrich_dataset

    ref = ray.put(ref_frame())
    ds = rd.from_pandas(pd.DataFrame({"k": np.arange(1, 6)}))
    out = enrich_dataset(ds, concurrency=2, batch_size=2,
                         key_col="k", ref_key="key", add_cols=["val"],
                         ref_data=ref).to_pandas().sort_values("k")
    assert list(out["val"].fillna("-")) == ["a", "b", "c", "-", "-"]
    assert list(out[STATUS_COL]) == [HIT, HIT, HIT, MISS, MISS]


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
