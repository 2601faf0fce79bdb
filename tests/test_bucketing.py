"""Hash-bucketed layout + co-partitioned join (sources/bucketing.py)."""

import glob
import os

import numpy as np
import pandas as pd

from bio_data_validation_ray.sources.bucketing import (
    add_bucket,
    bucketed_join_pandas,
    read_bucket,
    write_bucketed,
)


def test_bucketed_write_and_copartitioned_join(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(11)
    orders = pd.DataFrame({
        "custkey": rng.integers(0, 300, 2000),
        "amount": rng.integers(1, 100, 2000),
    })
    cust = pd.DataFrame({
        "custkey": np.arange(300),
        "segment": [f"s{i % 5}" for i in range(300)],
    })
    da = str(tmp_path / "orders_b")
    db = str(tmp_path / "cust_b")
    write_bucketed(rd.from_pandas(orders), da, key="custkey", n_buckets=8)
    write_bucketed(rd.from_pandas(cust), db, key="custkey", n_buckets=8)
    # hive layout, one dir per bucket
    assert sorted(os.path.basename(p) for p in glob.glob(da + "/bucket=*")) \
        == [f"bucket={b}" for b in range(8)]
    # every bucket dir holds only rows whose key hashes there
    for b in range(8):
        part = read_bucket(da, b).to_pandas()
        chk = add_bucket(part.copy(), "custkey", 8)
        assert (chk["bucket"].astype(int) == b).all()
    # co-partitioned join equals a plain merge
    j = bucketed_join_pandas(da, db, on="custkey", n_buckets=8)
    truth = orders.merge(cust, on="custkey")
    key = ["custkey", "amount", "segment"]
    pd.testing.assert_frame_equal(
        j[key].sort_values(key).reset_index(drop=True),
        truth[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    # deterministic re-write: file set unchanged, no duplicate rows
    files1 = sorted(glob.glob(da + "/**/*.parquet", recursive=True))
    write_bucketed(rd.from_pandas(orders), da, key="custkey", n_buckets=8)
    files2 = sorted(glob.glob(da + "/**/*.parquet", recursive=True))
    assert files1 == files2
    assert len(pd.read_parquet(da)) == len(orders)
