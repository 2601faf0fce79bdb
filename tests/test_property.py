"""Property-based tests (hypothesis) for the pure-python cores: LSH pair
emission vs a brute-force reference, t-digest quantile rank error, Welford
moment merging, and the simhash vectorization."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bio_data_validation_ray.functions.dedup import (
    _pairs_from_member_frame,
    add_simhash,
    simhash64,
)
from bio_data_validation_ray.sketches import Moments, TDigest

settings.register_profile("fast", max_examples=40, deadline=None)
settings.load_profile("fast")


@st.composite
def member_frames(draw):
    n = draw(st.integers(1, 200))
    ids = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
    buckets = draw(st.lists(st.integers(0, 12), min_size=n, max_size=n))
    return pd.DataFrame({"doc_id": ids, "bucket": buckets})


def brute_force_pairs(df: pd.DataFrame, cap: int) -> set:
    out = set()
    for _, grp in df.groupby("bucket"):
        u = np.unique(grp["doc_id"].to_numpy())[:cap]
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                out.add((int(u[i]), int(u[j])))
    return out


@given(member_frames(), st.integers(2, 40))
def test_pair_emission_matches_brute_force(df, cap):
    got = _pairs_from_member_frame(df, "doc_id", cap, "prop")
    want = brute_force_pairs(df, cap)
    got_set = (set() if got is None
               else set(zip(got["id_a"].astype(int), got["id_b"].astype(int))))
    assert got_set == want


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=10,
                max_size=3000),
       st.floats(0.01, 0.99))
def test_tdigest_quantile_rank_error(values, q):
    arr = np.asarray(values, dtype=np.float64)
    td = TDigest().add_array(arr)
    est = td.quantile(q)
    # rank error: the estimate's rank INTERVAL (ties span a range of ranks)
    # must come within a few percent of q (standard t-digest bound at
    # compression 100)
    s = np.sort(arr)
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    assert lo - 0.08 <= q <= hi + 0.08


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2,
                max_size=500),
       st.integers(1, 10))
def test_moments_merge_equals_single_pass(values, n_chunks):
    arr = np.asarray(values, dtype=np.float64)
    whole = Moments().add_array(arr)
    merged = Moments()
    for chunk in np.array_split(arr, n_chunks):
        merged.merge(Moments().add_array(chunk))
    assert merged.n == whole.n
    assert np.isclose(merged.mean, whole.mean, rtol=1e-9, atol=1e-9)
    assert np.isclose(merged.variance, whole.variance, rtol=1e-6, atol=1e-6)


@given(st.lists(st.text(max_size=40), min_size=1, max_size=30))
def test_add_simhash_equals_scalar(texts):
    df = add_simhash(pd.DataFrame({"text": texts}))
    ref = [np.int64(simhash64(s).astype(np.int64)) for s in texts]
    assert list(df["simhash"]) == ref


@given(st.lists(st.text(alphabet="ab x", max_size=30), min_size=2,
                max_size=12),
       st.integers(1, 4))
def test_word_ngram_jaccard_symmetry_and_bounds(texts, n):
    from bio_data_validation_ray.functions.dedup import (
        ngram_jaccard,
        word_shingles,
    )

    a, b = texts[0], texts[1]
    j = ngram_jaccard(a, b, n)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a, n)  # symmetric
    assert ngram_jaccard(a, a, n) == 1.0  # reflexive
    # whitespace normalization: token-identical texts are set-identical
    a2 = "  " + a.replace(" ", "   ") + " "
    assert np.array_equal(word_shingles(a, n), word_shingles(a2, n))


@st.composite
def event_streams(draw):
    n = draw(st.integers(2, 120))
    keys = draw(st.lists(st.integers(0, 6), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, 10**7), min_size=n, max_size=n))
    return pd.DataFrame({"key": [f"k{v}" for v in keys], "ts": ts})


@given(event_streams(), st.integers(1, 10**6), st.integers(1, 5))
def test_session_partials_merge_is_chunking_invariant(df, gap_us, n_chunks):
    """Sessionizing partials chunk-by-chunk then merging equals one global
    merge; sessions partition all rows and respect the gap threshold."""
    from bio_data_validation_ray.functions.windows import (
        _merge_partials,
        _session_partials,
    )

    df = df.sort_values(["key", "ts"], kind="stable").reset_index(drop=True)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    whole = _merge_partials(
        _session_partials(df, "key", "ts", gap_us).drop(
            columns=["__boundary"]), gap_us)
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _session_partials(df.iloc[a:b].reset_index(drop=True), "key", "ts",
                          gap_us).drop(columns=["__boundary"])
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    chunked = _merge_partials(pd.concat(parts, ignore_index=True), gap_us)
    key = ["key", "ts_start"]
    pd.testing.assert_frame_equal(
        whole.sort_values(key).reset_index(drop=True),
        chunked.sort_values(key).reset_index(drop=True),
    )
    assert whole["n_events"].sum() == len(df)  # sessions partition the rows
    # consecutive sessions of one key are separated by more than the gap
    w = whole.sort_values(["key", "ts_start"]).reset_index(drop=True)
    same = w["key"].to_numpy()[1:] == w["key"].to_numpy()[:-1]
    gaps = w["ts_start"].to_numpy()[1:] - w["ts_end"].to_numpy()[:-1]
    assert (gaps[same] > gap_us).all()


@given(event_streams(), st.integers(1, 5))
def test_gap_partials_merge_is_chunking_invariant(df, n_chunks):
    from bio_data_validation_ray.functions.windows import (
        _gap_partials,
        _merge_gap_partials,
    )

    df = df.sort_values(["key", "ts"], kind="stable").reset_index(drop=True)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    whole = _merge_gap_partials(_gap_partials(df, "key", "ts"))
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _gap_partials(df.iloc[a:b].reset_index(drop=True), "key", "ts")
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    chunked = _merge_gap_partials(pd.concat(parts, ignore_index=True))
    pd.testing.assert_frame_equal(
        whole.sort_values("key").reset_index(drop=True),
        chunked.sort_values("key").reset_index(drop=True),
    )
    # truth: per-key gap count and max, in exact integer microseconds
    # (pd.to_numeric turns NaT into int64-min instead of NA — avoid it)
    k = df["key"].to_numpy()
    v = (df["ts"].astype("int64") // 1000).to_numpy()
    same = np.concatenate([[False], k[1:] == k[:-1]])
    gaps = np.diff(v, prepend=v[:1])
    got = whole.set_index("key")
    for kk in np.unique(k):
        m = same & (k == kk)
        if m.any():
            assert got.loc[kk, "n_gaps"] == int(m.sum())
            assert got.loc[kk, "max_gap_us"] == int(gaps[m].max())
        else:
            assert kk not in got.index  # single-row keys emit no gaps


@st.composite
def ordered_event_streams(draw):
    """Streams ordered by an order column INDEPENDENT of ts (turn_idx-style)
    so timestamps may be non-monotonic within a key — the case where gap
    partials must merge by order snapshot, not by first_ts."""
    n = draw(st.integers(2, 120))
    keys = sorted(draw(st.lists(st.integers(0, 6), min_size=n, max_size=n)))
    ts = draw(st.lists(st.integers(0, 10**7), min_size=n, max_size=n))
    df = pd.DataFrame({"key": [f"k{v}" for v in keys], "ts": ts})
    df["ord"] = df.groupby("key").cumcount()
    return df.reset_index(drop=True)


@given(ordered_event_streams(), st.integers(1, 8))
def test_gap_partials_merge_invariant_under_order_col(df, n_chunks):
    """Chunked gap partials over a (key, ord)-sorted stream with arbitrary
    (non-monotonic) ts merge to the single-pass answer — the merge must
    order partials by the ord snapshot, not first_ts."""
    from bio_data_validation_ray.functions.windows import (
        _gap_partials,
        _merge_gap_partials,
    )

    df = df.copy()
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    whole = _merge_gap_partials(_gap_partials(df, "key", "ts", ["ord"]))
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _gap_partials(df.iloc[a:b].reset_index(drop=True), "key", "ts",
                      ["ord"])
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    chunked = _merge_gap_partials(pd.concat(parts, ignore_index=True))
    pd.testing.assert_frame_equal(
        whole.sort_values("key").reset_index(drop=True),
        chunked.sort_values("key").reset_index(drop=True),
    )
    # truth from the stream in (key, ord) order
    k = df["key"].to_numpy()
    v = (df["ts"].astype("int64") // 1000).to_numpy()
    same = np.concatenate([[False], k[1:] == k[:-1]])
    gaps = np.diff(v, prepend=v[:1])
    got = whole.set_index("key")
    for kk in np.unique(k):
        m = same & (k == kk)
        if m.any():
            assert got.loc[kk, "n_gaps"] == int(m.sum())
            assert got.loc[kk, "max_gap_us"] == int(gaps[m].max())
        else:
            assert kk not in got.index


def test_gap_partials_nonmonotonic_ts_per_row_chunks():
    """The ADVICE repro: one key, turn-ordered ts [100, 50, 200] split one
    row per chunk must give max_gap 150 (50 -> 200), not 100."""
    from bio_data_validation_ray.functions.windows import (
        _gap_partials,
        _merge_gap_partials,
    )

    df = pd.DataFrame({
        "key": ["c", "c", "c"],
        "ord": [0, 1, 2],
        "ts": pd.to_datetime([100, 50, 200], unit="us"),
    })
    parts = [
        _gap_partials(df.iloc[i:i + 1].reset_index(drop=True), "key", "ts",
                      ["ord"])
        for i in range(3)
    ]
    out = _merge_gap_partials(pd.concat(parts, ignore_index=True))
    assert out["n_gaps"].tolist() == [2]
    assert out["max_gap_us"].tolist() == [150]


@given(st.lists(st.floats(-100, 100, allow_nan=False), min_size=1,
                max_size=300),
       st.lists(st.floats(-100, 100, allow_nan=False), min_size=2,
                max_size=6))
def test_histogram_fixed_partials_sum_to_whole(values, edges):
    # histogram bin semantics: bin = #edges <= v, exact under any chunking
    edges = sorted(set(edges))
    arr = np.asarray(values, dtype=np.float64)
    whole = np.bincount(np.searchsorted(edges, arr, side="right"),
                        minlength=len(edges) + 1)
    chunked = np.zeros(len(edges) + 1, dtype=np.int64)
    for chunk in np.array_split(arr, 3):
        chunked += np.bincount(np.searchsorted(edges, chunk, side="right"),
                               minlength=len(edges) + 1)
    assert (whole == chunked).all()
    assert whole.sum() == arr.size


@st.composite
def keyed_value_streams(draw):
    n = draw(st.integers(1, 120))
    keys = draw(st.lists(st.integers(0, 6), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, 10**6), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(0, 500), min_size=n, max_size=n))
    return pd.DataFrame({"key": [f"k{v}" for v in keys], "ts": ts,
                         "v": vals})


@given(keyed_value_streams(), st.integers(1, 6), st.integers(2, 5))
def test_roll_partials_merge_is_chunking_invariant(df, n_chunks, k):
    """Splitting the sorted stream anywhere (including mid-key, per-row)
    and merging rolling partials equals the brute-force per-key max of the
    k-row rolling sum."""
    from bio_data_validation_ray.functions.windows import (
        _merge_roll_partials,
        _roll_partials,
    )

    df = df.sort_values(["key", "ts", "v"], kind="stable").reset_index(
        drop=True)
    # brute force via pandas rolling (min_periods=1 == SQL k-1 PRECEDING)
    brute = (
        df.groupby("key")["v"]
        .apply(lambda s: s.rolling(k, min_periods=1).sum().max())
        .astype(np.int64)
        .reset_index(name="max_roll")
    )
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _roll_partials(df.iloc[a:b].reset_index(drop=True), "key", "v", k)
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    merged = _merge_roll_partials(pd.concat(parts, ignore_index=True), k)
    pd.testing.assert_frame_equal(
        merged.sort_values("key").reset_index(drop=True),
        brute.sort_values("key").reset_index(drop=True),
        check_like=True,
    )


@given(event_streams(), st.integers(1, 10**6), st.integers(1, 6))
def test_pwc_partials_merge_is_chunking_invariant(df, window_us, n_chunks):
    """Peak trailing-window counts from chunked partials equal the
    single-pass brute-force peer-inclusive RANGE-frame maximum, for every
    chunking — including per-row chunks with duplicate timestamps."""
    from bio_data_validation_ray.functions.windows import (
        _merge_pwc_partials,
        _pwc_partials,
    )

    df = df.sort_values(["key", "ts"], kind="stable").reset_index(drop=True)

    def brute(g):
        t = np.sort(g["ts"].to_numpy(np.int64))
        return int((np.searchsorted(t, t, side="right")
                    - np.searchsorted(t, t - window_us, side="left")).max())

    want = {k: brute(g) for k, g in df.groupby("key")}
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _pwc_partials(df.iloc[a:b].reset_index(drop=True), "key", "ts",
                      window_us)
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    merged = _merge_pwc_partials(pd.concat(parts, ignore_index=True),
                                 window_us)
    got = dict(zip(merged["key"], merged["peak_cnt"].astype(int)))
    assert got == want


def test_pwc_partials_per_row_chunks_hot_burst():
    """Degenerate chunking (one row per partial) over a single-timestamp
    burst: every event is a peer of every other, so the peak must equal the
    full burst size even though no chunk ever saw two rows."""
    from bio_data_validation_ray.functions.windows import (
        _merge_pwc_partials,
        _pwc_partials,
    )

    df = pd.DataFrame({"key": ["h"] * 25, "ts": np.int64(1000)})
    parts = [_pwc_partials(df.iloc[i:i + 1].reset_index(drop=True),
                           "key", "ts", 10) for i in range(len(df))]
    merged = _merge_pwc_partials(pd.concat(parts, ignore_index=True), 10)
    assert merged["peak_cnt"].tolist() == [25]


@st.composite
def typed_streams(draw):
    n = draw(st.integers(2, 100))
    keys = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    vals = draw(st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        min_size=n, max_size=n))
    return pd.DataFrame({"key": [f"k{v}" for v in keys], "v": vals})


@given(typed_streams(), st.integers(1, 6))
def test_adjpair_partials_merge_is_chunking_invariant(df, n_chunks):
    """Per-key adjacent-equal counts from chunked partials equal the
    single-pass count, with SQL null semantics (NULL never equals)."""
    from bio_data_validation_ray.functions.windows import (
        _adjpair_partials,
        _merge_adjpair_partials,
    )

    df = df.sort_values(["key"], kind="stable").reset_index(drop=True)
    want = {}
    for k, g in df.groupby("key"):
        v = g["v"].tolist()
        want[k] = sum(1 for a, b in zip(v, v[1:])
                      if a is not None and b is not None and a == b)
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _adjpair_partials(df.iloc[a:b].reset_index(drop=True), "key", "v")
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    merged = _merge_adjpair_partials(pd.concat(parts, ignore_index=True))
    got = dict(zip(merged["key"], merged["n_pairs"].astype(int)))
    assert got == want


@given(typed_streams(), st.integers(1, 6))
def test_runlen_partials_merge_is_chunking_invariant(df, n_chunks):
    """Per-key longest constant-value streak from chunked partials equals
    the single-pass brute force; nulls break streaks (each null is its own
    length-1 streak)."""
    from bio_data_validation_ray.functions.windows import (
        _merge_runlen_partials,
        _runlen_partials,
    )

    df = df.sort_values(["key"], kind="stable").reset_index(drop=True)
    want = {}
    for k, g in df.groupby("key"):
        v = g["v"].tolist()
        best = cur = 1
        for a, b in zip(v, v[1:]):
            cur = cur + 1 if (a is not None and b is not None
                              and a == b) else 1
            best = max(best, cur)
        want[k] = best
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _runlen_partials(df.iloc[a:b].reset_index(drop=True), "key", "v")
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    merged = _merge_runlen_partials(pd.concat(parts, ignore_index=True))
    got = dict(zip(merged["key"], merged["max_run"].astype(int)))
    assert got == want


@given(st.lists(st.integers(0, 8), min_size=2, max_size=60),
       st.sampled_from([1, 2, 4]), st.integers(1, 8))
def test_pwc_window_edge_collisions_chunking_invariant(steps, w, n_chunks):
    """Timestamps on a small grid with the window an exact multiple of the
    grid step: boundary events land EXACTLY window_us from anchors across
    chunks, the inclusive-edge case strict masks used to drop."""
    from bio_data_validation_ray.functions.windows import (
        _merge_pwc_partials,
        _pwc_partials,
    )

    ts = np.cumsum(np.array(steps, dtype=np.int64))
    df = pd.DataFrame({"key": ["k"] * len(ts), "ts": ts})
    brute = int((np.searchsorted(ts, ts, side="right")
                 - np.searchsorted(ts, ts - w, side="left")).max())
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    parts = [
        _pwc_partials(df.iloc[a:b].reset_index(drop=True), "key", "ts", w)
        for a, b in zip(bounds[:-1], bounds[1:]) if b > a
    ]
    merged = _merge_pwc_partials(pd.concat(parts, ignore_index=True), w)
    assert merged["peak_cnt"].tolist() == [brute]


def test_pwc_inclusive_edge_across_chunks():
    """Concrete regressions for the inclusive RANGE-frame edge: an anchor
    exactly window_us from a carried event, incl. a duplicate timestamp
    recurring across the boundary."""
    from bio_data_validation_ray.functions.windows import (
        _merge_pwc_partials,
        _pwc_partials,
    )

    def run(chunks, w):
        parts = [
            _pwc_partials(pd.DataFrame(
                {"key": ["a"] * len(c), "ts": np.array(c, np.int64)}),
                "key", "ts", w)
            for c in chunks
        ]
        return int(_merge_pwc_partials(
            pd.concat(parts, ignore_index=True), w)["peak_cnt"].iloc[0])

    assert run([[0, 10], [10]], 10) == 3
    assert run([[0, 100], [100, 110]], 10) == 3
    assert run([[0, 5, 10], [10, 20]], 10) == 4
    assert run([[0], [5], [10]], 10) == 3
    assert run([[0, 0], [0]], 0) == 3


# ---- round-5 codec property tests ------------------------------------------

@given(st.integers(1, 12), st.integers(1, 12),
       st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, ch, seed):
    """encode_png -> decode_png is the identity for every size/channel
    combination (filter-0 scanlines exercise the plumbing; the filter
    kernels have their own every-filter reconstruction test)."""
    from bio_data_validation_ray.functions.multimodal import (
        decode_png, encode_png)

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape
    assert (back == img).all()


@given(st.integers(1, 10), st.integers(1, 9), st.integers(1, 9),
       st.integers(0, 2**32 - 1), st.integers(1, 12))
def test_png_random_filters_reconstruct_property(n_rows, w, ch_seed, seed, k):
    """Random per-row filter choices (the encoder's heuristic freedom)
    must reconstruct exactly — pins Sub/Up/Average/Paeth interplay across
    consecutive rows, not just one filter per image."""
    import struct
    import zlib

    from bio_data_validation_ray.functions.multimodal import decode_png

    ch = 3
    h = n_rows
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    fsel = rng.integers(0, 5, size=h)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int64)
        f = int(fsel[y])
        filt = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            filt[x] = (row[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(filt.astype(np.uint8))
        prev = row

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (decode_png(payload) == img).all()


@given(st.integers(0, 8), st.integers(1, 9), st.integers(1, 9),
       st.integers(1, 10), st.integers(0, 2**32 - 1))
def test_y4m_mono_roundtrip_and_sampling_property(n, h, w, k, seed):
    """Mono Y4M roundtrip is exact for ANY frame count (incl. 0) and
    sampling always returns min(k, n) distinct in-range indices with
    frames equal to the decoded stack."""
    from bio_data_validation_ray.functions.multimodal import (
        decode_y4m, encode_y4m, sample_y4m_frames)

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    payload = encode_y4m(frames)
    back, _ = decode_y4m(payload)
    assert back.shape == frames.shape and (back == frames).all()
    got = sample_y4m_frames(payload, k)
    assert len(got) == min(k, n)
    idx = [i for i, _ in got]
    assert idx == sorted(set(idx))
    for i, f in got:
        assert (f == frames[i]).all()
