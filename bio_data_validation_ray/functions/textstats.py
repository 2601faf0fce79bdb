"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All are row-local -> expressed as vectorized ``map_batches`` stages
(``batch_format="pyarrow"`` where pyarrow.compute has the kernel). The
language-ID stage is a callable class (actor pool) so stopword tables and
compiled regexes are built once per actor, mirroring the engine's stateful-
stage pattern (reference analog: the cached lookup stage,
src/utils/cache_manager.py — state loaded once, reused per batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"

# deterministic stopword tables (top function words per language, public
# stopword lists) for the stopword-vote language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "on", "are", "with", "as", "be", "at", "by", "this", "have"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit",
           "zu", "den", "von", "sich", "des", "auf", "für", "im", "dem",
           "sie", "werden"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "pas", "pour", "que",
           "des", "dans", "qui", "au", "plus", "par", "sur", "se", "ne",
           "sont"},
    "es": {"el", "la", "los", "y", "es", "una", "un", "no", "con", "para",
           "del", "las", "por", "se", "su", "más", "como", "pero", "sus",
           "al"},
    "it": {"il", "di", "che", "e", "la", "per", "un", "una", "non", "sono",
           "del", "le", "si", "con", "gli", "della", "nel", "anche", "come",
           "dei"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "para", "com",
           "não", "uma", "os", "no", "se", "na", "por", "mais", "dos"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
           "zijn", "voor", "met", "die", "niet", "aan", "er", "om", "ook",
           "als"},
}


def add_token_count(t: pa.Table, col: str = "text") -> pa.Table:
    """tokens = number of maximal non-whitespace runs (oracle:
    len(list_filter(regexp_split_to_array(text,'\\s+'), x -> x != '')))."""
    n = pc.count_substring_regex(t[col], TOKEN_RE)
    return t.append_column("n_tokens", pc.cast(n, pa.int64()))


# GPT-2-style pre-tokenizer shape, simplified: letter runs, single digits,
# and punctuation marks each count as one token (public BPE pre-tok scheme)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def add_token_count_bpe(t: pa.Table, col: str = "text",
                        out: str = "n_tokens_bpe") -> pa.Table:
    """BPE-pre-tokenizer-shaped token count (letter runs / digits /
    punctuation), one vectorized regex count per batch."""
    n = pc.count_substring_regex(t[col], BPE_TOKEN_RE)
    return t.append_column(out, pc.cast(n, pa.int64()))


def add_quality_metrics(t: pa.Table, col: str = "text") -> pa.Table:
    """Deterministic quality-score components (reference analog: derived
    per-row scalars like GC content, bio_rules.py:216-227/312-319 — here as
    pure Arrow kernels, no Python apply)."""
    # null text counts as empty: every stat fills to the empty-string
    # value so keep/reason stay a TOTAL two-state classification (a null
    # propagating through the if_else chain would yield a null keep)
    text = pc.fill_null(t[col], "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, "[!?.,;:]"), pa.int64())
    n_space = pc.cast(pc.count_substring_regex(text, "[ ]"), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    alpha_ratio = pc.round(
        pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(denom, pa.float64())),
        ndigits=6,
    )
    out = t
    for name, arr in [
        ("n_chars", n_chars), ("n_alpha", n_alpha), ("n_digit", n_digit),
        ("n_punct", n_punct), ("n_space", n_space), ("alpha_ratio", alpha_ratio),
    ]:
        out = out.append_column(name, arr)
    return out


class LangId:
    """Stopword-vote language heuristic (actor-pool stage). The vocabulary
    index and the vocab x language vote matrix are built ONCE per actor in
    __init__; per batch, classification is fully vectorized: one pandas
    regex tokenize, one hash-map lookup of every token, and one np.add.at
    scatter into the (row, language) score matrix — no per-row Python.
    Returns 'und' when no stopword hits; ties break in table order
    (en first), matching the scalar reference implementation."""

    def __init__(self):
        self.word = r"[a-zà-ÿäöüß]+"
        self.langs = list(STOPWORDS)
        vocab: dict[str, int] = {}
        for tab in STOPWORDS.values():
            for w in sorted(tab):
                vocab.setdefault(w, len(vocab))
        self.vocab = vocab
        self.votes = np.zeros((len(vocab), len(self.langs)))
        for j, lang in enumerate(self.langs):
            for w in STOPWORDS[lang]:
                self.votes[vocab[w], j] = 1.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            batch["lang_pred"] = pd.Series(dtype=object)
            return batch
        toks = (
            batch["text"].str.slice(0, 2000).str.lower()
            .str.findall(self.word).explode()
        )
        ids = toks.map(self.vocab)
        hit = ids.notna()
        scores = np.zeros((n, len(self.langs)))
        if hit.any():
            pos = batch.index.get_indexer(ids.index[hit])
            np.add.at(scores, pos, self.votes[ids[hit].astype(int)])
        best = np.argmax(scores, axis=1)
        any_hit = scores.max(axis=1) > 0
        langs = np.asarray(self.langs, dtype=object)
        out = np.where(any_hit, langs[best], "und")
        batch["lang_pred"] = out
        return batch


def normalize_text(t: pa.Table, col: str = "text",
                   out_col: str = "norm_text") -> pa.Table:
    """Canonical text normalization (the pretraining-dedup preprocessor:
    lowercase, collapse all whitespace runs to one space, trim) as pure
    Arrow compute — utf8_lower + one RE2 replace + a space-only trim,
    zero Python per row. Both pyarrow and DuckDB run RE2 and both trim
    plain spaces by default, so the oracle restates this EXACTLY as
    lower + regexp_replace('\\s+', ' ', 'g') + trim. (utf8_trim_whitespace
    would ALSO strip Unicode whitespace RE2's \\s never matched — VT,
    NEL, U+2028 — silently diverging from the SQL; the space-only trim
    keeps the two engines byte-identical on any input.)"""
    import pyarrow.compute as pc

    s = pc.utf8_lower(t[col])
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim(s, " ")
    return t.append_column(out_col, s)


def add_fingerprint(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Document fingerprint = md5 hex of the raw text (oracle: md5(text))."""
    batch["fingerprint"] = [
        hashlib.md5(("" if s is None or (isinstance(s, float) and s != s)
                     else str(s)).encode("utf-8")).hexdigest()
        for s in batch[col]
    ]
    return batch


def add_quality_filter(t: pa.Table, col: str = "text", *,
                       min_tokens: int = 5, max_chars: int = 50_000,
                       min_alpha_pct: int = 50,
                       max_digit_pct: int = 30,
                       require_terminal_punct: bool = True) -> pa.Table:
    """C4-style document quality filter (the canonical training-data
    culling step; public heuristics: length band, alphabetic ratio, digit
    ratio, terminal punctuation) -> appends (keep: bool, reason: string,
    '' when kept). Ratio thresholds compare as integer cross-products
    (100*n_alpha < pct*n_chars) so the semantics are exactly SQL-statable —
    no float division anywhere. First failing rule wins, in a fixed
    priority order."""
    # null text counts as empty: every stat fills to the empty-string
    # value so keep/reason stay a TOTAL two-state classification (a null
    # propagating through the if_else chain would yield a null keep)
    text = pc.fill_null(t[col], "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
    terminal = pc.match_substring_regex(text, r"[.!?]\s*$")
    c100_alpha = pc.multiply(n_alpha, pa.scalar(100, pa.int64()))
    c100_digit = pc.multiply(n_digit, pa.scalar(100, pa.int64()))
    too_short = pc.less(n_tokens, pa.scalar(min_tokens, pa.int64()))
    too_long = pc.greater(n_chars, pa.scalar(max_chars, pa.int64()))
    low_alpha = pc.less(c100_alpha,
                        pc.multiply(n_chars, pa.scalar(min_alpha_pct,
                                                       pa.int64())))
    digit_heavy = pc.greater(c100_digit,
                             pc.multiply(n_chars, pa.scalar(max_digit_pct,
                                                            pa.int64())))
    no_terminal = (
        pc.invert(pc.fill_null(terminal, False))
        if require_terminal_punct
        else pa.array([False] * len(t), type=pa.bool_())
    )
    reason = pc.if_else(
        too_short, "too_short",
        pc.if_else(too_long, "too_long",
                   pc.if_else(low_alpha, "low_alpha",
                              pc.if_else(digit_heavy, "digit_heavy",
                                         pc.if_else(no_terminal,
                                                    "no_terminal_punct",
                                                    "")))))
    keep = pc.equal(reason, "")
    out = t.append_column("keep", keep)
    return out.append_column("reason", reason)


def word_counts(ds, *, col: str = "text", top_k: int | None = None,
                driver_cap: int = 5_000_000) -> pd.DataFrame:
    """Distributed vocabulary building: whitespace-token counts over a text
    column -> DataFrame[(word, n)], optionally truncated to the ``top_k``
    most frequent (ties broken by word). The per-batch partial collapses
    each batch to its distinct words, so the keyed reduce shuffles vocabulary
    -sized partials, never tokens; exact at any vocabulary cardinality via
    stages/keyed_reduce."""
    from ..stages.keyed_reduce import keyed_reduce_pandas

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[col].str.split().explode().dropna()
        if not len(toks):
            return pd.DataFrame({"word": [], "n": []})
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})

    out = keyed_reduce_pandas(
        ds.map_batches(partial, batch_format="pandas"),
        ["word"], {"n": ("n", "sum")},
        partial_applied=True, driver_cap=driver_cap,
    )
    if not len(out):
        return pd.DataFrame({"word": [], "n": []})
    out["n"] = out["n"].astype(np.int64)
    out = out.sort_values(["n", "word"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    return out.head(top_k).reset_index(drop=True) if top_k else out


def heavy_hitter_words(ds, *, col: str = "text", k: int = 1 << 16,
                       top_n: int = 20) -> pd.DataFrame:
    """Bounded-memory heavy hitters over a text column: each block reduces
    to ONE <= k-counter SpaceSaving sketch (sketches.SpaceSaving) and the
    driver merges #blocks sketches — vocabulary never shuffles, unlike the
    exact ``word_counts`` path whose partials are vocabulary-sized. Every
    reported count is within the merged sketch's err_bound of truth, and
    with k >= |vocabulary| the result is exact (the regime the hash oracle
    compares). -> DataFrame[(word, n)] by (count desc, word asc)."""
    from ..sketches import SpaceSaving, dumps, loads

    def sketch_block(df: pd.DataFrame) -> pd.DataFrame:
        sk = SpaceSaving(k)
        toks = df[col].str.split().explode().dropna()
        if len(toks):
            vc = toks.value_counts()
            sk.update_counts(vc.index.to_numpy(), vc.to_numpy())
        return pd.DataFrame({"sk": [dumps(sk)]})

    blobs = ds.map_batches(sketch_block,
                           batch_format="pandas").to_pandas()
    merged = SpaceSaving(k)
    for b in blobs["sk"]:
        merged.merge(loads(b))
    out = merged.top(top_n)
    out["n"] = out["n"].astype(np.int64)
    out.attrs["err_bound"] = int(merged.err_bound)
    return out


def rolling_hashes(text: str, window: int = 16, base: int = 257) -> np.ndarray:
    """Polynomial rolling hash over a sliding byte window (public Rabin-Karp
    scheme in the 2^64 ring) — building block for content-defined
    fingerprints. Fully vectorized: uint64 wraparound makes the prefix form
    H(l, r) = base^r * (C[r] - C[l-1]) with C[i] = Σ b[j]·base^(-j) a pair
    of cumprod/cumsum calls — no per-character Python. Hashes depend only on
    the window bytes (position-independent), so shared windows of different
    texts collide by construction."""
    b = text.encode("utf-8", errors="ignore")
    n = len(b)
    if n < window:
        return np.zeros(0, dtype=np.uint64)
    v = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    pows = np.full(n, np.uint64(base))
    pows[0] = 1
    pows = np.cumprod(pows)                      # base^j  (mod 2^64)
    ipows = np.full(n, np.uint64(pow(base, -1, 1 << 64)))
    ipows[0] = 1
    ipows = np.cumprod(ipows)                    # base^-j (mod 2^64)
    c = np.cumsum(v * ipows)                     # C[i] = Σ_{j<=i} b[j]·base^-j
    cprev = np.concatenate([np.zeros(1, np.uint64), c])  # cprev[i] = C[i-1]
    r = np.arange(window - 1, n)
    return (c[r] - cprev[r - window + 1]) * pows[r]


def repetition_metrics(t: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document (published quality
    heuristics for LLM corpora: Rae et al. 2021 §A1.1 repetition filters):
    word totals/distincts plus the most-repeated word and 2-gram. Appends
    int64 columns — fractions (dup-word ratio, top-2-gram share) are left
    to consumers so the outputs stay integer-exact against a SQL oracle.

    Fully vectorized: one RE2 list-split per batch, then factorize /
    np.unique / reduceat over flat code arrays — no per-row Python. A
    document never spans batches (row-local op), so no boundary stitch.
    """
    nrows = t.num_rows
    arr = pc.split_pattern_regex(t[col], r"\s+")
    flat = pc.list_flatten(arr).combine_chunks()
    parents = pc.list_parent_indices(arr)
    keep = pc.not_equal(flat, "")
    words = pc.filter(flat, keep)
    par = pc.filter(parents, keep).to_numpy().astype(np.int64)
    codes = pd.factorize(words.to_pandas())[0].astype(np.int64)

    def per_doc(parent_ids: np.ndarray, token_codes: np.ndarray,
                vocab: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(total, distinct, top-frequency) per row from (parent, code)."""
        total = np.bincount(parent_ids, minlength=nrows).astype(np.int64)
        pair = parent_ids * np.int64(vocab) + token_codes
        uniq, cnt = np.unique(pair, return_counts=True)
        doc = (uniq // vocab).astype(np.int64)
        distinct = np.bincount(doc, minlength=nrows).astype(np.int64)
        top = np.zeros(nrows, dtype=np.int64)
        if len(doc):
            starts = np.flatnonzero(np.r_[True, np.diff(doc) != 0])
            top[doc[starts]] = np.maximum.reduceat(cnt, starts)
        return total, distinct, top

    n_words, n_distinct_words, top_word_n = per_doc(
        par, codes, len(np.unique(codes)) + 1 if len(codes) else 1)

    adj = np.flatnonzero(par[:-1] == par[1:]) if len(par) else \
        np.zeros(0, dtype=np.int64)
    # re-factorize bigram identities so the pair key stays far from int64
    # overflow even on huge batches (vocab² * rows would not)
    bcode_raw = (codes[adj] * np.int64(len(codes) + 1) + codes[adj + 1]
                 if len(adj) else np.zeros(0, dtype=np.int64))
    bcodes = np.unique(bcode_raw, return_inverse=True)[1].astype(np.int64) \
        if len(adj) else bcode_raw
    n_bigrams, n_distinct_bigrams, top_bigram_n = per_doc(
        par[adj], bcodes, int(bcodes.max()) + 2 if len(bcodes) else 1)

    for name, vals in [
        ("n_words", n_words), ("n_distinct_words", n_distinct_words),
        ("top_word_n", top_word_n), ("n_bigrams", n_bigrams),
        ("n_distinct_bigrams", n_distinct_bigrams),
        ("top_bigram_n", top_bigram_n),
    ]:
        t = t.append_column(name, pa.array(vals, pa.int64()))
    return t


def repetition_stats(ds, col: str = "text"):
    """Dataset-level repetition signals (row-local, streaming)."""
    return ds.map_batches(lambda t: repetition_metrics(t, col=col),
                          batch_format="pyarrow")


def _df_partial(col: str, id_col: str):
    """Per-batch document-frequency partial: one (word, n) row per distinct
    word, counting DISTINCT docs within the batch. Each document is one row
    of the table, so per-batch distinct (doc, word) is globally distinct and
    the partials merge by plain sum — vocabulary-sized rows shuffle, never
    tokens."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        e = (df[[id_col]].assign(word=df[col].str.split())
             .explode("word").dropna(subset=["word"]).drop_duplicates())
        if not len(e):
            return pd.DataFrame({"word": [], "n": []})
        vc = e["word"].value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})

    return partial


class _TfidfScore:
    """Actor-pool scoring stage: fetches the broadcast document-frequency
    table ONCE per actor (ray.get in __init__, the broadcast-small-side
    pattern), then scores each batch vectorized: explode -> tf per
    (doc, word) -> merge idf_ppm -> per-doc sum + arg-max word."""

    def __init__(self, df_ref, col: str, id_col: str):
        import ray

        self.df_map = ray.get(df_ref)  # DataFrame[word, idf_ppm]
        self.col, self.id_col = col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        id_col = self.id_col
        out_cols = [id_col, "tfidf_ppm", "top_word", "top_ppm"]
        if len(df) == 0:
            return pd.DataFrame(columns=out_cols)
        e = (df[[id_col]].assign(word=df[self.col].str.split())
             .explode("word").dropna(subset=["word"]))
        tf = e.groupby([id_col, "word"], as_index=False).size()
        sc = tf.merge(self.df_map, on="word", how="left")
        sc["s"] = (sc["size"].to_numpy(dtype=np.int64)
                   * sc["idf_ppm"].to_numpy(dtype=np.int64))
        tot = sc.groupby(id_col, as_index=False)["s"].sum()
        top = (sc.sort_values(["s", "word"], ascending=[False, True],
                              kind="stable")
               .groupby(id_col, as_index=False).head(1))
        out = tot.merge(top[[id_col, "word", "s"]], on=id_col)
        out.columns = out_cols
        out["tfidf_ppm"] = out["tfidf_ppm"].astype(np.int64)
        out["top_ppm"] = out["top_ppm"].astype(np.int64)
        return out


def tfidf_scores(ds, *, col: str = "text", id_col: str = "doc_id",
                 concurrency: int | tuple = (1, 4),
                 driver_cap: int = 5_000_000):
    """TF-IDF document scoring with an exact integer idf: idf_ppm(w) =
    floor(1e6 * N / df(w) + 0.5), so sums and arg-maxes are pure int64 and
    hash-match the SQL oracle bit-for-bit (a float ``ln`` differs in the
    last ulp between libm and DuckDB and silently flips rounded ties; N is
    bounded by 2^53/1e6 docs for the 1e6*N product to stay exact — fine at
    any real corpus size).

    Two passes over the text: (1) distributed document frequency through
    the keyed reduce (vocabulary-sized partials), (2) an actor-pool scoring
    stage reading the df table from ONE object-store broadcast per actor.
    Assumes one document per row (the documents-table layout). Returns a
    Dataset[(id, tfidf_ppm, top_word, top_ppm)] where top_word is the
    arg-max score word, ties broken by word ascending.

    The broadcast df table is vocabulary-sized; at extreme vocabularies
    swap it for the heavy_hitter_words sketch (score only the tracked
    vocabulary) or a bucketed join on word.
    """
    import ray

    from ..stages.keyed_reduce import keyed_reduce_pandas

    n_docs = ds.count()
    dfreq = keyed_reduce_pandas(
        ds.map_batches(_df_partial(col, id_col), batch_format="pandas"),
        ["word"], {"n": ("n", "sum")},
        partial_applied=True, driver_cap=driver_cap,
    )
    if not len(dfreq):
        dfreq = pd.DataFrame({"word": [], "n": []})
    dfreq["idf_ppm"] = np.floor(
        (1e6 * n_docs) / dfreq["n"].to_numpy(dtype=np.float64) + 0.5
    ).astype(np.int64) if len(dfreq) else pd.Series([], dtype=np.int64)
    ref = ray.put(dfreq[["word", "idf_ppm"]])
    return ds.map_batches(
        _TfidfScore, fn_constructor_args=(ref, col, id_col),
        batch_format="pandas", concurrency=concurrency,
    )
