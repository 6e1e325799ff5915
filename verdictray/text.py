"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized batch fns over Arrow (`map_batches`,
``batch_format="pyarrow"``): token counting (whitespace-run definition that
matches the DuckDB oracle's ``regexp_split_to_array(trim(x), '\\s+')``),
quality scoring (length/punctuation/stopword ratios), a deterministic
n-gram/marker language-ID heuristic, and Rabin-style polynomial document
fingerprints (rolling hash over utf-8 bytes, vectorized per row as a
dot-product with precomputed powers mod 2^64).

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------ tokens
def with_token_count(batch: pa.Table, col: str = "text",
                     out_col: str = "n_tokens") -> pa.Table:
    """Tokens = whitespace-run-separated words of the trimmed text.
    Matches DuckDB: len(regexp_split_to_array(trim(text), '\\s+'))."""
    trimmed = pc.utf8_trim_whitespace(batch[col])
    runs = pc.count_substring_regex(trimmed, r"\s+")
    n = pc.add(runs, 1)
    # empty-after-trim rows have 1 "token" per the split definition in
    # DuckDB (splitting '' yields ['']), so no special-casing
    return batch.append_column(out_col, pc.cast(n, pa.int64()))


def explode_tokens(batch: pa.Table, col: str = "text",
                   keep: tuple[str, ...] = ("lang",),
                   out_col: str = "token") -> pa.Table:
    """Explode each document into one row per lowercased whitespace-run
    token (empty tokens from leading/trailing whitespace dropped, so no
    trim-semantics dependence). Matches DuckDB
    ``unnest(regexp_split_to_array(lower(text), '\\s+')) ... WHERE token <> ''``.

    Pure vectorized Arrow: split_pattern_regex → list_flatten, with the
    kept columns replicated by list length. Output row count differs from
    input — map_batches handles that natively, and per-batch combining
    (see token_counts below) keeps the downstream shuffle narrow."""
    lists = pc.split_pattern_regex(pc.utf8_lower(batch[col]), pattern=r"\s+")
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), lens))
    cols = {c: pc.take(batch[c], idx) for c in keep}
    cols[out_col] = flat
    t = pa.table(cols)
    return t.filter(pc.not_equal(t[out_col], pa.scalar("")))


def token_counts(batch: pa.Table, col: str = "text",
                 keep: tuple[str, ...] = ("lang",),
                 out_col: str = "token") -> pa.Table:
    """explode_tokens + a per-batch (keep, token) count combine — the
    map-side pre-aggregation that keeps the global token groupby shuffling
    one row per distinct (group, token) per BATCH instead of one per token
    occurrence."""
    t = explode_tokens(batch, col=col, keep=keep, out_col=out_col)
    g = t.group_by(list(keep) + [out_col]).aggregate([([], "count_all")])
    return g.rename_columns(list(g.schema.names)[:-1] + ["n"])


_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\b"


def with_quality_features(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_chars, n_tokens, punct_ratio, stopword_ratio, and a
    [0,1] quality_score (length + structure heuristic)."""
    text = batch[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    batch = with_token_count(batch, col, "n_tokens")
    n_tokens = pc.cast(batch["n_tokens"], pa.float64())
    punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.float64())
    stops = pc.cast(pc.count_substring_regex(text, _STOPWORDS), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_toks = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    punct_ratio = pc.divide(punct, safe_chars)
    stop_ratio = pc.divide(stops, safe_toks)
    # quality: long-enough docs with some stopwords and sane punctuation
    len_term = pc.min_element_wise(pc.divide(n_chars, pa.scalar(200.0)), pa.scalar(1.0))
    punct_term = pc.subtract(pa.scalar(1.0), pc.min_element_wise(
        pc.multiply(punct_ratio, pa.scalar(4.0)), pa.scalar(1.0)))
    stop_term = pc.min_element_wise(pc.multiply(stop_ratio, pa.scalar(5.0)), pa.scalar(1.0))
    score = pc.divide(pc.add(pc.add(len_term, punct_term), stop_term), pa.scalar(3.0))
    batch = batch.append_column("n_chars_f", n_chars)
    batch = batch.append_column("punct_ratio", punct_ratio)
    batch = batch.append_column("stopword_ratio", stop_ratio)
    return batch.append_column("quality_score", score)


# ------------------------------------------------------------------ lines
def with_line_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition features per document: ``n_lines``,
    ``dup_line_frac`` (1 − distinct/total lines — high values flag the
    boilerplate/repetition that repetition-quality filters drop) and
    ``mean_line_len`` (chars). Vectorized: one split_pattern over the
    batch, per-doc reductions via reduceat / a single hashed groupby —
    no per-document Python loop. Exact-string distinct (no hashing), so
    the DuckDB oracle (SQL_LINE_STATS) reproduces it exactly."""
    import pandas as pd

    if len(batch) == 0:  # reduceat needs ≥1 slice; emit typed empties
        batch = batch.append_column("n_lines", pa.array([], pa.int64()))
        batch = batch.append_column("dup_line_frac", pa.array([], pa.float64()))
        return batch.append_column("mean_line_len", pa.array([], pa.float64()))
    lists = pc.split_pattern(batch[col], pattern="\n")
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    line_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    mean_len = np.add.reduceat(line_len, starts) / lens
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    # exact per-doc distinct-line counts: one C-level hashed groupby
    nuniq = (pd.Series(flat.to_pandas(), copy=False)
             .groupby(doc_idx, sort=True).nunique().to_numpy())
    dup_frac = 1.0 - nuniq / lens
    batch = batch.append_column("n_lines", pa.array(lens, pa.int64()))
    batch = batch.append_column("dup_line_frac", pa.array(dup_frac, pa.float64()))
    return batch.append_column("mean_line_len", pa.array(mean_len, pa.float64()))


# ------------------------------------------------------------------ lang id
# marker substrings per language (deterministic, vectorized via
# count_substring; a tiny stand-in for real char-n-gram profiles)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is ", " that "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " les ", " est ", " une "],
    "es": [" el ", " los ", " que ", " es ", " una "],
}


def with_lang_id(batch: pa.Table, col: str = "text",
                 out_col: str = "lang_pred") -> pa.Table:
    """Deterministic marker-n-gram language guess; 'und' (undetermined)
    when no marker fires. Vectorized: one count_substring pass per marker."""
    text = pc.utf8_lower(batch[col])
    scores = np.zeros((len(batch), len(_LANG_MARKERS)), dtype=np.int64)
    langs = list(_LANG_MARKERS)
    for j, lang in enumerate(langs):
        for marker in _LANG_MARKERS[lang]:
            scores[:, j] += pc.count_substring(text, marker).to_numpy(zero_copy_only=False)
    best = scores.argmax(axis=1)
    fired = scores.max(axis=1) > 0
    pred = np.where(fired, np.array(langs, dtype=object)[best], "und")
    return batch.append_column(out_col, pa.array(pred, pa.string()))


# ------------------------------------------------------------------ fingerprint
_FP_BASE = np.uint64(1099511628211)  # FNV prime as the polynomial base
_MAX_POW = 1 << 16


def _powers(n: int) -> np.ndarray:
    # cached descending powers of the base mod 2^64
    global _POW_CACHE
    try:
        if len(_POW_CACHE) >= n:
            return _POW_CACHE
    except NameError:
        pass
    size = max(n, 4096)
    p = np.empty(size, dtype=np.uint64)
    p[0] = 1
    # array accumulate wraps mod 2^64 silently (scalar loop would warn)
    np.multiply.accumulate(np.full(size - 1, _FP_BASE, dtype=np.uint64), out=p[1:])
    _POW_CACHE = p
    return p


def _inv_powers(n: int) -> np.ndarray:
    # cached ascending powers of B^{-1} mod 2^64 (B is odd ⇒ invertible);
    # Newton iteration doubles correct bits: x ← x·(2 − B·x)
    global _INVPOW_CACHE
    try:
        if len(_INVPOW_CACHE) >= n:
            return _INVPOW_CACHE
    except NameError:
        pass
    x = np.uint64(1)
    b = np.uint64(_FP_BASE)
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (np.uint64(2) - b * x)
    size = max(n, 4096)
    p = np.empty(size, dtype=np.uint64)
    p[0] = 1
    np.multiply.accumulate(np.full(size - 1, x, dtype=np.uint64), out=p[1:])
    _INVPOW_CACHE = p
    return p


# flat-buffer segments are hashed in bounded windows so the powers/prefix
# scratch stays ~8 MiB regardless of block size
_FP_SEGMENT = 1 << 20


def _fingerprint_flat(buf: np.ndarray, rel: np.ndarray, out: np.ndarray,
                      base: int) -> None:
    """Hash every [rel[i], rel[i+1]) slice of a flat uint8 buffer into
    ``out[base + i]`` with the same polynomial as the per-row definition,
    fully vectorized via a weighted prefix sum: within a segment of length
    L, A[j] = buf[j]·B^(L-1-j), S = cumprefix(A); a token's raw sum then
    differs from its true hash only by the factor B^(L-end), removed with
    the cached modular-inverse powers. Segments are aligned to row
    boundaries; a row longer than the segment target becomes its own
    segment (exact, just a bigger scratch)."""
    n = len(rel) - 1
    lo = 0
    while lo < n:
        hi = int(np.searchsorted(rel, rel[lo] + _FP_SEGMENT, side="left"))
        hi = max(hi, lo + 1)
        hi = min(hi, n)
        start, end = int(rel[lo]), int(rel[hi])
        L = end - start
        seg = buf[start:end].astype(np.uint64)
        pw = _powers(L + 1)
        seg *= pw[L - 1 :: -1] if L else pw[:0]
        s = np.zeros(L + 1, dtype=np.uint64)
        np.cumsum(seg, out=s[1:])
        r = rel[lo : hi + 1] - start
        raw = s[r[1:]] - s[r[:-1]]
        raw *= _inv_powers(L + 1)[L - r[1:]]
        out[base + lo : base + hi] = raw
        lo = hi


def fingerprint64(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Rabin-style polynomial fingerprint of each row's utf-8 bytes:
    H(s) = Σ s[i] · B^(n-1-i) mod 2^64 — a pure content function, so
    distinct fingerprints == distinct texts up to ~2^-64 collisions.
    Buffer-level vectorized (one weighted prefix sum per ~1 MiB segment,
    no per-row Python); nulls fingerprint to 0 as before."""
    chunks = texts.chunks if isinstance(texts, pa.ChunkedArray) else [texts]
    out = np.empty(sum(len(c) for c in chunks), dtype=np.uint64)
    i = 0
    for chunk in chunks:
        n = len(chunk)
        t = chunk.type
        large = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
        plain = pa.types.is_string(t) or pa.types.is_binary(t)
        if not (large or plain):
            chunk = chunk.cast(pa.string())
            large, plain = False, True
        bufs = chunk.buffers()
        off_dtype = np.int64 if large else np.int32
        offs = np.frombuffer(bufs[1], dtype=off_dtype,
                             count=chunk.offset + n + 1)
        rel = offs[chunk.offset : chunk.offset + n + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(offs[-1])) \
            if bufs[2] is not None else np.empty(0, np.uint8)
        with np.errstate(over="ignore"):
            _fingerprint_flat(data, rel, out, i)
        if chunk.null_count:
            mask = pc.is_null(chunk).to_numpy(zero_copy_only=False)
            out[i : i + n][mask] = 0
        i += n
    return out


def with_fingerprint(batch: pa.Table, col: str = "text",
                     out_col: str = "fingerprint") -> pa.Table:
    fp = fingerprint64(batch[col])
    return batch.append_column(out_col, pa.array(fp.astype(np.int64)))


def with_regex_counts(batch: pa.Table, col: str,
                      patterns: dict[str, str]) -> pa.Table:
    """Append one int64 column per named RE2 pattern: non-overlapping match
    count within each row's text (Arrow's count_substring_regex and
    DuckDB's regexp_extract_all share RE2 leftmost-non-overlapping
    semantics, so a SQL oracle can reproduce the counts verbatim). For a
    match-indicator column, use a pattern under a name ending in
    ``_flag`` — emitted as 0/1 via match_substring_regex (cheaper than
    counting when only presence matters)."""
    for name, pat in patterns.items():
        if name.endswith("_flag"):
            vals = pc.cast(pc.match_substring_regex(batch[col], pat), pa.int64())
        else:
            vals = pc.cast(pc.count_substring_regex(batch[col], pat), pa.int64())
        batch = batch.append_column(name, vals)
    return batch


# ------------------------------------------------------- token entropy
def token_entropy(ds, text_col: str = "text",
                  keep: tuple[str, ...] = ("lang",), ndigits: int = 4):
    """Shannon entropy (nats) of each group's token distribution, plus
    total/distinct token counts — a standard corpus-diversity diagnostic.
    Computed exactly from the identity  H = ln(S) − Σ c·ln(c) / S  over
    per-(group, token) counts c with S = Σ c, so no per-token probability
    column ever materializes.

    Distributed shape: token_counts pre-aggregates (group, token) per
    batch inside map_batches (the shuffle carries distinct terms per
    batch, not token occurrences); a second map-side-combined groupby over
    the distinct-term table reduces to (group, 3 numbers). Float policy:
    c·ln(c) sums are rounded on both sides (grouped_corr precedent)."""
    from ray.data.aggregate import Count, Sum

    def counts(batch: pa.Table) -> pa.Table:
        return token_counts(batch, col=text_col, keep=keep)

    per_term = (
        ds.select_columns(list(keep) + [text_col])
        .map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(list(keep) + ["token"])
        .aggregate(Sum("n", alias_name="c"))
    )

    def derive(b: pa.Table) -> pa.Table:
        c = np.asarray(b["c"], dtype=np.float64)
        cols = {k: b[k] for k in keep}
        cols["c"] = b["c"]
        cols["_clnc"] = pa.array(c * np.log(c), pa.float64())
        return pa.table(cols)

    agg = (per_term.map_batches(derive, batch_format="pyarrow",
                                zero_copy_batch=True)
           .groupby(list(keep))
           .aggregate(Count(alias_name="distinct_tokens"),
                      Sum("c", alias_name="total_tokens"),
                      Sum("_clnc", alias_name="_L")))

    def finish(b: pa.Table) -> pa.Table:
        s = np.asarray(b["total_tokens"], dtype=np.float64)
        ent = np.log(s) - np.asarray(b["_L"]) / s
        out = {k: b[k] for k in keep}
        out["total_tokens"] = pc.cast(b["total_tokens"], pa.int64())
        out["distinct_tokens"] = b["distinct_tokens"]
        out["entropy"] = pc.round(pa.array(ent, pa.float64()), ndigits=ndigits,
                                  round_mode="half_towards_infinity")
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ vocabulary build
def build_vocab(ds, text_col: str = "text", size: int = 1000,
                min_count: int = 1):
    """Frequency-ranked vocabulary: global token counts → the ``size``
    most frequent tokens with count ≥ min_count, assigned contiguous ids
    1..V by (count desc, token asc) — the table a tokenizer-training or
    token-id-mapping stage consumes.

    Distributed shape: per-batch token counts (map-side combine) → one
    groupby(token) sum → distributed sort + limit(size). Only the id
    assignment touches the driver, over the BOUNDED ≤ size result (the
    same bounded-finalize policy as top-k); everything upstream streams."""
    from ray.data.aggregate import Sum

    import ray.data as rd

    def counts(batch: pa.Table) -> pa.Table:
        return token_counts(batch, col=text_col, keep=())

    per_term = (
        ds.select_columns([text_col])
        .map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="cnt"))
    )

    def keep_min(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["cnt"], pa.scalar(min_count)))

    ranked = (per_term.map_batches(keep_min, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .sort(["cnt", "token"], descending=[True, False])
              .limit(size))
    small = ranked.to_pandas()  # bounded: ≤ size rows by construction
    small["token_id"] = np.arange(1, len(small) + 1, dtype=np.int64)
    small["cnt"] = small["cnt"].astype(np.int64)
    return rd.from_pandas(small)


# ------------------------------------------------------------- PII redaction
# Ordered RE2 rules: specific → general, so '<EMAIL>'/'<IP>' fire before the
# bare-number fallback eats their digits. RE2 is the shared engine of
# pyarrow.compute's *_substring_regex kernels AND DuckDB's regexp_replace,
# so a SQL oracle can reproduce the exact same replacements.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d().-]{7,}\d", "<PHONE>"),
    ("number", r"\d+", "<NUM>"),
]


def redact_text(batch: pa.Table, col: str,
                rules: list[tuple[str, str, str]] | None = None,
                out_col: str | None = None,
                count: bool = False) -> pa.Table:
    """Mask PII-shaped substrings (training-data scrubbing): apply each
    ``(name, RE2 pattern, replacement)`` rule in order with a global
    vectorized replace. ``count=True`` additionally appends one int64
    ``n_<name>`` column per rule with the number of replacements that rule
    made in each row (counted BEFORE its replacement runs, AFTER all
    earlier rules — i.e. what the rule actually redacted). Pure batch
    transform; compose via ``ds.map_batches(partial(redact_text, ...))``."""
    rules = PII_RULES if rules is None else rules
    text = batch[col]
    counts = {}
    for name, pat, repl in rules:
        if count:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64())
        text = pc.replace_substring_regex(text, pat, repl)
    batch = batch.append_column(out_col or f"{col}_redacted", text)
    for cname, vals in counts.items():
        batch = batch.append_column(cname, vals)
    return batch


# ------------------------------------------------------- gopher quality rules
# Repetition/structure document filters in the style of Gopher (Rae et al.
# 2021, arXiv:2112.11446 §A1.1) and C4 — the standard pre-training corpus
# quality gate. All features are single-pass vectorized Arrow kernels
# (count_substring / count_substring_regex over the whole batch); the rules
# are pure threshold comparisons, so the pass/fail verdict is exactly
# reproducible by any engine (SQL oracle: SQL_GOPHER_STATS).
GOPHER_DEFAULTS = {
    "min_words": 50, "max_words": 100_000,
    "min_word_len": 3.0, "max_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_frac": 0.9, "max_ellipsis_frac": 0.3,
    "min_alpha_frac": 0.8,
}


def with_gopher_features(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append the Gopher rule features: ``n_words``, ``mean_word_len``,
    ``symbol_ratio`` (#/… per word), ``bullet_line_frac``,
    ``ellipsis_line_frac``, ``alpha_word_frac``. One regex/count kernel
    per feature over the whole batch; null text counts as empty."""
    text = pc.fill_null(batch[col], "")
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    safe_w = pc.cast(pc.max_element_wise(n_words, pa.scalar(1, pa.int64())),
                     pa.float64())
    word_chars = pc.subtract(pc.utf8_length(text),
                             pc.count_substring_regex(text, r"\s"))
    mean_word_len = pc.divide(pc.cast(word_chars, pa.float64()), safe_w)
    n_sym = pc.add(pc.count_substring(text, "#"),
                   pc.count_substring(text, "…"))
    symbol_ratio = pc.divide(pc.cast(n_sym, pa.float64()), safe_w)
    n_lines = pc.add(pc.cast(pc.count_substring(text, "\n"), pa.int64()),
                     pa.scalar(1, pa.int64()))
    safe_l = pc.cast(pc.max_element_wise(n_lines,
                                         pa.scalar(1, pa.int64())),
                     pa.float64())
    bullet_frac = pc.divide(
        pc.cast(pc.count_substring_regex(text, r"(?m)^\s*[-*•]"),
                pa.float64()), safe_l)
    ellipsis_frac = pc.divide(
        pc.cast(pc.count_substring_regex(text, r"(?m)(\.\.\.|…)$"),
                pa.float64()), safe_l)
    # one non-overlapping greedy match per word containing ≥1 ascii letter
    alpha_frac = pc.divide(
        pc.cast(pc.count_substring_regex(text, r"\S*[A-Za-z]\S*"),
                pa.float64()), safe_w)
    batch = batch.append_column("n_words", n_words)
    batch = batch.append_column("mean_word_len", mean_word_len)
    batch = batch.append_column("symbol_ratio", symbol_ratio)
    batch = batch.append_column("bullet_line_frac", bullet_frac)
    batch = batch.append_column("ellipsis_line_frac", ellipsis_frac)
    return batch.append_column("alpha_word_frac", alpha_frac)


def with_gopher_flags(batch: pa.Table, col: str = "text",
                      **thresholds) -> pa.Table:
    """Append int64 per-rule fail flags (``fail_nwords`` / ``fail_wordlen``
    / ``fail_symbol`` / ``fail_bullet`` / ``fail_ellipsis`` /
    ``fail_alpha``) plus ``gopher_pass`` — int so a plain grouped Sum
    counts failures map-side. Thresholds default to GOPHER_DEFAULTS."""
    th = {**GOPHER_DEFAULTS, **thresholds}
    b = with_gopher_features(batch, col)

    def flag(mask) -> pa.Array:
        return pc.cast(mask, pa.int64())

    f_nw = pc.or_(pc.less(b["n_words"], pa.scalar(th["min_words"])),
                  pc.greater(b["n_words"], pa.scalar(th["max_words"])))
    # vacuous on empty docs (n_words == 0): there is no word length to
    # judge, and the nwords rule already fails them — matches the SQL
    # oracle, where the mean over zero words is NULL and CASE → 0
    f_wl = pc.and_(
        pc.greater(b["n_words"], pa.scalar(0)),
        pc.or_(pc.less(b["mean_word_len"],
                       pa.scalar(float(th["min_word_len"]))),
               pc.greater(b["mean_word_len"],
                          pa.scalar(float(th["max_word_len"])))))
    f_sy = pc.greater(b["symbol_ratio"],
                      pa.scalar(float(th["max_symbol_ratio"])))
    f_bu = pc.greater(b["bullet_line_frac"],
                      pa.scalar(float(th["max_bullet_frac"])))
    f_el = pc.greater(b["ellipsis_line_frac"],
                      pa.scalar(float(th["max_ellipsis_frac"])))
    f_al = pc.less(b["alpha_word_frac"],
                   pa.scalar(float(th["min_alpha_frac"])))
    any_fail = f_nw
    for m in (f_wl, f_sy, f_bu, f_el, f_al):
        any_fail = pc.or_(any_fail, m)
    b = b.append_column("fail_nwords", flag(f_nw))
    b = b.append_column("fail_wordlen", flag(f_wl))
    b = b.append_column("fail_symbol", flag(f_sy))
    b = b.append_column("fail_bullet", flag(f_bu))
    b = b.append_column("fail_ellipsis", flag(f_el))
    b = b.append_column("fail_alpha", flag(f_al))
    return b.append_column("gopher_pass", flag(pc.invert(any_fail)))


def gopher_filter(ds, col: str = "text", **thresholds):
    """Streaming Gopher quality gate: keep only documents passing every
    rule. Zero shuffles — one vectorized map_batches + filter."""
    def keep(batch: pa.Table) -> pa.Table:
        b = with_gopher_flags(batch, col, **thresholds)
        return batch.filter(pc.equal(b["gopher_pass"], pa.scalar(1)))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def with_top_ngram_frac(batch: pa.Table, col: str = "text", n: int = 2,
                        out_col: str | None = None) -> pa.Table:
    """Gopher's top-n-gram repetition feature: per document, the largest
    character coverage any single word n-gram achieves —
    ``max_g(count(g) × chars(g)) / total_chars`` — high values flag the
    template/boilerplate repetition the Gopher filter drops (Rae et al.
    2021 §A1.1). Deterministic under count ties by construction (the max
    is over coverage, not over "the" most-common gram, so no tiebreak
    ambiguity exists between engines — SQL_TOP2GRAM re-derives it
    exactly). Docs with fewer than n words score 0.

    Vectorized: one split per batch, gram identity via a single C-level
    hashed groupby over (doc, word_1..word_n) columns, per-doc max via a
    second groupby — no per-document Python loop."""
    import pandas as pd

    if n < 2:
        raise ValueError("n must be ≥ 2 (use word counts for unigrams)")
    out_col = out_col or f"top{n}gram_frac"
    text = pc.fill_null(batch[col], "")
    total_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    if len(batch) == 0:
        return batch.append_column(out_col, pa.array([], pa.float64()))
    lists = pc.utf8_split_whitespace(text)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = np.asarray(flat.to_pandas(), dtype=object)[keep]
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)[keep]
    wlen = np.char.str_len(words.astype(str))
    frac = np.zeros(len(batch), dtype=np.float64)
    if len(words):
        # n-gram rows: positions whose next n-1 words stay in the same doc
        ok = np.ones(len(words) - (n - 1), dtype=bool) \
            if len(words) >= n else np.zeros(0, dtype=bool)
        for j in range(1, n):
            ok &= doc_idx[j:len(doc_idx) - (n - 1) + j] == \
                doc_idx[:len(doc_idx) - (n - 1)]
        if ok.any():
            pos = np.flatnonzero(ok)
            cols = {"d": doc_idx[pos]}
            gchars = np.full(len(pos), n - 1, dtype=np.int64)  # joiners
            for j in range(n):
                cols[f"w{j}"] = words[pos + j]
                gchars += wlen[pos + j]
            df = pd.DataFrame(cols)
            df["gc"] = gchars
            per_gram = df.groupby(["d"] + [f"w{j}" for j in range(n)],
                                  sort=False)
            cov = per_gram["gc"].transform("size") * df["gc"]
            best = cov.groupby(df["d"], sort=False).max()
            frac[best.index.to_numpy()] = best.to_numpy(dtype=np.float64)
            np.divide(frac, np.maximum(total_chars, 1.0), out=frac)
    return batch.append_column(out_col, pa.array(frac, pa.float64()))
