"""Deterministic synthetic source-code corpus generator (SURVEY.md §2.1).

The contract's input is a Parquet table of source-code repositories with
columns (repo, path, commit, lang, content) — all string (BASELINE.json
input_hint). No external data exists in this sandbox, so the corpus is
synthesized as a pure function of (seed, row index):

- identical across runs, scales, chunkings and processes (checkpoint/
  resume and the N-vs-4N scaling runs compare like-for-like);
- `lang` is Zipf-skewed over ~20 languages → dominant-language hot keys,
  exercising the contract-mandated salted repartitioning;
- `content` is a seeded token stream with log-normal length (~300 chars
  median) and ~5% exact duplicates (row i copies row i-1 when i%20==0),
  so COUNT DISTINCT(content_sha256) != row count;
- `commit` is a 40-hex sha1 of (repo, path) — string, per input_hint.

Generation itself is a Ray Data pipeline: ``range(n) → map_batches(gen) →
write_parquet`` — rows never exist on the driver, so bench-scale corpora
(millions of rows) stream straight to disk in parallel.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

LANGS = [
    "python", "javascript", "java", "c", "cpp", "go", "ruby", "rust",
    "php", "typescript", "csharp", "swift", "kotlin", "scala", "shell",
    "perl", "haskell", "lua", "r", "julia",
]
_EXT = {
    "python": "py", "javascript": "js", "java": "java", "c": "c", "cpp": "cc",
    "go": "go", "ruby": "rb", "rust": "rs", "php": "php", "typescript": "ts",
    "csharp": "cs", "swift": "swift", "kotlin": "kt", "scala": "scala",
    "shell": "sh", "perl": "pl", "haskell": "hs", "lua": "lua", "r": "r",
    "julia": "jl",
}
_ZIPF_S = 1.3

_VOCAB = np.array(
    [f"tok{i}" for i in range(512)]
    + ["def", "return", "if", "else", "for", "while", "import", "class",
       "fn", "let", "const", "var", "self", "this", "=", "==", "+", "(", ")",
       "{", "}", "[", "]", ":", ";", "->", "\n", "\n", "\n", "\n"],
    dtype=object,
)

_M64 = (1 << 64) - 1
_GOLD = 0x9E3779B97F4A7C15


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _lang_probs() -> np.ndarray:
    p = 1.0 / np.arange(1, len(LANGS) + 1) ** _ZIPF_S
    return p / p.sum()


def _gen_columns(idx: np.ndarray, seed: int) -> dict:
    """Pure function of (seed, row index array) → the five string columns."""
    n = len(idx)
    u = _mix(idx.astype(np.uint64) + np.uint64((seed * _GOLD) & _M64))

    # lang: inverse-CDF of the Zipf distribution over a hash-uniform
    cdf = np.cumsum(_lang_probs())
    uu = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    lang_ix = np.searchsorted(cdf, uu, side="right").clip(0, len(LANGS) - 1)

    # repo: contiguous blocks of 200 files per repo, 50 repos per org —
    # a pure function of the absolute row index (chunking-independent)
    repo_ix = (idx // 200).astype(np.int64)
    org_ix = repo_ix // 50

    # content length: log-normal, median ~300 chars → ~60 tokens of ~5 chars
    z = ((_mix(u + np.uint64(2)) >> np.uint64(11)).astype(np.float64) / float(1 << 53))
    z2 = ((_mix(u + np.uint64(3)) >> np.uint64(11)).astype(np.float64) / float(1 << 53))
    normal = np.sqrt(-2.0 * np.log(z.clip(1e-12))) * np.cos(2 * np.pi * z2)
    n_tokens = np.clip(np.exp(np.log(60.0) + 0.6 * normal), 4, 2000).astype(np.int64)

    # token ids: one lane of hashes per row, cheap rolling mix
    contents: list[str] = []
    V = np.uint64(len(_VOCAB))
    for i in range(n):
        row_seed = u[i]
        t = _mix(row_seed + np.arange(n_tokens[i], dtype=np.uint64) * np.uint64(_GOLD)) % V
        contents.append(" ".join(_VOCAB[t.astype(np.int64)]))

    # ~5% exact duplicates: row copies its predecessor's content. Pure
    # function: predecessor content is regenerated from idx-1 when the
    # predecessor falls outside this batch.
    dup_mask = (idx % 20 == 0) & (idx > 0)
    for j in np.flatnonzero(dup_mask):
        if j > 0 and idx[j - 1] == idx[j] - 1:
            contents[j] = contents[j - 1]
        else:  # batch boundary: regenerate predecessor row deterministically
            prev = _gen_columns(np.array([idx[j] - 1]), seed)
            contents[j] = prev["content"][0]

    langs = [LANGS[i] for i in lang_ix]
    repos = [f"org{o}/repo{r}" for o, r in zip(org_ix, repo_ix)]
    paths = [
        f"src/m{int(h % 97)}/f{int(i)}.{_EXT[lg]}"
        for h, i, lg in zip(_mix(u + np.uint64(4)) % np.uint64(97), idx, langs)
    ]
    commits = [
        hashlib.sha1(f"{r}/{p}".encode()).hexdigest() for r, p in zip(repos, paths)
    ]
    return {
        "repo": repos,
        "path": paths,
        "commit": commits,
        "lang": langs,
        "content": contents,
    }


def gen_batch(batch: pa.Table, seed: int = 42) -> pa.Table:
    """map_batches fn: turn a ray.data.range block into corpus rows."""
    idx = batch["id"].to_numpy()
    cols = _gen_columns(idx, seed)
    return pa.table({k: pa.array(v, type=pa.string()) for k, v in cols.items()})


def generate_corpus(out_dir: str, n_rows: int, seed: int = 42,
                    num_blocks: int | None = None) -> str:
    """Stream a deterministic corpus to partitioned Parquet via Ray Data.

    Idempotent: if the directory exists with a matching _MANIFEST, it is
    reused (bench and tests share generated corpora).
    """
    import json

    import ray.data as rd

    manifest = os.path.join(out_dir, "_MANIFEST.json")
    spec = {"n_rows": n_rows, "seed": seed, "version": 3}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == spec:
                return out_dir
        import shutil

        shutil.rmtree(out_dir)
    if num_blocks is None:
        # one output file per block: enough files that the downstream
        # read_parquet gets read-task parallelism well beyond the CPU count
        num_blocks = max(32, n_rows // 25_000)
    ds = rd.range(n_rows, override_num_blocks=num_blocks)
    ds = ds.map_batches(lambda b: gen_batch(b, seed=seed), batch_format="pyarrow")
    ds.write_parquet(out_dir)
    with open(manifest, "w") as f:
        json.dump(spec, f)
    return out_dir
