"""Multimodal (image/audio/video) column plumbing.

Media are opaque Arrow ``binary`` payload columns with typed metadata
(mime, width/height/duration). The Ray-side plumbing — schema, actor-pool
stage signature, batch sizing, output layout — is real and tested; the
codec itself is STUBBED: no image/audio libraries exist in this container,
so ``DecodeStage`` either raises NotImplementedError (codec="real") or
produces deterministic hash-derived fake features (codec="fake") so the
pipeline shape can be exercised end-to-end.

Scale notes: payloads are large → small ``batch_size`` (default 64 rows)
and an actor pool (the decoder model/codec loads once per actor in
__init__, never per batch). Feature output is a fixed-size-list<float32>
column — Arrow-native, survives shuffles without pandas object dtype.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

DEFAULT_FEATURE_DIM = 16
DEFAULT_BATCH_SIZE = 64  # payload rows are MBs — keep batch × concurrency in heap


class DecodeStage:
    """Actor-pool map_batches stage: binary payload → feature vector.

    codec="fake": deterministic features = first DEFAULT_FEATURE_DIM bytes
    of sha256(payload) scaled to [0,1) — a stand-in with the exact schema
    and cost profile hooks of a real decoder.
    codec="real": the PLUG-IN SEAM — pass ``decoder_factory``, a zero-arg
    callable returning ``decode(payload: bytes) -> np.ndarray[feature_dim]``.
    The factory runs ONCE per actor in __init__ (this is where a real
    deployment loads PIL/ffmpeg/the embedding model); __call__ then maps
    it over each batch. Without a factory, codec="real" raises
    NotImplementedError (no imaging libraries exist in this container).
    """

    def __init__(self, payload_col: str = "payload", codec: str = "fake",
                 feature_dim: int = DEFAULT_FEATURE_DIM,
                 decoder_factory=None):
        if codec == "real":
            if decoder_factory is None:
                raise NotImplementedError(
                    "no image/audio codec libraries are available in this "
                    "container; pass decoder_factory to plug a decoder in "
                    "(it runs ONCE per actor, here)")
            self._decode = decoder_factory()   # heavy setup: once per actor
        elif codec == "fake":
            self._decode = None
        else:
            raise ValueError(f"unknown codec {codec!r}")
        self.payload_col = payload_col
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        n_bytes = np.empty(len(payloads), dtype=np.int64)
        for i, b in enumerate(payloads):
            b = b or b""
            n_bytes[i] = len(b)
            if self._decode is not None:
                v = np.asarray(self._decode(b), dtype=np.float32).ravel()
                if v.shape[0] != self.feature_dim:
                    raise ValueError(
                        f"decoder returned {v.shape[0]} features, stage "
                        f"configured for {self.feature_dim}")
                feats[i] = v
            else:
                digest = hashlib.sha256(b).digest()
                feats[i] = np.frombuffer(digest[: self.feature_dim],
                                         dtype=np.uint8) / 255.0
        batch = batch.drop_columns([self.payload_col])  # payload never flows on
        batch = batch.append_column("n_bytes", pa.array(n_bytes))
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.feature_dim
        )
        return batch.append_column("features", feat_col)


def decode_features(ds, payload_col: str = "payload", codec: str = "fake",
                    feature_dim: int = DEFAULT_FEATURE_DIM,
                    batch_size: int = DEFAULT_BATCH_SIZE, concurrency=2,
                    decoder_factory=None):
    """The canonical multimodal stage wiring: actor pool, small batches,
    payload dropped after decode (features-only flow downstream). Pass
    ``codec="real", decoder_factory=...`` to run a user codec — the
    factory is pickled to each actor and invoked once in its __init__."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"payload_col": payload_col, "codec": codec,
                               "feature_dim": feature_dim,
                               "decoder_factory": decoder_factory},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def text_as_media(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Driver-table adapter: wrap a text column as a binary media payload
    (the sandbox has no real media files; the plumbing is what's tested)."""
    payload = batch[text_col].cast(pa.binary())
    return pa.table({
        "media_id": batch[id_col],
        "mime": pa.array(["text/plain"] * len(batch), pa.string()),
        "payload": payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload,
    })


class ResizeStage:
    """Actor-pool map_batches stage: payload → resized payload + updated
    width/height metadata.

    codec="fake": deterministic stand-in — emits a payload whose length is
    ``target_w*target_h*3`` derived from a seeded per-row hash stream, so
    output sizing, metadata updates and memory profile match a real
    resize; codec="real" requires ``resizer_factory``, a zero-arg callable
    returning ``resize(payload: bytes, w: int, h: int) -> bytes`` — run
    ONCE per actor in __init__ (load PIL/opencv there); raises without
    one (no imaging library in this container)."""

    def __init__(self, target_w: int, target_h: int,
                 payload_col: str = "payload", codec: str = "fake",
                 resizer_factory=None):
        if codec == "real":
            if resizer_factory is None:
                raise NotImplementedError(
                    "no imaging library in this container; pass "
                    "resizer_factory to plug one in (runs once per actor)")
            self._resize = resizer_factory()
        elif codec == "fake":
            self._resize = None
        else:
            raise ValueError(f"unknown codec {codec!r}")
        self.target_w = target_w
        self.target_h = target_h
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_len = self.target_w * self.target_h * 3
        payloads = batch[self.payload_col].to_pylist()
        resized = []
        for b in payloads:
            if self._resize is not None:
                resized.append(bytes(self._resize(b or b"", self.target_w,
                                                  self.target_h)))
                continue
            digest = hashlib.sha256(b or b"").digest()
            reps = (out_len + len(digest) - 1) // len(digest)
            resized.append((digest * reps)[:out_len])
        i = batch.schema.get_field_index(self.payload_col)
        batch = batch.set_column(i, self.payload_col,
                                 pa.array(resized, pa.binary()))
        w = pa.array([self.target_w] * len(batch), pa.int32())
        h = pa.array([self.target_h] * len(batch), pa.int32())
        for name, arr in (("width", w), ("height", h)):
            if name in batch.schema.names:
                batch = batch.set_column(batch.schema.get_field_index(name),
                                         name, arr)
            else:
                batch = batch.append_column(name, arr)
        return batch


class FrameSampleStage:
    """Actor-pool map_batches flat-map stage: one video payload row →
    ``n_frames`` frame payload rows. ALL non-payload columns (media_id,
    lang, metadata, …) pass through — replicated by a vectorized Arrow
    take — and ``frame_idx`` is appended.

    codec="fake": frames are deterministic equal-length slices of the
    payload (a real sampler seeks keyframes). codec="real" requires
    ``sampler_factory``, a zero-arg callable returning
    ``sample(payload: bytes, n_frames: int) -> list[bytes]`` of EXACTLY
    n_frames frames — run ONCE per actor in __init__ (open the ffmpeg
    demuxer there); raises without one (no video codec in this
    container). The output explosion factor is explicit; batch_size
    upstream must be sized for payload_bytes x n_frames in flight."""

    def __init__(self, n_frames: int = 4, payload_col: str = "payload",
                 id_col: str = "media_id", codec: str = "fake",
                 sampler_factory=None):
        if codec == "real":
            if sampler_factory is None:
                raise NotImplementedError(
                    "no video codec in this container; pass "
                    "sampler_factory to plug one in (runs once per actor)")
            self._sample = sampler_factory()
        elif codec == "fake":
            self._sample = None
        else:
            raise ValueError(f"unknown codec {codec!r}")
        self.n_frames = n_frames
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        frames = []  # byte slicing is inherently per-payload
        for b in payloads:
            b = b or b""
            if self._sample is not None:
                fr = [bytes(x) for x in self._sample(b, self.n_frames)]
                if len(fr) != self.n_frames:
                    raise ValueError(
                        f"sampler returned {len(fr)} frames, stage "
                        f"configured for {self.n_frames}")
                frames.extend(fr)
                continue
            step = max(1, len(b) // self.n_frames)
            frames.extend(b[j * step:(j + 1) * step]
                          for j in range(self.n_frames))
        rep = batch.drop_columns([self.payload_col]).take(
            pa.array(np.repeat(np.arange(n), self.n_frames)))
        rep = rep.append_column(
            "frame_idx",
            pa.array(np.tile(np.arange(self.n_frames, dtype=np.int32), n)))
        return rep.append_column(self.payload_col,
                                 pa.array(frames, pa.binary()))


def sample_frames(ds, n_frames: int = 4, payload_col: str = "payload",
                  id_col: str = "media_id", codec: str = "fake",
                  batch_size: int = 16, concurrency=2):
    """Frame sampling wiring: smaller batches than decode (row explosion
    factor = n_frames), actor pool, payload-typed output ready for
    decode_features."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"n_frames": n_frames, "payload_col": payload_col,
                               "id_col": id_col, "codec": codec},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
