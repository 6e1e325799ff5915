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
    codec="real": raises NotImplementedError at construction (no PIL/ffmpeg
    in this container) — the marker the task brief requires.
    """

    def __init__(self, payload_col: str = "payload", codec: str = "fake",
                 feature_dim: int = DEFAULT_FEATURE_DIM):
        if codec == "real":
            raise NotImplementedError(
                "no image/audio codec libraries are available in this "
                "container; plug a decoder in here (loaded ONCE per actor)"
            )
        if codec != "fake":
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
            digest = hashlib.sha256(b).digest()
            feats[i] = np.frombuffer(digest[: self.feature_dim], dtype=np.uint8) / 255.0
        batch = batch.drop_columns([self.payload_col])  # payload never flows on
        batch = batch.append_column("n_bytes", pa.array(n_bytes))
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.feature_dim
        )
        return batch.append_column("features", feat_col)


def decode_features(ds, payload_col: str = "payload", codec: str = "fake",
                    feature_dim: int = DEFAULT_FEATURE_DIM,
                    batch_size: int = DEFAULT_BATCH_SIZE, concurrency=2):
    """The canonical multimodal stage wiring: actor pool, small batches,
    payload dropped after decode (features-only flow downstream)."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"payload_col": payload_col, "codec": codec,
                               "feature_dim": feature_dim},
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
