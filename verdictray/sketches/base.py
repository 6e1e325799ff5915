"""Sketch ABC + self-describing binary serialization.

Every sketch is a mergeable summary with the canonical lifecycle

    zero (construct) → update(column) → merge(other) → finalize()

plus ``to_bytes()/from_bytes()`` for the wire/at-rest form: a small
versioned header (magic, type code, params) followed by the payload.
This uniform blob is what flows through Arrow ``binary`` columns during
shuffle-merge and what checkpoints persist (SURVEY.md §1.1, §4.4).

No reference implementation exists (/root/reference is empty, SURVEY.md §0);
semantics follow the published papers cited in each subclass.
"""

from __future__ import annotations

import abc
import io
import struct
from typing import Any, ClassVar

MAGIC = b"VRS1"

_REGISTRY: dict[int, type["Sketch"]] = {}


def register(cls: type["Sketch"]) -> type["Sketch"]:
    code = cls.TYPE_CODE
    if code in _REGISTRY and _REGISTRY[code] is not cls:
        raise ValueError(f"duplicate sketch type code {code}")
    _REGISTRY[code] = cls
    return cls


class Sketch(abc.ABC):
    """Mergeable sketch. Subclasses set TYPE_CODE and implement the API.

    Merge MUST be associative and commutative in estimate (HLL/CMS/Bloom are
    also byte-deterministic under re-association; the quantile digests are
    estimate-stable only — SURVEY.md §5.2).
    """

    TYPE_CODE: ClassVar[int] = 0

    @abc.abstractmethod
    def update(self, values) -> None:
        """Absorb a column of values (numpy / pyarrow / list)."""

    @abc.abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """In-place associative merge; returns self."""

    @abc.abstractmethod
    def finalize(self) -> Any:
        """The estimate this sketch answers with."""

    @abc.abstractmethod
    def _payload_bytes(self) -> bytes: ...

    @classmethod
    @abc.abstractmethod
    def _from_payload(cls, payload: bytes) -> "Sketch": ...

    # --- uniform blob format: MAGIC | u8 type | u32 payload_len | payload ---
    def to_bytes(self) -> bytes:
        payload = self._payload_bytes()
        return MAGIC + struct.pack("<BI", self.TYPE_CODE, len(payload)) + payload

    @staticmethod
    def from_bytes(blob: bytes) -> "Sketch":
        if blob[:4] != MAGIC:
            raise ValueError("not a verdictray sketch blob")
        code, n = struct.unpack_from("<BI", blob, 4)
        payload = blob[9 : 9 + n]
        cls = _REGISTRY.get(code)
        if cls is None:
            raise ValueError(f"unknown sketch type code {code}")
        return cls._from_payload(payload)


def merge_sketches(blob_a: bytes, blob_b: bytes) -> bytes:
    """Standalone cross-job union of two serialized sketches (SURVEY.md §2.7)."""
    a = Sketch.from_bytes(blob_a)
    b = Sketch.from_bytes(blob_b)
    return a.merge(b).to_bytes()


class _Writer:
    """Tiny struct writer for payloads."""

    def __init__(self):
        self.buf = io.BytesIO()

    def u8(self, v):
        self.buf.write(struct.pack("<B", v))
        return self

    def u32(self, v):
        self.buf.write(struct.pack("<I", v))
        return self

    def u64(self, v):
        self.buf.write(struct.pack("<Q", v))
        return self

    def f64(self, v):
        self.buf.write(struct.pack("<d", v))
        return self

    def raw(self, b: bytes):
        self.buf.write(b)
        return self

    def getvalue(self) -> bytes:
        return self.buf.getvalue()


class _Reader:
    def __init__(self, b: bytes):
        self.b = b
        self.off = 0

    def u8(self):
        (v,) = struct.unpack_from("<B", self.b, self.off)
        self.off += 1
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.b, self.off)
        self.off += 4
        return v

    def u64(self):
        (v,) = struct.unpack_from("<Q", self.b, self.off)
        self.off += 8
        return v

    def f64(self):
        (v,) = struct.unpack_from("<d", self.b, self.off)
        self.off += 8
        return v

    def raw(self, n: int) -> bytes:
        v = self.b[self.off : self.off + n]
        self.off += n
        return v
