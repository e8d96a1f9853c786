"""Deterministic content-hash ids for blocks / nodes / paths.

The reference derives u64 ids by feeding Rust values into XxHash64
(`packages/pangraph/src/utils/id.rs:4-12`). Rust's `Hash` byte stream is not a
stable cross-language format, so we define our own canonical encoding and hash it
with blake2b-64 (C-speed in CPython's hashlib). Ids are deterministic across runs
and processes; the graph-equality contract with the reference is "up to canonical
ordering", not bit-equal ids (BASELINE.md).

Encoding rules (canonical, versioned by ID_SALT):
- int   -> b'i' + 8-byte little-endian two's complement (within u64 range)
- bool  -> b'b' + 1 byte
- str   -> b's' + u32 len + utf8 bytes
- bytes/np.uint8 array -> b'y' + u32 len + raw bytes
- tuple/list -> b't' + u32 len + encoded items
- None  -> b'n'
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

ID_SALT = b"pangraph-tpu-v1"
U64_MASK = (1 << 64) - 1


def _encode(x, out: list) -> None:
    if x is None:
        out.append(b"n")
    elif isinstance(x, bool):
        out.append(b"b" + (b"\x01" if x else b"\x00"))
    elif isinstance(x, (int, np.integer)):
        out.append(b"i" + struct.pack("<Q", int(x) & U64_MASK))
    elif isinstance(x, str):
        b = x.encode()
        out.append(b"s" + struct.pack("<I", len(b)) + b)
    elif isinstance(x, (bytes, bytearray)):
        out.append(b"y" + struct.pack("<I", len(x)) + bytes(x))
    elif isinstance(x, np.ndarray) and x.dtype == np.uint8:
        b = x.tobytes()
        out.append(b"y" + struct.pack("<I", len(b)) + b)
    elif isinstance(x, (tuple, list)):
        out.append(b"t" + struct.pack("<I", len(x)))
        for item in x:
            _encode(item, out)
    else:
        raise TypeError(f"content_id: unsupported type {type(x)}")


def content_id(*parts) -> int:
    """Hash arbitrary canonical content into a u64 id (reference: utils/id.rs:4)."""
    out = [ID_SALT]
    _encode(parts, out)
    h = hashlib.blake2b(b"".join(out), digest_size=8)
    return int.from_bytes(h.digest(), "little")
