"""Transparent compression IO (reference: io/compression.rs:38-164).

Extension-sniffed gz / bz2 / xz (zstd gated: stdlib has no zstd codec; if the
`zstandard` package is absent we raise a clear error). "-" means stdin/stdout
(io/file.rs)."""
from __future__ import annotations

import bz2
import gzip
import lzma
import os
import sys


def _zstd_open(path, mode):
    try:
        import zstandard  # noqa
    except ImportError as e:
        raise RuntimeError("zstd compression requires the 'zstandard' package, which is not installed") from e
    import io as _io

    if "r" in mode:
        fh = open(path, "rb")
        stream = zstandard.ZstdDecompressor().stream_reader(fh)
        return _io.TextIOWrapper(stream) if "t" in mode else stream
    fh = open(path, "wb")
    stream = zstandard.ZstdCompressor().stream_writer(fh)
    return _io.TextIOWrapper(stream) if "t" in mode else stream


_OPENERS = {".gz": gzip.open, ".bz2": bz2.open, ".xz": lzma.open, ".zst": _zstd_open}


def open_maybe_compressed(path, mode="rt"):
    if path in (None, "-"):
        return sys.stdin if "r" in mode else sys.stdout
    path = os.fspath(path)
    ext = os.path.splitext(path)[1].lower()
    opener = _OPENERS.get(ext, open)
    return opener(path, mode)


def create_maybe_compressed(path, mode="wt"):
    if path in (None, "-"):
        return sys.stdout
    path = os.fspath(path)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    opener = _OPENERS.get(ext, open)
    return opener(path, mode)
