"""Minimal kaldi binary ark matrix reader.

Compatibility import path for `data_type=feat` manifests (reference
openeat/dataset/dataset.py:120-152 via the kaldi_io package): reads
`path:offset` entries pointing at binary-mode kaldi float/double
matrices ("\\0B" marker + 'FM'/'DM' token + int32 rows/cols). Written
from the kaldi wire-format spec, supporting the uncompressed matrices
the reference path consumes; compressed ('CM*') arks raise with a
pointer to recompute uncompressed.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_int32(f) -> int:
    size = f.read(1)
    assert size == b"\x04", f"expected int32 size marker, got {size!r}"
    return struct.unpack("<i", f.read(4))[0]


def read_mat(path_with_offset: str) -> np.ndarray:
    """Read one matrix from 'file.ark:offset' (kaldi scp convention)."""
    if ":" in path_with_offset:
        path, offset = path_with_offset.rsplit(":", 1)
        offset = int(offset)
    else:
        path, offset = path_with_offset, 0
    with open(path, "rb") as f:
        f.seek(offset)
        binmark = f.read(2)
        if binmark != b"\x00B":
            raise ValueError(
                f"{path}:{offset}: not binary kaldi data (got {binmark!r})")
        token = b""
        while not token.endswith(b" "):
            c = f.read(1)
            if not c:
                raise ValueError("truncated ark")
            token += c
        token = token.strip()
        if token == b"FM":
            dtype, itemsize = "<f4", 4
        elif token == b"DM":
            dtype, itemsize = "<f8", 8
        elif token.startswith(b"CM"):
            raise ValueError(
                "compressed kaldi matrices not supported; recompute with "
                "--compress=false")
        else:
            raise ValueError(f"unsupported kaldi token {token!r}")
        rows = _read_int32(f)
        cols = _read_int32(f)
        data = np.frombuffer(f.read(rows * cols * itemsize), dtype)
        return data.reshape(rows, cols).astype(np.float32)


def write_ark_entry(f, key: str, mat: np.ndarray) -> int:
    """Append one binary FM entry; returns the value offset (for scp)."""
    f.write(key.encode() + b" ")
    offset = f.tell()
    f.write(b"\x00BFM ")
    f.write(b"\x04" + struct.pack("<i", mat.shape[0]))
    f.write(b"\x04" + struct.pack("<i", mat.shape[1]))
    f.write(np.ascontiguousarray(mat, "<f4").tobytes())
    return offset
