"""Native (C++) data-loader hot path.

The reference framework's data layer is a pure-Python line loop
(esm/data.py:19-47); at Atlas scale (scripts/atlas, 772M records) host-side
parsing matters. This package builds `fasta.cc` on demand with the system
g++ into a cached shared object and binds it via ctypes:

  * ``parse_fasta(path)``   — mmap'd single-pass FASTA scan with
                              reference-parity record semantics. The C scan
                              runs at ~0.5-2 GB/s; materializing Python
                              sequence strings on top (``from_file``) lands
                              at ~1.5x the Python loop end-to-end.
  * ``tokenize_batch(...)`` — byte-LUT tokenization of parsed records
                              straight into a padded int32 token matrix —
                              a tokens-only bulk pipeline never creates
                              per-sequence Python strings at all.

Everything degrades gracefully: if g++ is missing, the compile fails, or
``ESM_TPU_NO_NATIVE=1`` is set, ``available()`` returns False and callers
(esm_tpu/data/fasta.py) keep their pure-Python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).with_name("fasta.cc")
_lib = None
_tried = False


def _cache_dir() -> Path:
    return Path(
        os.environ.get("ESM_TPU_CACHE", Path.home() / ".cache" / "esm_tpu")
    ) / "native"


def _build() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = _cache_dir() / f"esm_fasta_{tag}.so"
    if so.exists():
        return so
    so.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=so.parent)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic under concurrent builders
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return so


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ESM_TPU_NO_NATIVE") == "1":
        return None
    try:
        lib = ctypes.CDLL(str(_build()))
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.esm_fasta_parse.restype = ctypes.c_int
        lib.esm_fasta_parse.argtypes = [
            ctypes.c_char_p, i64p, i64p, i64p,
            ctypes.c_char_p, i64p, ctypes.c_char_p, i64p,
        ]
        lib.esm_tokenize_batch.restype = ctypes.c_int64
        lib.esm_tokenize_batch.argtypes = [
            ctypes.c_char_p, i64p, i64p, ctypes.c_int64, i32p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_fasta(
    path,
) -> Optional[Tuple[List[str], np.ndarray, np.ndarray]]:
    """Parse a FASTA file natively.

    Returns ``(labels, seq_buf, seq_off)`` where record i's cleaned sequence
    bytes are ``seq_buf[seq_off[i]:seq_off[i+1]]`` — or None when the native
    library is unavailable, the file cannot be mapped, the file changed
    between the sizing and fill passes, or the content is not pure ASCII.
    The ASCII gate keeps exact parity with the reference's text-mode parser
    (byte offsets == character offsets; invalid UTF-8 raises
    UnicodeDecodeError in the fallback instead of being silently mangled;
    non-ASCII whitespace keeps Python str.strip semantics).
    """
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    lb = ctypes.c_int64()
    sb = ctypes.c_int64()
    path_b = os.fsencode(str(path))
    nullc = ctypes.c_char_p()
    null64 = ctypes.POINTER(ctypes.c_int64)()
    if lib.esm_fasta_parse(
        path_b, ctypes.byref(n), ctypes.byref(lb), ctypes.byref(sb),
        nullc, null64, nullc, null64,
    ) != 0:
        return None
    label_buf = np.zeros(max(lb.value, 1), dtype=np.uint8)
    seq_buf = np.zeros(max(sb.value, 1), dtype=np.uint8)
    label_off = np.empty(n.value + 1, dtype=np.int64)
    seq_off = np.empty(n.value + 1, dtype=np.int64)
    # in-out: capacities in, actual counts out; the C side bounds-checks every
    # write and returns -2 if the file grew between the passes
    n2 = ctypes.c_int64(n.value)
    lb2 = ctypes.c_int64(lb.value)
    sb2 = ctypes.c_int64(sb.value)
    if lib.esm_fasta_parse(
        path_b, ctypes.byref(n2), ctypes.byref(lb2), ctypes.byref(sb2),
        label_buf.ctypes.data_as(ctypes.c_char_p), _i64p(label_off),
        seq_buf.ctypes.data_as(ctypes.c_char_p), _i64p(seq_off),
    ) != 0 or n2.value != n.value:
        return None  # file changed between passes
    if (lb2.value and label_buf[:lb2.value].max() >= 128) or (
        sb2.value and seq_buf[:sb2.value].max() >= 128
    ):
        return None  # non-ASCII content: exact-semantics fallback
    lview = label_buf[:lb2.value].tobytes().decode("ascii")
    off = label_off.tolist()  # plain ints slice ~2x faster than np.int64
    labels = [lview[off[i]:off[i + 1]] for i in range(n.value)]
    return labels, seq_buf, seq_off[: n.value + 1]


def tokenize_batch(
    seq_buf: np.ndarray,
    seq_off: np.ndarray,
    indices,
    lut: np.ndarray,
    *,
    truncation: Optional[int] = None,
    bos: int = -1,
    eos: int = -1,
    pad: int = 0,
    stride: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Fill a padded (len(indices), stride) int32 token matrix from parsed
    records. Returns None on unmapped bytes (caller uses the exact tokenizer)
    or when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    lut = np.ascontiguousarray(lut, dtype=np.int32)
    trunc = int(truncation) if truncation else 0
    lens = seq_off[idx + 1] - seq_off[idx]
    if trunc:
        lens = np.minimum(lens, trunc)
    need = int(lens.max() if len(idx) else 0) + (bos >= 0) + (eos >= 0)
    if stride is None:
        stride = need
    elif stride < need:
        raise ValueError(f"stride {stride} < longest row {need}")
    out = np.empty((len(idx), stride), dtype=np.int32)
    rc = lib.esm_tokenize_batch(
        seq_buf.ctypes.data_as(ctypes.c_char_p),
        _i64p(np.ascontiguousarray(seq_off, dtype=np.int64)),
        _i64p(idx), len(idx), _i32p(lut), trunc,
        bos, eos, pad,
        _i32p(out), stride,
    )
    if rc != 0:
        return None
    return out
