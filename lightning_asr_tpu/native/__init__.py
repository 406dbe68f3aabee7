"""Native (C++) runtime components, loaded via ctypes.

Builds ``native/ctc_decoder/ctc_beam_search.cpp`` into a shared library on
first use (g++ -O3; cached under ``native/build/``).  Provides:
  * the CTC prefix beam-search decoder with ARPA n-gram LM fusion
    (the reference's SWIG ``ctc_decoders`` + KenLM stack)
  * ``editdistance_eval`` — Levenshtein over token sequences (the
    reference's ``editdistance`` C extension role)
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Sequence

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "ctc_decoder" / "ctc_beam_search.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB_PATH = _BUILD_DIR / "liblasr_native.so"

_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build() -> None:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    logger.info("building native library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if _lib_error is not None:
        raise RuntimeError(f"native library unavailable: {_lib_error}")
    try:
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception as e:  # pragma: no cover
        _lib_error = str(e)
        raise RuntimeError(f"native library unavailable: {e}") from e

    lib.lasr_lm_load.restype = ctypes.c_void_p
    lib.lasr_lm_load.argtypes = [ctypes.c_char_p]
    lib.lasr_lm_free.argtypes = [ctypes.c_void_p]
    lib.lasr_lm_order.restype = ctypes.c_int
    lib.lasr_lm_order.argtypes = [ctypes.c_void_p]
    lib.lasr_lm_score_sentence.restype = ctypes.c_double
    lib.lasr_lm_score_sentence.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lasr_decoder_create.restype = ctypes.c_void_p
    lib.lasr_decoder_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.lasr_decoder_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "lasr_decoder_add_hotword"):  # rebuilt lib
        lib.lasr_decoder_add_hotword.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_float,
        ]
    lib.lasr_decode.restype = ctypes.c_int
    lib.lasr_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.lasr_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.lasr_editdistance.restype = ctypes.c_int
    lib.lasr_editdistance.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.lasr_load_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    if hasattr(lib, "lasr_load_wav_batch_i16"):  # rebuilt lib
        lib.lasr_load_wav_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
    if hasattr(lib, "lasr_parse_wav_batch_mem"):  # rebuilt lib
        lib.lasr_parse_wav_batch_mem.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def editdistance_eval(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance via the C++ kernel; tokens are hashed to ids."""
    lib = get_lib()
    table: dict = {}

    def ids(seq):
        out = (ctypes.c_int * len(seq))()
        for i, tok in enumerate(seq):
            out[i] = table.setdefault(tok, len(table))
        return out

    return lib.lasr_editdistance(ids(a), len(a), ids(b), len(b))


def load_wav_batch(paths, offsets, max_samples: int, num_threads: int = 4,
                   dtype: str = "float32"):
    """Decode a batch of WAV files into a padded (B, max_samples) array via
    the native threaded loader (GIL-free).

    ``dtype='int16'`` keeps raw PCM16 samples (mono PCM16 files decode as a
    straight memcpy) — half the host->device wire bytes; the device frontend
    rescales by 1/32768.  Returns (waves, lens, prev_samples, sample_rates);
    lens[i] == -1 marks a decode failure for row i.
    """
    import numpy as np

    lib = get_lib()
    B = len(paths)
    lens = np.zeros(B, np.int32)
    prevs = np.zeros(B, np.float32)
    srs = np.zeros(B, np.int32)
    offs = np.asarray(offsets if offsets is not None else np.zeros(B), np.int32)
    c_paths = (ctypes.c_char_p * B)(*[str(p).encode() for p in paths])
    common = (
        c_paths, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), B)
    tail = (
        max_samples, num_threads,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        prevs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if dtype == "int16" and hasattr(lib, "lasr_load_wav_batch_i16"):
        out = np.zeros((B, max_samples), np.int16)
        lib.lasr_load_wav_batch_i16(
            *common, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), *tail)
    else:
        out = np.zeros((B, max_samples), np.float32)
        lib.lasr_load_wav_batch(
            *common, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *tail)
    return out, lens, prevs, srs


def parse_wav_batch_mem(buffers: Sequence[bytes], max_samples: int,
                        num_threads: int = 4):
    """Decode a batch of IN-MEMORY wav images (e.g. HTTP request bodies)
    into a padded (B, max_samples) float32 array via the native thread pool
    — one GIL-free pass per device batch instead of per-request Python
    decode threads (the r3 serving collapse at concurrency 32 on a 1-core
    host).  Returns (waves, lens, sample_rates); lens[i] == -1 marks a
    malformed body.  Raises AttributeError if the cached native lib
    predates this entry point (callers fall back to read_audio)."""
    import numpy as np

    lib = get_lib()
    if not hasattr(lib, "lasr_parse_wav_batch_mem"):
        raise AttributeError("native lib predates lasr_parse_wav_batch_mem; "
                             "delete native/build to rebuild")
    B = len(buffers)
    lens = np.zeros(B, np.int32)
    srs = np.zeros(B, np.int32)
    sizes = np.asarray([len(b) for b in buffers], dtype=np.int_)
    bufs = (ctypes.c_char_p * B)(*buffers)
    out = np.zeros((B, max_samples), np.float32)
    lib.lasr_parse_wav_batch_mem(
        bufs, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), B,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        num_threads, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, lens, srs
