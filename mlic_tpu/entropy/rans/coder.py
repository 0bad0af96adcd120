"""Python interface to the native rANS coder (ctypes), with a numpy fallback.

API mirrors what the reference uses from compressai's C++ extension
(``BufferedRansEncoder.encode_with_indexes/flush`` and
``RansDecoder.set_stream/decode_stream`` — reference
``MLIC++/models/mlicpp.py:215,279-280,306-307``), but takes numpy arrays
instead of Python lists: the TPU produces packed int32 arrays and we avoid
the per-element ``tolist()`` churn of the reference's device↔host boundary.

The native library is compiled on demand from ``rans.cpp`` with g++ and
cached next to the source.  The ``_NumpyRans*`` classes implement the exact
same stream format in vectorized-ish numpy and serve as both a fallback and
a cross-check in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rans.cpp")
_LIB = os.path.join(_HERE, "_librans.so")
_build_lock = threading.Lock()

PROB_BITS = 16
_RANS_L = 1 << 31
_BYPASS_BITS = 5
_BYPASS_FREQ = 1 << (PROB_BITS - _BYPASS_BITS)
_MASK16 = (1 << PROB_BITS) - 1


def _build_native() -> str | None:
    with _build_lock:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB + ".tmp", _SRC],
                check=True, capture_output=True,
            )
            os.replace(_LIB + ".tmp", _LIB)
            return _LIB
        except Exception:
            return None


def _load_native():
    path = _build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mlic_rans_encode.restype = ctypes.c_int64
    lib.mlic_rans_encode.argtypes = [i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                     i32p, i32p, u8p, ctypes.c_int64]
    lib.mlic_rans_decoder_new.restype = ctypes.c_void_p
    lib.mlic_rans_decoder_new.argtypes = [u8p, ctypes.c_int64]
    lib.mlic_rans_decoder_free.argtypes = [ctypes.c_void_p]
    lib.mlic_rans_decode.restype = ctypes.c_int32
    lib.mlic_rans_decode.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64, i32p,
                                     ctypes.c_int64, i32p, i32p, i32p]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.mlic_rans_decode_lut.restype = ctypes.c_int32
    lib.mlic_rans_decode_lut.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64,
                                         i32p, ctypes.c_int64, i32p, i32p,
                                         u16p, i32p]
    lib.mlic_rans_decode_all.restype = ctypes.c_int32
    lib.mlic_rans_decode_all.argtypes = [u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
                                         ctypes.c_int64, i32p, i32p, i32p]
    u16p2 = ctypes.POINTER(ctypes.c_uint16)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mlic_rans16_encode_interleaved.restype = ctypes.c_int64
    lib.mlic_rans16_encode_interleaved.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int64,
        i32p, i32p, u16p2, ctypes.c_int64, i64p, i64p,
        i32p, ctypes.c_int64, i64p]
    lib.mlic_rans16_decode_interleaved.restype = ctypes.c_int32
    lib.mlic_rans16_decode_interleaved.argtypes = [
        u16p2, i64p, ctypes.c_int32, i32p, ctypes.c_int64, i32p,
        ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int64, i32p]
    return lib


_NATIVE = _load_native()


def rans_backend() -> str:
    return "native" if _NATIVE is not None else "numpy"


# Per-table O(1) cf -> slot lookup tables (uint16 [n_ctx, 2^16]), cached by
# the identity of the CDF buffer.  Costs 128 KB per context row; built once
# per table set (once per checkpoint in practice).
_LUT_CACHE: dict[tuple, np.ndarray] = {}


def _slot_lut(cdfs: np.ndarray, cdf_lengths: np.ndarray) -> np.ndarray:
    import hashlib
    key = (hashlib.sha1(cdfs.tobytes()).hexdigest(),
           hashlib.sha1(np.ascontiguousarray(cdf_lengths).tobytes()).hexdigest())
    lut = _LUT_CACHE.get(key)
    if lut is None:
        n = cdfs.shape[0]
        cf = np.arange(1 << PROB_BITS, dtype=np.int32)
        lut = np.empty((n, 1 << PROB_BITS), dtype=np.uint16)
        for i in range(n):
            row = cdfs[i, : int(cdf_lengths[i])]
            lut[i] = (np.searchsorted(row, cf, side="right") - 1).astype(np.uint16)
        if len(_LUT_CACHE) > 8:
            _LUT_CACHE.clear()
        _LUT_CACHE[key] = lut
    return lut


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


# ---------------------------------------------------------------------------
# Pure-numpy implementation of the identical stream format (fallback + test
# oracle for the native library).
# ---------------------------------------------------------------------------
class _NumpyEncoder:
    def __init__(self):
        self.x = _RANS_L
        self.words: list[int] = []

    def put(self, start: int, freq: int):
        x = self.x
        x_max = ((_RANS_L >> PROB_BITS) << 32) * freq
        while x >= x_max:
            self.words.append(x & 0xFFFFFFFF)
            x >>= 32
        self.x = ((x // freq) << PROB_BITS) + (x % freq) + start

    def put_escape_payload(self, value: int, max_value: int):
        u = -2 * value - 1 if value < 0 else 2 * (value - max_value)
        digits = []
        while True:
            digits.append(u & 0xF)
            u >>= 4
            if u == 0:
                break
        for i in range(len(digits) - 1, -1, -1):
            s5 = digits[i] | (0x10 if i + 1 < len(digits) else 0)
            self.put(s5 << (PROB_BITS - _BYPASS_BITS), _BYPASS_FREQ)

    def flush(self) -> bytes:
        words = [self.x & 0xFFFFFFFF, (self.x >> 32) & 0xFFFFFFFF] + self.words[::-1]
        return np.asarray(words, dtype=np.uint32).tobytes()


class _NumpyDecoder:
    def __init__(self, stream: bytes):
        self.words = np.frombuffer(stream[: len(stream) // 4 * 4], dtype=np.uint32)
        self.pos = 0
        lo = int(self.words[0]) if len(self.words) > 0 else 0
        hi = int(self.words[1]) if len(self.words) > 1 else 0
        self.pos = min(2, len(self.words))
        self.x = (hi << 32) | lo

    def _renorm(self):
        while self.x < _RANS_L and self.pos < len(self.words):
            self.x = (self.x << 32) | int(self.words[self.pos])
            self.pos += 1

    def advance(self, start: int, freq: int):
        cf = self.x & _MASK16
        self.x = freq * (self.x >> PROB_BITS) + cf - start
        self._renorm()

    def get_bypass5(self) -> int:
        s5 = (self.x & _MASK16) >> (PROB_BITS - _BYPASS_BITS)
        self.advance(s5 << (PROB_BITS - _BYPASS_BITS), _BYPASS_FREQ)
        return s5

    def get_escape_payload(self, max_value: int) -> int:
        u = 0
        shift = 0
        while True:
            s5 = self.get_bypass5()
            u |= (s5 & 0xF) << shift
            shift += 4
            if not (s5 & 0x10):
                break
        if u & 1:
            return -((u + 1) >> 1)
        return (u >> 1) + max_value

    def decode(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        indexes = _as_i32(indexes).ravel()
        out = np.empty(len(indexes), dtype=np.int32)
        for k, i in enumerate(indexes):
            row = cdfs[i]
            length = int(cdf_lengths[i])
            max_value = length - 2
            cf = self.x & _MASK16
            slot = int(np.searchsorted(row[:length], cf, side="right")) - 1
            self.advance(int(row[slot]), int(row[slot + 1] - row[slot]))
            value = self.get_escape_payload(max_value) if slot == max_value else slot
            out[k] = value + int(offsets[i])
        return out


def _numpy_encode(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    symbols = _as_i32(symbols).ravel()
    indexes = _as_i32(indexes).ravel()
    enc = _NumpyEncoder()
    for k in range(len(symbols) - 1, -1, -1):
        i = int(indexes[k])
        row = cdfs[i]
        length = int(cdf_lengths[i])
        max_value = length - 2
        value = int(symbols[k]) - int(offsets[i])
        if 0 <= value < max_value:
            slot = value
        else:
            enc.put_escape_payload(value, max_value)
            slot = max_value
        enc.put(int(row[slot]), int(row[slot + 1] - row[slot]))
    return enc.flush()


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------
def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    """Encode int32 symbols addressed by per-symbol CDF rows; returns bytes."""
    symbols = _as_i32(symbols).ravel()
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    if cdfs.ndim != 2:
        raise ValueError("cdfs must be 2-D [n_ctx, max_len]")
    if _NATIVE is None:
        return _numpy_encode(symbols, indexes, cdfs, cdf_lengths, offsets)
    n = len(symbols)
    capacity = 16 * max(n, 1) + 64
    while True:
        out = np.empty(capacity, dtype=np.uint8)
        written = _NATIVE.mlic_rans_encode(
            _i32p(symbols), _i32p(indexes), n, _i32p(cdfs), cdfs.shape[1],
            _i32p(cdf_lengths), _i32p(offsets),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity)
        if written >= 0:
            return out[:written].tobytes()
        capacity *= 4


def decode_with_indexes(stream: bytes, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    """One-shot decode of len(indexes) symbols from a stream."""
    dec = RansDecoder()
    dec.set_stream(stream)
    return dec.decode_stream(indexes, cdfs, cdf_lengths, offsets)


# ---------------------------------------------------------------------------
# Interleaved multi-lane rans16 (device-decodable format)
# ---------------------------------------------------------------------------
def encode_interleaved(symbols, indexes, n_lanes: int, cdfs, cdf_lengths,
                       offsets) -> bytes:
    """Encode into ``n_lanes`` lockstep rans16 lane streams (format v2).

    Out-of-support symbols advance the lane with the escape slot but their
    raw value travels in a plain int32 side channel (position order) instead
    of in-lane bypass digits — so the TPU decode scan stays free of
    data-dependent control flow (the patch is one vectorized pass).

    Byte layout: uint32 n_lanes | uint32 n_words | uint32 n_escapes |
    uint32 lane_begin[n_lanes] | uint16 words[n_words] | pad to 4B |
    int32 esc_values[n_escapes] — little-endian.  Decodable on-device by
    ``mlic_tpu.entropy.device_rans`` or on host by ``decode_interleaved``
    (test oracle).
    """
    if _NATIVE is None:
        raise RuntimeError("interleaved rANS requires the native library")
    symbols = _as_i32(symbols).ravel()
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    n = len(symbols)
    cap = 8 * max(n, n_lanes) + 4 * n_lanes + 64
    esc_cap = max(n, 16)
    esc = np.empty(esc_cap, dtype=np.int32)
    n_esc = np.zeros(1, dtype=np.int64)
    while True:
        words = np.empty(cap, dtype=np.uint16)
        begin = np.empty(n_lanes, dtype=np.int64)
        end = np.empty(n_lanes, dtype=np.int64)
        total = _NATIVE.mlic_rans16_encode_interleaved(
            _i32p(symbols), _i32p(indexes), n, n_lanes, _i32p(cdfs),
            cdfs.shape[1], _i32p(cdf_lengths), _i32p(offsets),
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap,
            begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _i32p(esc), esc_cap,
            n_esc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if total >= 0:
            break
        cap *= 4
    e = int(n_esc[0])
    header = np.asarray([n_lanes, total, e], dtype=np.uint32).tobytes()
    body = begin.astype(np.uint32).tobytes() + words[:total].tobytes()
    if len(body) % 4:
        body += b"\x00\x00"
    return header + body + esc[:e].tobytes()


def parse_interleaved(stream: bytes):
    """-> (words uint16 [n_words], lane_begin int64 [n_lanes],
    esc_values int32 [n_escapes])."""
    head = np.frombuffer(stream[:12], dtype=np.uint32)
    n_lanes, n_words, n_esc = int(head[0]), int(head[1]), int(head[2])
    off = 12 + 4 * n_lanes
    begin = np.frombuffer(stream[12:off], dtype=np.uint32).astype(np.int64)
    words = np.frombuffer(stream[off:off + 2 * n_words], dtype=np.uint16)
    off += 2 * n_words
    if off % 4:
        off += 2
    esc = np.frombuffer(stream[off:off + 4 * n_esc], dtype=np.int32)
    return words, begin, esc


def decode_interleaved(stream: bytes, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
    """Host reference decode of the interleaved format."""
    if _NATIVE is None:
        raise RuntimeError("interleaved rANS requires the native library")
    words, begin, esc = parse_interleaved(stream)
    words = np.ascontiguousarray(words)
    esc = np.ascontiguousarray(esc)
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    out = np.empty(len(indexes), dtype=np.int32)
    rc = _NATIVE.mlic_rans16_decode_interleaved(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(begin), _i32p(indexes), len(indexes), _i32p(cdfs), cdfs.shape[1],
        _i32p(cdf_lengths), _i32p(offsets),
        _i32p(esc), len(esc), _i32p(out))
    if rc != 0:
        raise RuntimeError(f"interleaved decode failed: {rc}")
    return out


# ----------------------------------------------------------------------
# Interleaved format v3: GLOBAL EMISSION ORDER.
#
# Byte layout: uint32 (n_lanes | 0x80000000) | uint32 n_words |
# uint32 n_escapes | uint16 words[n_words] | pad to 4B |
# int32 esc_values[n_escapes] — little-endian.
#
# words = [lane 0 state hi, lane 0 state lo, ..., lane L-1 state lo]
# followed by the renorm words in (step-major, lane-minor) DECODER
# CONSUMPTION order.  rANS LIFO duality makes the encoder's emission mask
# at position (s, l) equal the decoder's renorm mask at the same position,
# so no per-lane begin table is needed (4 B/lane smaller than v2) and the
# decoder recovers word positions from its own per-step consumption ranks.
# Device mirror: ``device_rans.compact_streams_global`` / ``fmt="global"``.
# ----------------------------------------------------------------------

_V3_FLAG = np.uint32(1 << 31)
# Format v4 = v3 word layout + the hyper-latent coded INLINE as the leading
# phases (factorized-prior CDF rows; no separate z string exists).  Both
# flag bits are set so v3-only parsers fail loudly instead of misdecoding.
_V4_FLAG = np.uint32(1 << 30)


def stream_is_global(stream: bytes) -> bool:
    """True if a y-stream is format v3/v4 (global emission order)."""
    return bool(np.frombuffer(stream[:4], dtype=np.uint32)[0] & _V3_FLAG)


def stream_lanes(stream: bytes) -> int:
    """Lane count from a DEVICE-format y-stream header: every device
    format (v2 per-lane blocks, v3/v4 global order) leads with uint32
    n_lanes, v3/v4 OR-ed with the format flag bits.  Lets a decode-only
    ``Codec`` resolve its width from the stream itself.

    The result drives jit program construction, so a corrupted or
    foreign-format header (e.g. the steps backend's raw rANS streams,
    which have no header) must fail loudly here: requires >= 4 bytes and
    a power-of-two count in [1, 4096] (the encoder-side constraint —
    ``Codec.__init__``); raises ``ValueError`` otherwise."""
    if len(stream) < 4:
        raise ValueError(
            f"stream too short for a lane-count header ({len(stream)} B)")
    head = int(np.frombuffer(stream[:4], dtype=np.uint32)[0])
    lanes = head & ~int(_V3_FLAG | _V4_FLAG)
    if not 1 <= lanes <= 4096 or lanes & (lanes - 1):
        raise ValueError(
            f"implausible lane count {lanes} in stream header — corrupted "
            "stream or not a device-format stream")
    return lanes


def stream_is_unified(stream: bytes) -> bool:
    """True if the stream is format v4 (hyper-latent coded inline)."""
    if len(stream) < 4:
        return False
    return bool(np.frombuffer(stream[:4], dtype=np.uint32)[0] & _V4_FLAG)


def encode_global(symbols, indexes, n_lanes: int, cdfs, cdf_lengths,
                  offsets) -> bytes:
    """Format-v3 encode (vectorized numpy; host fallback + test oracle).

    Same contract as ``encode_interleaved``: ``len(symbols)`` must be a
    multiple of ``n_lanes`` (callers pad phases with pad-row symbols), and
    out-of-support values advance the lane with the escape slot while the
    raw value travels in the int32 side channel in position order.
    """
    symbols = _as_i32(symbols).ravel()
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    n = len(symbols)
    assert n % n_lanes == 0, "symbol count must be a lane multiple"
    S = n // n_lanes
    sym = symbols.reshape(S, n_lanes)
    row = indexes.reshape(S, n_lanes)
    mv = cdf_lengths[row] - 2
    off = offsets[row]
    v = sym - off
    esc = (v < 0) | (v >= mv)
    slot = np.where(esc, mv, v)
    start = cdfs[row, slot].astype(np.uint64)
    freq = cdfs[row, slot + 1].astype(np.uint64) - start
    x = np.full(n_lanes, 1 << PROB_BITS, np.uint64)
    emits = np.zeros((S, n_lanes), bool)
    words = np.zeros((S, n_lanes), np.uint16)
    for s in range(S - 1, -1, -1):  # rANS is LIFO: encode in reverse
        fr, st = freq[s], start[s]
        emit = x >= (fr << 16)
        words[s] = (x & _MASK16).astype(np.uint16)
        x = np.where(emit, x >> 16, x)
        x = ((x // fr) << PROB_BITS) + (x % fr) + st
        emits[s] = emit
    states = np.empty(2 * n_lanes, np.uint16)
    states[0::2] = (x >> 16).astype(np.uint16)
    states[1::2] = (x & _MASK16).astype(np.uint16)
    # boolean-mask flatten is row-major == (step-major, lane-minor) order
    allw = np.concatenate([states, words[emits]])
    esc_vals = sym[esc].astype(np.int32)
    header = np.asarray([np.uint32(n_lanes) | _V3_FLAG, len(allw),
                         len(esc_vals)], dtype=np.uint32).tobytes()
    body = allw.tobytes()
    if len(body) % 4:
        body += b"\x00\x00"
    return header + body + esc_vals.tobytes()


def parse_global(stream: bytes):
    """-> (n_lanes, words uint16 [n_words], esc_values int32 [n_escapes])."""
    head = np.frombuffer(stream[:12], dtype=np.uint32)
    assert head[0] & _V3_FLAG, "not a format-v3/v4 stream"
    n_lanes = int(head[0] & ~(_V3_FLAG | _V4_FLAG))
    n_words, n_esc = int(head[1]), int(head[2])
    off = 12
    words = np.frombuffer(stream[off:off + 2 * n_words], dtype=np.uint16)
    off += 2 * n_words
    if off % 4:
        off += 2
    esc = np.frombuffer(stream[off:off + 4 * n_esc], dtype=np.int32)
    return n_lanes, words, esc


def decode_global(stream: bytes, indexes, cdfs, cdf_lengths,
                  offsets) -> np.ndarray:
    """Host reference decode of format v3 (per-symbol loop; test oracle —
    the production decode path is ``device_rans`` ``fmt="global"``)."""
    n_lanes, words, esc_vals = parse_global(stream)
    indexes = _as_i32(indexes).ravel()
    cdfs = _as_i32(cdfs)
    cdf_lengths = _as_i32(cdf_lengths).ravel()
    offsets = _as_i32(offsets).ravel()
    n = len(indexes)
    assert n % n_lanes == 0
    S = n // n_lanes
    row = indexes.reshape(S, n_lanes)
    x = np.empty(n_lanes, np.uint64)
    for l in range(n_lanes):
        x[l] = (np.uint64(words[2 * l]) << np.uint64(16)) | np.uint64(
            words[2 * l + 1])
    ptr = 2 * n_lanes
    out = np.empty((S, n_lanes), np.int32)
    k = 0
    for s in range(S):
        for l in range(n_lanes):  # lane-ascending consumption within a step
            r = int(row[s, l])
            crow = cdfs[r]
            cf = int(x[l] & np.uint64(_MASK16))
            slot = int(np.searchsorted(crow[:cdf_lengths[r]], cf,
                                       side="right") - 1)
            start, freq = int(crow[slot]), int(crow[slot + 1] - crow[slot])
            x[l] = (np.uint64(freq) * (x[l] >> np.uint64(16))
                    + np.uint64(cf - start))
            if x[l] < np.uint64(1 << PROB_BITS):
                x[l] = (x[l] << np.uint64(16)) | np.uint64(words[ptr])
                ptr += 1
            if slot == int(cdf_lengths[r]) - 2:   # escape
                out[s, l] = esc_vals[k]
                k += 1
            else:
                out[s, l] = slot + offsets[r]
    return out.reshape(-1)


class BufferedRansEncoder:
    """Accumulates (symbols, indexes) chunks; encodes everything at flush().

    Matches the reference's usage pattern where all slices of a latent are
    buffered and emitted as one stream (reference MLIC++/models/mlicpp.py:215-280).
    """

    def __init__(self):
        self._symbols: list[np.ndarray] = []
        self._indexes: list[np.ndarray] = []
        self._cdfs = None
        self._cdf_lengths = None
        self._offsets = None

    def encode_with_indexes(self, symbols, indexes, cdfs=None, cdf_lengths=None, offsets=None):
        # cdf args accepted for API parity; tables are supplied at flush().
        self._symbols.append(_as_i32(symbols).ravel())
        self._indexes.append(_as_i32(indexes).ravel())
        if cdfs is not None:
            self._cdfs, self._cdf_lengths, self._offsets = cdfs, cdf_lengths, offsets

    def flush(self, cdfs=None, cdf_lengths=None, offsets=None) -> bytes:
        if cdfs is None:
            cdfs, cdf_lengths, offsets = self._cdfs, self._cdf_lengths, self._offsets
        if cdfs is None:
            raise ValueError("CDF tables required: pass them to flush() or to "
                             "encode_with_indexes()")
        symbols = np.concatenate(self._symbols) if self._symbols else np.empty(0, np.int32)
        indexes = np.concatenate(self._indexes) if self._indexes else np.empty(0, np.int32)
        self._symbols, self._indexes = [], []
        return encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)


class RansDecoder:
    """Streaming decoder: set_stream() once, decode_stream() repeatedly."""

    def __init__(self, use_lut: bool = False):
        self._handle = None
        self._np = None
        self._buf = None
        self.use_lut = use_lut

    def set_stream(self, stream: bytes):
        self.close()
        if _NATIVE is None:
            self._np = _NumpyDecoder(stream)
        else:
            self._buf = np.frombuffer(stream, dtype=np.uint8)
            if len(self._buf) == 0:
                self._buf = np.zeros(8, dtype=np.uint8)
            self._handle = _NATIVE.mlic_rans_decoder_new(
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(self._buf))

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        indexes = _as_i32(indexes).ravel()
        cdfs = _as_i32(cdfs)
        cdf_lengths = _as_i32(cdf_lengths).ravel()
        offsets = _as_i32(offsets).ravel()
        if self._np is not None:
            return self._np.decode(indexes, cdfs, cdf_lengths, offsets)
        if self._handle is None:
            raise RuntimeError("set_stream() must be called first")
        out = np.empty(len(indexes), dtype=np.int32)
        if self.use_lut:
            # O(1) slot lookup; measured SLOWER than binary search on small-
            # cache hosts (the 8 MB table thrashes), so opt-in only.
            lut = _slot_lut(cdfs, cdf_lengths)
            rc = _NATIVE.mlic_rans_decode_lut(
                ctypes.c_void_p(self._handle), _i32p(indexes), len(indexes),
                _i32p(cdfs), cdfs.shape[1], _i32p(cdf_lengths), _i32p(offsets),
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _i32p(out))
        else:
            rc = _NATIVE.mlic_rans_decode(
                ctypes.c_void_p(self._handle), _i32p(indexes), len(indexes),
                _i32p(cdfs), cdfs.shape[1], _i32p(cdf_lengths), _i32p(offsets),
                _i32p(out))
        if rc != 0:
            raise RuntimeError(f"rANS decode failed with code {rc}")
        return out

    def close(self):
        if self._handle is not None:
            _NATIVE.mlic_rans_decoder_free(ctypes.c_void_p(self._handle))
            self._handle = None
        self._np = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
