"""ctypes bridge to the C++ ingest fast path (native/pcap_ingest.cpp).

Built on demand with g++ (cached next to the source); every routine has a
bit-identical numpy implementation (io/pcap.py, io/decode.py) that remains
the spec — the native path exists because the per-record Python walk and the
per-packet fill dominate ingest wall-clock on multi-GB captures.  Falls back
silently if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = pathlib.Path(__file__).parent.parent / "native" / "pcap_ingest.cpp"
_SO = _SRC.parent / "libmsm_ingest.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile_to(out: pathlib.Path) -> bool:
    """g++ the source to ``out`` — the ONE compile command (the normal
    build and the stale-rebind path must not drift apart in flags)."""
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(_SRC)],
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        try:
            out.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def _build() -> bool:
    # Compile to a per-process temp name, then atomically rename into place:
    # concurrent builders (pytest workers, CLI + bench) each produce a whole
    # .so and the last rename wins — nobody can CDLL a half-written file.
    tmp = _SO.with_name(f".{_SO.name}.{os.getpid()}.tmp")
    if not _compile_to(tmp):
        return False
    try:
        os.replace(tmp, _SO)
        return True
    except OSError:
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MSM_NO_NATIVE"):
            return None
        try:
            stale = not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime
        except OSError:
            # Source absent (binary-only install) but a built .so exists:
            # use it; with neither present, fall back to numpy silently.
            stale = not _SO.exists()
        if stale:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            _bind(lib)
        except OSError:
            return None
        except AttributeError:
            # A pre-existing .so built from an OLDER source lacks newer
            # symbols (binary-only installs never rebuild; a clock-skewed
            # mtime can defeat the staleness check).  Rebuild once if we
            # can; otherwise fall back to numpy rather than crash every
            # caller of available().  The fresh build must load through a
            # UNIQUE path: dlopen caches by name, so re-loading _SO's path
            # would return the stale handle we just rejected.
            tmp = _SO.with_name(f".{_SO.name}.{os.getpid()}.rebind")
            if not _compile_to(tmp):
                return None
            try:
                lib = ctypes.CDLL(str(tmp))
                _bind(lib)
            except (OSError, AttributeError):
                try:
                    tmp.unlink(missing_ok=True)
                except OSError:
                    pass
                return None
            try:
                # Future processes get the fresh library; this process's
                # handle survives the rename (and even an unlink) on Linux.
                os.replace(tmp, _SO)
            except OSError:
                try:
                    tmp.unlink(missing_ok=True)
                except OSError:
                    pass
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
    """Declare every symbol's signature; raises AttributeError if the
    loaded library predates one (get_lib handles the rebuild)."""
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.msm_parse_records.restype = ctypes.c_int64
    lib.msm_parse_records.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        i64p, i64p, i64p, i64p, i64p,
    ]
    lib.msm_parse_stream.restype = ctypes.c_int64
    lib.msm_parse_stream.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, i64p, i64p, i64p, i64p,
    ]
    lib.msm_parse_pcapng.restype = ctypes.c_int64
    lib.msm_parse_pcapng.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        i64p, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, i64p, i64p, i64p, i64p,
    ]
    lib.msm_decode.restype = None
    lib.msm_decode.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, u8p, i64p, i64p,
    ]
    lib.msm_fill_padded.restype = None
    lib.msm_fill_padded.argtypes = [
        u8p, i64p, i64p, ctypes.c_int64, u8p, ctypes.c_int64,
    ]
    lib.msm_scatter_segments.restype = None
    lib.msm_scatter_segments.argtypes = [
        u8p, i64p, i64p, i64p, i64p, ctypes.c_int64, u8p, ctypes.c_int64,
    ]
    lib.msm_pack_fill.restype = None
    lib.msm_pack_fill.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, u8p,
    ]
    lib.msm_pack_plan.restype = ctypes.c_int64
    lib.msm_pack_plan.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
    ]


def available() -> bool:
    return get_lib() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def parse_records(buf: np.ndarray, swapped: bool, strict: bool):
    """Native record walk; returns (offsets, caplens, origlens, ts_sec, ts_frac)
    or raises ValueError on truncation in strict mode."""
    lib = get_lib()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    count = lib.msm_parse_records(
        _u8(buf), buf.size, int(swapped), int(strict), None, None, None, None, None
    )
    if count < 0:
        raise ValueError("truncated pcap record")
    arrs = [np.empty(count, dtype=np.int64) for _ in range(5)]
    lib.msm_parse_records(
        _u8(buf), buf.size, int(swapped), int(strict), *[_i64(a) for a in arrs]
    )
    return tuple(arrs)


def parse_stream(pend, pos: int, swapped: bool, batch_max: int, max_record: int):
    """Native streaming record walk over ``pend[pos:]`` (a bytearray): parse
    every complete record up to ``batch_max``.  Returns
    ``(count, consumed, status, need, offsets, caplens, origlens, ts, tsf)``
    — offsets are packet-data starts relative to ``pos``; status/need per
    msm_parse_stream (0 = need more bytes, 1 = batch full, 2 = oversized
    record).  The buffer export is released before returning so the caller
    may resize ``pend`` again."""
    lib = get_lib()
    assert lib is not None
    avail = len(pend) - pos
    cap = max(1, min(int(batch_max), avail // 16 + 1))
    arrs = [np.empty(cap, dtype=np.int64) for _ in range(5)]
    state = np.zeros(3, dtype=np.int64)
    # The array decays to u8p at the call; ctypes.cast would leak the
    # buffer export and the caller's next resize of pend would raise.
    c_buf = (ctypes.c_uint8 * avail).from_buffer(pend, pos)
    try:
        count = lib.msm_parse_stream(
            c_buf, avail, int(swapped), cap, max_record,
            *[_i64(a) for a in arrs], _i64(state),
        )
    finally:
        del c_buf  # release the bytearray export (refill resizes pend)
    return (int(count), int(state[0]), int(state[1]), int(state[2]),
            *[a[:count] for a in arrs])


def parse_pcapng(
    pend, pos: int, swapped: bool, batch_max: int, max_block: int,
    tsdivs, spb_snap: int,
):
    """Native pcapng packet-block walk over ``pend[pos:]`` (current section
    only; stops at any non-EPB/SPB/PB block for the Python parser).
    ``pend`` may be a bytearray (streaming buffer) or bytes (the one-shot
    reader's immutable file image — the walk only reads).  Returns
    ``(count, consumed, status, aux, data_off, caplens, origlens,
    ts_sec, ts_frac)`` per msm_parse_pcapng."""
    lib = get_lib()
    assert lib is not None
    avail = len(pend) - pos
    # A VALID packet block is >= 16 bytes (12-byte frame + the smallest SPB
    # body); a 12-byte one stops the walk as malformed before any output is
    # written, so avail//16 bounds the per-call output arrays.
    cap = max(1, min(int(batch_max), avail // 16 + 1))
    arrs = [np.empty(cap, dtype=np.int64) for _ in range(5)]
    state = np.zeros(3, dtype=np.int64)
    divs = np.ascontiguousarray(tsdivs, dtype=np.int64)
    if isinstance(pend, bytearray):
        c_buf = (ctypes.c_uint8 * avail).from_buffer(pend, pos)
    else:  # read-only source: a zero-copy numpy view carries the pointer
        c_buf = _u8(np.frombuffer(pend, dtype=np.uint8, offset=pos))
    try:
        count = lib.msm_parse_pcapng(
            c_buf, avail, int(swapped), cap, max_block,
            _i64(divs), divs.size, spb_snap,
            *[_i64(a) for a in arrs], _i64(state),
        )
    finally:
        del c_buf  # release the bytearray export (refill resizes pend)
    return (int(count), int(state[0]), int(state[1]), int(state[2]),
            *[a[:count] for a in arrs])


def decode(buf, offsets, caplens, origlens, mode: str, strict: bool):
    """Native validity/geometry decode; mirrors io.decode.decode_headers."""
    lib = get_lib()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    caplens = np.ascontiguousarray(caplens, dtype=np.int64)
    origlens = np.ascontiguousarray(origlens, dtype=np.int64)
    n = offsets.size
    valid = np.empty(n, dtype=np.uint8)
    poff = np.empty(n, dtype=np.int64)
    plen = np.empty(n, dtype=np.int64)
    lib.msm_decode(
        _u8(buf), buf.size, _i64(offsets), _i64(caplens), _i64(origlens), n,
        0 if mode == "udp" else 1, int(strict), _u8(valid), _i64(poff), _i64(plen),
    )
    return valid.astype(bool), poff, plen


def _pack_plan(lengths: np.ndarray, width: int):
    """Run msm_pack_plan; returns (members, per_row, fills, n_rows) or None
    when there is nothing to pack."""
    lib = get_lib()
    assert lib is not None
    lmax = int(lengths.max()) if lengths.size else 0
    if lmax > width:
        # Mirror the Python spec (ops/bucketing.pack_plan): an oversized
        # segment must raise, not yield a fill > width whose msm_pack_fill
        # memcpy would run past the row.
        raise ValueError(f"payload of {lmax} bytes exceeds pack width {width}")
    order = np.argsort(lengths, kind="stable")
    order = np.ascontiguousarray(order[lengths[order] > 0], dtype=np.int64)
    n_ord = order.size
    if n_ord == 0:
        return None
    members = np.empty(n_ord, dtype=np.int64)
    per_row = np.empty(n_ord, dtype=np.int64)
    fills = np.empty(n_ord, dtype=np.int64)
    n_rows = lib.msm_pack_plan(
        _i64(lengths), _i64(order), n_ord, width,
        _i64(members), _i64(per_row), _i64(fills),
    )
    return members, per_row, fills, int(n_rows)


def plan_rows(lengths, width: int) -> int:
    """Row count the packing plan would produce (for staging-policy
    decisions) without materializing any bytes."""
    got = _pack_plan(np.ascontiguousarray(lengths, dtype=np.int64), width)
    return got[3] if got is not None else 0


def pack(payloads, lengths, width: int):
    """Native plan+materialize for ops/bucketing.pack_rows (bit-identical to
    the Python implementation; returns (packed, fills) or None for the
    no-nonempty-segments case the caller handles)."""
    lib = get_lib()
    assert lib is not None
    payloads = np.ascontiguousarray(payloads, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    got = _pack_plan(lengths, width)
    if got is None:
        return None
    members, per_row, fills, n_rows = got
    per_row = per_row[:n_rows]
    out = np.zeros((n_rows, width), dtype=np.uint8)
    lib.msm_pack_fill(
        _u8(payloads), payloads.shape[1] if payloads.ndim == 2 else 0,
        _i64(lengths), _i64(members), _i64(per_row),
        n_rows, width, _u8(out),
    )
    return out, fills[:n_rows].astype(np.int32)


def scatter_segments(buf, src, lens, rows, offs, out) -> None:
    """Copy segment slices buf[src[s]:src[s]+lens[s]] into
    out[rows[s], offs[s]:...] — the flow-reassembly fill.  ``out`` must be
    a C-contiguous uint8 2-D array; geometry must be in-bounds (io/flows
    derives it from the same decode that sized ``out``)."""
    lib = get_lib()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    # The WRITE target cannot be defensively copied (the caller reads the
    # result from its own array), so validate instead: a float64 or
    # non-contiguous `out` would make the C row stride wrong and corrupt
    # memory silently.
    if out.dtype != np.uint8 or not out.flags.c_contiguous:
        # A raise, not an assert: python -O must not re-enable the silent
        # corruption this check exists to prevent.
        raise ValueError("scatter_segments: out must be C-contiguous uint8")
    lib.msm_scatter_segments(
        _u8(buf), _i64(np.ascontiguousarray(src, np.int64)),
        _i64(np.ascontiguousarray(lens, np.int64)),
        _i64(np.ascontiguousarray(rows, np.int64)),
        _i64(np.ascontiguousarray(offs, np.int64)),
        len(src), _u8(out), out.shape[1],
    )


def fill_padded(buf, starts, lens, lmax: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    out = np.zeros((starts.size, lmax), dtype=np.uint8)
    lib.msm_fill_padded(_u8(buf), _i64(starts), _i64(lens), starts.size, _u8(out), lmax)
    return out
