"""The no-fit Pallas fast path (zero-padded inputs) vs the exact-fit kernel."""

import numpy as np
import pytest

from oracle import count_overlapping
from multithreading_string_matching_tpu.ops.window import WindowProgram
from multithreading_string_matching_tpu.ops.pallas_window import PallasWindowMatcher

PATS = [b"ab", b"aba", b"b", b"abab", b"ca", b"abcdefgh"]  # all NUL-free


def _zero_padded(rng, n, lmax):
    payloads = rng.integers(1, 4, size=(n, lmax)).astype(np.uint8)  # bytes 1..3
    lengths = rng.integers(0, lmax + 1, size=n).astype(np.int32)
    cols = np.arange(lmax)[None, :]
    payloads = np.where(cols < lengths[:, None], payloads, 0).astype(np.uint8)
    return payloads, lengths


def test_nofit_equals_fit_and_oracle():
    rng = np.random.default_rng(41)
    wp = WindowProgram.build(PATS)
    payloads, lengths = _zero_padded(rng, 24, 128)
    fit = PallasWindowMatcher(wp, row_tile=8, interpret=True)
    nofit = PallasWindowMatcher(
        wp, row_tile=8, interpret=True, assume_zero_padded=True
    )
    a = np.asarray(fit.count_tiles([(payloads, lengths)]))
    b = np.asarray(nofit.count_tiles([(payloads, lengths)]))
    texts = [payloads[i, : lengths[i]].tobytes() for i in range(24)]
    want = np.array([sum(count_overlapping(t, p) for t in texts) for p in PATS])
    assert (a == want).all()
    assert (b == want).all()


def test_full_length_rows_no_wrap_false_match():
    """len == row width leaves no zero padding; the zero-extended windows
    must still prevent wrap-around false matches at the row edge."""
    wp = WindowProgram.build([b"ab"])
    nofit = PallasWindowMatcher(
        wp, row_tile=8, interpret=True, assume_zero_padded=True
    )
    row = np.zeros((8, 128), np.uint8)
    row[0, :] = ord("x")
    row[0, -1] = ord("a")   # row ends with 'a'
    row[0, 0] = ord("b")    # row STARTS with 'b' -> wrap would see "ab"
    lengths = np.full(8, 128, np.int32)
    got = np.asarray(nofit.count_tiles([(row, lengths)]))
    assert got.tolist() == [0]


def test_nul_pattern_forces_fit_kernel():
    wp = WindowProgram.build([b"\x00a"])
    m = PallasWindowMatcher(wp, row_tile=8, interpret=True, assume_zero_padded=True)
    payloads = np.zeros((8, 128), np.uint8)
    payloads[0, 1] = ord("a")  # "\0a" at position 0 within length 4
    lengths = np.zeros(8, np.int32)
    lengths[0] = 4
    got = np.asarray(m.count_tiles([(payloads, lengths)]))
    # occurrences of "\0a" in b"\0a\0\0": exactly 1
    assert got.tolist() == [1]


def test_matcher_count_sanitizes_dirty_padding(strings_path):
    """Matcher.count must give correct results even when caller buffers have
    garbage beyond lengths (prepare() sanitizes)."""
    from multithreading_string_matching_tpu import Matcher, load_patterns

    m = Matcher(load_patterns(strings_path))
    rng = np.random.default_rng(42)
    payloads = rng.integers(0, 256, size=(16, 200)).astype(np.uint8)
    payloads[:, 100:] = ord("h")  # garbage: 'hhhh...' beyond every length
    payloads[0, 50:54] = np.frombuffer(b"http", np.uint8)
    lengths = np.full(16, 100, np.int32)
    got = m.count(payloads, lengths)
    texts = [payloads[i, :100].tobytes() for i in range(16)]
    import oracle

    want = np.array(oracle.oracle_counts(texts, m.patterns))
    assert (got == want).all()
