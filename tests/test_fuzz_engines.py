"""Property test: all four engines == oracle on adversarial random inputs.

The fixtures exercise real traffic; this exercises the corners — binary
payloads with embedded NULs, zero-length rows, payloads shorter/equal/longer
than patterns, duplicate and overlapping patterns, single-byte patterns,
patterns containing NUL (which force the Pallas exact-fit kernel).
"""

import numpy as np
import pytest

import oracle
from multithreading_string_matching_tpu import Matcher

CASES = [
    # (seed, num_payloads, max_len, alphabet, patterns)
    (0, 17, 40, 4, [b"ab", b"aba", b"b", b"abab", b"ab", b"\x00a", b"ba"]),
    (1, 9, 200, 3, [b"aa", b"aaa", b"aaaa", b"a"]),          # heavy overlap
    (2, 33, 64, 256, [b"\x00", b"\xff\xfe", b"ab\x00cd"]),    # binary + NUL
    (3, 5, 13, 2, [b"abcdefghijkl", b"ab", b"ba", b"ab"]),    # pattern ~= payload len
    (4, 64, 128, 5, [bytes([a, b]) for a in range(3) for b in range(3)]),
    # 60-byte pattern -> K=15 packed words (the reference caps patterns at
    # 99 bytes via its fscanf buffer; long patterns must still be exact)
    (5, 12, 256, 7, [bytes(range(1, 61)), b"\x01\x02", bytes(range(1, 61))]),
]


@pytest.mark.parametrize("seed,n,lmax,alpha,pats", CASES)
def test_engines_match_oracle(seed, n, lmax, alpha, pats):
    rng = np.random.default_rng(seed)
    payloads = rng.integers(0, alpha, size=(n, lmax)).astype(np.uint8)
    lengths = rng.integers(0, lmax + 1, size=n).astype(np.int32)
    lengths[0] = 0          # always include an empty row
    lengths[-1] = lmax      # and a full-width row
    if len(pats[0]) <= lmax:  # plant a guaranteed hit of the first pattern
        payloads[-1, : len(pats[0])] = np.frombuffer(pats[0], np.uint8)
    texts = [payloads[i, : lengths[i]].tobytes() for i in range(n)]
    want = np.array(oracle.oracle_counts(texts, pats))

    m = Matcher(pats)
    for engine in ("window", "ac", "kmp"):
        got = m.count(payloads, lengths, engine=engine)
        assert (got == want).all(), engine
        got_pp = m.count(payloads, lengths, engine=engine, per_packet=True)
        assert (got_pp.sum(axis=0) == want).all(), f"{engine} per-packet"

    # Pallas (interpret mode on CPU) via the staged-tile path; prepare()
    # sanitizes padding, so feed it deliberately dirty buffers.
    dirty = payloads.copy()
    cols = np.arange(lmax)[None, :]
    dirty[cols >= lengths[:, None]] = 0xEE
    import os

    os.environ["MSM_PALLAS_INTERPRET"] = "1"
    try:
        got = m.count(dirty, lengths, engine="pallas")
    finally:
        del os.environ["MSM_PALLAS_INTERPRET"]
    assert (got == want).all(), "pallas"
