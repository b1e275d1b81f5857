"""Pallas window kernel (interpret mode on the CPU test mesh) vs oracle."""

import numpy as np
import pytest

from oracle import count_overlapping
from multithreading_string_matching_tpu.ops.window import WindowProgram
from multithreading_string_matching_tpu.ops.pallas_window import PallasWindowMatcher

PATS = [b"ab", b"aba", b"b", b"abab", b"ca", b"ab", b"abcdefgh", b"abcde"]


@pytest.fixture(scope="module")
def pwm():
    return PallasWindowMatcher(WindowProgram.build(PATS), row_tile=8, interpret=True)


def _oracle_totals(payloads, lengths, pats):
    texts = [payloads[i, : lengths[i]].tobytes() for i in range(len(lengths))]
    return np.array([sum(count_overlapping(t, p) for t in texts) for p in pats])


def test_matches_oracle(pwm):
    rng = np.random.default_rng(11)
    payloads = rng.integers(0, 3, size=(16, 128)).astype(np.uint8)
    lengths = rng.integers(0, 129, size=16).astype(np.int32)
    got = np.asarray(pwm.count_tiles([(payloads, lengths)]))
    assert (got == _oracle_totals(payloads, lengths, PATS)).all()


def test_multi_tile_and_padding(pwm):
    rng = np.random.default_rng(12)
    t1 = (rng.integers(0, 3, size=(16, 128)).astype(np.uint8),
          rng.integers(0, 129, size=16).astype(np.int32))
    # Ragged tile: 5 rows, 100 bytes — kernel pads internally.
    t2 = (rng.integers(0, 3, size=(5, 100)).astype(np.uint8),
          rng.integers(0, 101, size=5).astype(np.int32))
    got = np.asarray(pwm.count_tiles([t1, t2]))
    want = _oracle_totals(*t1, PATS) + _oracle_totals(*t2, PATS)
    assert (got == want).all()


def test_repeated_chain(pwm):
    rng = np.random.default_rng(13)
    payloads = rng.integers(0, 3, size=(8, 128)).astype(np.uint8)
    lengths = np.full(8, 128, np.int32)
    one = np.asarray(pwm.count_tiles([(payloads, lengths)], expand_duplicates=False))
    rep = np.asarray(pwm.count_tiles_repeated([(payloads, lengths)], 3))
    assert (rep == one * 3).all()


def test_matcher_pallas_engine(reference_dir):
    from multithreading_string_matching_tpu import (
        Matcher,
        extract_payloads,
        load_patterns,
        read_pcap,
    )

    m = Matcher(load_patterns(reference_dir / "strings.txt"))  # default: pallas
    batch = extract_payloads(read_pcap(reference_dir / "udp.pcap"), "udp")
    c = m.count_batch(batch)
    assert int(c.sum()) == 39
    assert (c == m.count_batch(batch, engine="window")).all()
