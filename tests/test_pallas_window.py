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


def test_zero_row_tile_and_empty_repeats():
    """Regression (round-2 review): a 0-row tile used to ZeroDivisionError
    in _pad_tile, and count_tiles_repeated([]) used to crash in reduce();
    both kernel classes now return zeros."""
    from multithreading_string_matching_tpu.ops.pallas_table import (
        PallasTableMatcher,
    )

    wp = WindowProgram.build([b"ab", b"c", b"ab"])
    for cls in (PallasWindowMatcher, PallasTableMatcher):
        pm = cls(wp, interpret=True)
        z_pay = np.zeros((0, 128), np.uint8)
        z_len = np.zeros((0,), np.int32)
        out = np.asarray(pm.count_tiles([(z_pay, z_len)]))
        assert out.tolist() == [0, 0, 0], cls.__name__
        rep = np.asarray(pm.count_tiles_repeated([], 3))
        assert rep.tolist() == [0, 0], cls.__name__  # unique, no dup expand
        rows = np.asarray(pm.count_tiles_per_row([(z_pay, z_len)])[0])
        assert rows.shape[1] == 3 and not rows.any(), cls.__name__


def test_matcher_pallas_engine(reference_dir, monkeypatch):
    # MSM_PALLAS_INTERPRET keeps this on the ACTUAL pallas fixture path
    # (count_prepared's staged tiles + dup expansion) — without it the CPU
    # test mesh silently degrades pallas->window and the test compares the
    # window engine with itself.
    monkeypatch.setenv("MSM_PALLAS_INTERPRET", "1")
    from multithreading_string_matching_tpu import (
        Matcher,
        extract_payloads,
        load_patterns,
        read_pcap,
    )

    m = Matcher(load_patterns(reference_dir / "strings.txt"))  # default: pallas
    assert m._resolve_engine(None) == "pallas"
    batch = extract_payloads(read_pcap(reference_dir / "udp.pcap"), "udp")
    c = m.count_batch(batch)
    assert int(c.sum()) == 39
    assert (c == m.count_batch(batch, engine="window")).all()


def test_per_row_kernel_matches_window_per_packet(reference_dir):
    """The per-row Pallas kernel (per-packet attribution at kernel rate)
    must equal the XLA window engine's per-packet counts, including on
    bucketed multi-tile preps with padding rows and duplicate patterns."""
    import os

    os.environ["MSM_PALLAS_INTERPRET"] = "1"
    try:
        from multithreading_string_matching_tpu import (
            Matcher, extract_payloads, load_patterns, read_pcap,
        )

        m = Matcher(load_patterns(reference_dir / "strings.txt"))
        batch = extract_payloads(
            read_pcap(reference_dir / "udp.pcap"), "udp",
            pad_n_to=128, pad_len_to=8,
        )
        got = m.count(batch.payloads, batch.lengths, per_packet=True)
        want = m.count(
            batch.payloads, batch.lengths, per_packet=True, engine="window"
        )
        assert got.shape == want.shape
        assert (got == want).all()
        assert int(got.sum()) == 39
    finally:
        del os.environ["MSM_PALLAS_INTERPRET"]


def test_per_row_kernel_nul_pattern_fit_path(reference_dir):
    """NUL-containing patterns force the exact-fit kernel; per-row counts
    must stay correct (padding rows count zero)."""
    import os

    import numpy as np

    os.environ["MSM_PALLAS_INTERPRET"] = "1"
    try:
        from multithreading_string_matching_tpu import Matcher

        rng = np.random.default_rng(5)
        payloads = rng.integers(0, 256, (13, 96), dtype=np.uint8).astype(np.uint8)
        lengths = rng.integers(0, 97, 13).astype(np.int32)
        cols = np.arange(96)[None, :]
        payloads = np.where(cols < lengths[:, None], payloads, 0).astype(np.uint8)
        payloads[0, :2] = (0, 0)
        lengths[0] = max(lengths[0], 4)
        m = Matcher([b"\x00\x00", b"ab", b"ab"])
        got = m.count(payloads, lengths, per_packet=True)
        want = m.count(payloads, lengths, per_packet=True, engine="window")
        assert (got == want).all()
    finally:
        del os.environ["MSM_PALLAS_INTERPRET"]
