"""Match-offset extraction vs a naive position oracle."""

import numpy as np
import pytest

from multithreading_string_matching_tpu.ops.window import WindowProgram, find_matches

PATS = [b"ab", b"aba", b"b", b"ca", b"ab"]


def naive_positions(payloads, lengths, uniq):
    rows = []
    for n in range(payloads.shape[0]):
        text = payloads[n, : lengths[n]].tobytes()
        for u, p in enumerate(uniq):
            start = 0
            while True:
                i = text.find(p, start)
                if i < 0:
                    break
                rows.append((n, i, u))
                start = i + 1
    rows.sort()
    return np.array(rows, dtype=np.int64).reshape(-1, 3)


def test_offsets_match_naive():
    rng = np.random.default_rng(31)
    wp = WindowProgram.build(PATS)
    payloads = rng.integers(0, 3, size=(10, 40)).astype(np.uint8)
    lengths = rng.integers(0, 41, size=10).astype(np.int32)
    got = find_matches(wp, payloads, lengths)
    want = naive_positions(payloads, lengths, wp.unique_patterns)
    assert got.shape == want.shape
    assert (got == want).all()


def test_offsets_agree_with_counts(reference_dir):
    from multithreading_string_matching_tpu import (
        Matcher, extract_payloads, load_patterns, read_pcap,
    )

    m = Matcher(load_patterns(reference_dir / "strings.txt"))
    batch = extract_payloads(read_pcap(reference_dir / "udp.pcap"), "udp")
    rows = m.find_matches(batch.payloads, batch.lengths)
    counts_u = np.bincount(rows[:, 2], minlength=len(m.window.unique_patterns))
    want = m.count_batch(batch)
    assert (counts_u[m.window.dup_map] == want).all()
    # spot check: every row really is a match
    for n, i, u in rows[:50]:
        p = m.window.unique_patterns[u]
        assert batch.payloads[n, i : i + len(p)].tobytes() == p
