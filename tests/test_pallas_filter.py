"""Filter/verify table kernel (interpret mode on the CPU mesh) vs oracle.

The filtered variant shares the table kernel's algebra; what these tests
pin is the parts the filter adds: the rarest-full-word selection, the
no-false-negatives guarantee (a filter word always appears inside any true
match), filter-word false POSITIVES (word present, pattern absent — must
verify to zero, not count), padded-slot sentinels, and shared-prefix sets
where word 0 would fire everywhere.
"""

import numpy as np
import pytest

from oracle import count_overlapping
from multithreading_string_matching_tpu.ops.window import WindowProgram
from multithreading_string_matching_tpu.ops.pallas_table import (
    PallasTableMatcher,
    _filter_words,
)

PATS = [b"ab", b"aba", b"b", b"abab", b"ca", b"ab", b"abcdefgh", b"abcde",
        b"bbbbabcdea", b"a", b"caca"]


def _oracle_totals(payloads, lengths, pats):
    texts = [payloads[i, : lengths[i]].tobytes() for i in range(len(lengths))]
    return np.array([sum(count_overlapping(t, p) for t in texts) for p in pats])


def _filtered(pats, **kw):
    kw.setdefault("row_tile", 8)
    kw.setdefault("pattern_block", 4)
    return PallasTableMatcher(
        WindowProgram.build(pats), interpret=True, filtered=True, **kw
    )


def test_matches_oracle_mixed_set():
    ptm = _filtered(PATS)
    rng = np.random.default_rng(31)
    payloads = rng.integers(97, 100, size=(16, 128)).astype(np.uint8)
    lengths = rng.integers(0, 129, size=16).astype(np.int32)
    got = np.asarray(ptm.count_tiles([(payloads, lengths)]))
    assert (got == _oracle_totals(payloads, lengths, PATS)).all()
    assert got.sum() > 0  # the alphabet guarantees real matches


def test_agrees_with_unfiltered_and_rows_repeat():
    wp = WindowProgram.build(PATS)
    plain = PallasTableMatcher(wp, row_tile=8, interpret=True, pattern_block=4)
    filt = PallasTableMatcher(wp, row_tile=8, interpret=True, pattern_block=4,
                              filtered=True)
    rng = np.random.default_rng(32)
    payloads = rng.integers(97, 100, size=(11, 128)).astype(np.uint8)
    lengths = rng.integers(0, 129, size=11).astype(np.int32)
    tiles = [(payloads, lengths)]
    assert (np.asarray(plain.count_tiles(tiles))
            == np.asarray(filt.count_tiles(tiles))).all()
    (ra,), (rb,) = (plain.count_tiles_per_row(tiles),
                    filt.count_tiles_per_row(tiles))
    assert (np.asarray(ra) == np.asarray(rb)).all()
    rep = np.asarray(filt.count_tiles_repeated(tiles, 3))
    one = np.asarray(filt.count_tiles(tiles, expand_duplicates=False))
    assert (rep == one * 3).all()


def test_filter_word_prefers_rarest_full_word():
    """A shared 4-byte prefix ("pt00...") must NOT be the filter word when a
    rarer full word exists — ties break to the LAST word, so the digit
    suffix discriminates (the crossover bench's pattern shape)."""
    pats = [b"pt00%04d" % i for i in range(8)]
    fw, fm = _filter_words(WindowProgram.build(pats))
    assert (fm == 0xFFFFFFFF).all()
    assert len(set(fw.tolist())) == 8  # all distinct (the suffix words)
    shared = int(np.frombuffer(b"pt00", np.uint32)[0])
    assert shared not in fw.tolist()


def test_filter_word_false_positive_verifies_to_zero():
    """Payload contains a pattern's filter word but not the pattern: the
    gated verify must run and count ZERO (a pure-filter kernel would
    overcount)."""
    pats = [b"abcdwxyz"]  # filter word = "wxyz" (both words freq 1, last wins)
    fw, _ = _filter_words(WindowProgram.build(pats))
    assert fw[0] == np.frombuffer(b"wxyz", np.uint32)[0]
    ptm = _filtered(pats)
    pay = np.zeros((8, 64), np.uint8)
    pay[0, 10:14] = np.frombuffer(b"wxyz", np.uint8)  # filter fires
    pay[1, 3:11] = np.frombuffer(b"abcdwxyz", np.uint8)  # real match
    lens = np.full(8, 64, np.int32)
    lens[2:] = 0
    got = np.asarray(ptm.count_tiles([(pay, lens)]))
    assert got.tolist() == [1]


def test_short_patterns_masked_filter():
    """K=1 patterns (< 4 bytes) filter on their masked word 0 — exactness
    must hold including the fit mask at row ends."""
    pats = [b"x", b"yz", b"abc"]
    ptm = _filtered(pats)
    rng = np.random.default_rng(33)
    payloads = rng.integers(97, 124, size=(9, 96)).astype(np.uint8)
    lengths = rng.integers(0, 97, size=9).astype(np.int32)
    got = np.asarray(ptm.count_tiles([(payloads, lengths)]))
    assert (got == _oracle_totals(payloads, lengths, pats)).all()


def test_nul_pattern_fit_and_filter():
    pats = [b"\x00\x00", b"ab"]
    ptm = PallasTableMatcher(
        WindowProgram.build(pats), row_tile=8, interpret=True,
        assume_zero_padded=True, filtered=True,
    )
    assert ptm.use_fit
    payloads = np.zeros((8, 128), np.uint8)
    payloads[0, :4] = (0, 0, ord("a"), ord("b"))
    lengths = np.zeros(8, np.int32)
    lengths[0] = 4
    got = np.asarray(ptm.count_tiles([(payloads, lengths)]))
    assert got.tolist() == [1, 1]


def test_match_at_row_edge_not_missed():
    """The filter tests w[0] at the filter word's ABSOLUTE position, which
    sits at the end of the matched span — a match flush against the row end
    must still fire the filter (no false negatives at edges)."""
    pats = [b"abcdefgh"]
    ptm = _filtered(pats, row_tile=8)
    pay = np.zeros((8, 64), np.uint8)
    pay[0, 56:64] = np.frombuffer(b"abcdefgh", np.uint8)  # flush to edge
    lens = np.full(8, 64, np.int32)
    got = np.asarray(ptm.count_tiles([(pay, lens)]))
    assert got.tolist() == [1]


def test_random_differential_vs_window_engine():
    """200 random patterns over matching-rich payloads: filtered kernel ==
    unrolled kernel == plain table kernel (the three-way cross-check the
    suite uses for every kernel)."""
    from multithreading_string_matching_tpu.ops.pallas_window import (
        PallasWindowMatcher,
    )

    rng = np.random.default_rng(34)
    pats = [
        bytes(rng.integers(1, 5, size=rng.integers(1, 13)).tolist())
        for _ in range(200)
    ]
    wp = WindowProgram.build(pats)
    filt = PallasTableMatcher(wp, row_tile=8, interpret=True,
                              pattern_block=64, filtered=True)
    pwm = PallasWindowMatcher(wp, row_tile=8, interpret=True)
    payloads = rng.integers(1, 5, size=(16, 128)).astype(np.uint8)
    lengths = rng.integers(0, 129, size=16).astype(np.int32)
    got = np.asarray(filt.count_tiles([(payloads, lengths)]))
    want = np.asarray(pwm.count_tiles([(payloads, lengths)]))
    assert (got == want).all()


def test_uniform_sets_flip_to_table_earlier(monkeypatch):
    """Single word-count-class sets switch to the (filtered) table kernel
    above 128 words — the regime where the round-4 crossover measured it
    beating the unrolled kernel; mixed sets keep the 512-word threshold."""
    monkeypatch.setenv("MSM_PALLAS_INTERPRET", "1")
    from multithreading_string_matching_tpu import Matcher

    uniform = Matcher([b"%08d" % i for i in range(100)])  # 200 words, 1 class
    assert type(uniform.pallas).__name__ == "PallasTableMatcher"
    assert uniform.explain()["pallas_kernel"] == "table+filter"
    # same word count, two classes -> stays unrolled below 512
    mixed = Matcher([b"%08d" % i for i in range(50)]
                    + [b"%012d" % i for i in range(34)])  # 202 words
    assert type(mixed.pallas).__name__ == "PallasWindowMatcher"
    small_uniform = Matcher([b"%08d" % i for i in range(64)])  # 128 words
    assert type(small_uniform.pallas).__name__ == "PallasWindowMatcher"


def test_matcher_defaults_filter_on(monkeypatch):
    """Table-kernel selection turns the filter on by default;
    MSM_PALLAS_FILTER=0 is the saturated-traffic escape hatch."""
    monkeypatch.setenv("MSM_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MSM_PALLAS_TABLE", "1")
    from multithreading_string_matching_tpu import Matcher

    m = Matcher([b"abcd", b"bcde"])
    assert m.pallas.filtered
    monkeypatch.setenv("MSM_PALLAS_FILTER", "0")
    m2 = Matcher([b"abcd", b"bcde"])
    assert not m2.pallas.filtered
    # counts agree either way (the staged path end to end)
    rng = np.random.default_rng(40)
    pay = rng.integers(97, 100, size=(24, 96)).astype(np.uint8)
    lens = rng.integers(0, 97, size=24).astype(np.int32)
    cols = np.arange(96)[None, :]
    pay = np.where(cols < lens[:, None], pay, 0).astype(np.uint8)
    assert (m.count(pay, lens) == m2.count(pay, lens)).all()


def test_summary_surface():
    ptm = _filtered(PATS)
    rng = np.random.default_rng(35)
    payloads = rng.integers(97, 100, size=(8, 128)).astype(np.uint8)
    lengths = rng.integers(0, 129, size=8).astype(np.int32)
    tot, hits = ptm.count_tile_summary(payloads, lengths)
    (rows,) = ptm.count_tiles_per_row([(payloads, lengths)],
                                      expand_duplicates=False)
    rows = np.asarray(rows)
    assert (np.asarray(tot) == rows.sum(axis=0)).all()
    assert (np.asarray(hits) == (rows.sum(axis=1) > 0)).all()
