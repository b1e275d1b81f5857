"""write_pcap + `match --dump-matches`: re-emitting (matched) packets.

The reference never writes captures — results only leave as printf counts
(serial.c:163-169).  The writer must round-trip bit-exactly with the reader,
and the dump of matched packets must preserve every match (counts on the
dump equal counts on the full capture, because matches only live in matched
packets).
"""

import json

import numpy as np
import pytest

from multithreading_string_matching_tpu.api import Matcher
from multithreading_string_matching_tpu.cli import main
from multithreading_string_matching_tpu.io.decode import extract_payloads
from multithreading_string_matching_tpu.io.patterns import load_patterns
from multithreading_string_matching_tpu.io.pcap import (
    read_pcap,
    slice_pcap,
    write_pcap,
)


def _records(pf):
    return [
        (
            int(pf.ts_sec[i]), int(pf.ts_frac[i]), int(pf.origlens[i]),
            pf.packet(i).tobytes(),
        )
        for i in range(pf.num_packets)
    ]


def test_full_roundtrip_bit_exact(reference_dir, tmp_path):
    src = read_pcap(reference_dir / "udp.pcap")
    out = tmp_path / "copy.pcap"
    assert write_pcap(out, src) == src.num_packets
    dst = read_pcap(out)
    assert dst.linktype == src.linktype
    assert dst.snaplen == src.snaplen
    assert dst.nanos == src.nanos
    assert _records(dst) == _records(src)


def test_subset_selection_and_order(reference_dir, tmp_path):
    src = read_pcap(reference_dir / "udp_1000.pcap")
    idx = np.asarray([5, 2, 999, 2])  # arbitrary order, duplicates allowed
    out = tmp_path / "subset.pcap"
    assert write_pcap(out, src, idx) == 4
    dst = read_pcap(out)
    want = [_records(src)[i] for i in idx]
    assert _records(dst) == want


def test_empty_selection(reference_dir, tmp_path):
    src = read_pcap(reference_dir / "udp.pcap")
    out = tmp_path / "empty.pcap"
    assert write_pcap(out, src, np.zeros(0, dtype=np.int64)) == 0
    dst = read_pcap(out)
    assert dst.num_packets == 0
    assert dst.linktype == src.linktype


def test_index_out_of_range(reference_dir, tmp_path):
    src = read_pcap(reference_dir / "udp.pcap")
    with pytest.raises(ValueError, match="out of range"):
        write_pcap(tmp_path / "x.pcap", src, [src.num_packets])
    with pytest.raises(ValueError, match="out of range"):
        write_pcap(tmp_path / "x.pcap", src, [-1])


def test_pcapng_reemits_as_classic(reference_dir, tmp_path):
    # Build a pcapng from fixture packets using the test helper in
    # test_pcapng, then read->write->read must preserve the records.
    from tests.test_pcapng import _pcapng_from

    src = read_pcap(reference_dir / "udp.pcap")
    sub = slice_pcap(src, 0, 5)
    ng = tmp_path / "a.pcapng"
    ng.write_bytes(_pcapng_from(sub))
    parsed = read_pcap(ng)
    out = tmp_path / "b.pcap"
    write_pcap(out, parsed)
    again = read_pcap(out)
    assert _records(again) == _records(parsed)


def test_dump_matches_preserves_all_counts(reference_dir, tmp_path, capsys):
    out = tmp_path / "hits.pcap"
    code = main([
        "match", "--pcap", str(reference_dir / "udp.pcap"),
        "--patterns", str(reference_dir / "strings.txt"),
        "--mode", "udp", "--json", "--dump-matches", str(out),
    ])
    assert code == 0
    blob = json.loads(capsys.readouterr().out)
    assert blob["dump_path"] == str(out)

    pats = load_patterns(reference_dir / "strings.txt")
    m = Matcher(pats, engine="window")
    dump = read_pcap(out)
    assert dump.num_packets == blob["dumped_packets"] > 0
    sub_counts = m.count_batch(extract_payloads(dump, "udp"))
    assert sub_counts.tolist() == blob["counts"]

    # Every dumped packet really contains a match; none were dropped.
    full = read_pcap(reference_dir / "udp.pcap")
    per_row = m.count_batch(extract_payloads(full, "udp"), per_packet=True)
    batch = extract_payloads(full, "udp")
    n_valid = int(batch.valid.sum())
    assert int((per_row[:n_valid].sum(axis=1) > 0).sum()) == dump.num_packets


def test_dump_matches_incompatible_flags(reference_dir, tmp_path):
    with pytest.raises(SystemExit, match="dump-matches"):
        main([
            "match", "--pcap", str(reference_dir / "udp.pcap"),
            "--patterns", str(reference_dir / "strings.txt"),
            "--dump-matches", str(tmp_path / "x.pcap"), "--sharded",
        ])


def test_dump_matches_with_per_packet_json(reference_dir, tmp_path, capsys):
    out = tmp_path / "hits.pcap"
    code = main([
        "match", "--pcap", str(reference_dir / "udp.pcap"),
        "--patterns", str(reference_dir / "strings.txt"),
        "--mode", "udp", "--json", "--per-packet",
        "--dump-matches", str(out),
    ])
    assert code == 0
    blob = json.loads(capsys.readouterr().out)
    mat = np.asarray(blob["counts"])
    assert mat.ndim == 2
    assert blob["dumped_packets"] == int((mat.sum(axis=1) > 0).sum())


# -- streaming dump (bounded-memory matched-packet extraction) ------------

def test_pcap_writer_incremental(reference_dir, tmp_path):
    from multithreading_string_matching_tpu.io.pcap import PcapWriter

    src = read_pcap(reference_dir / "udp_1000.pcap")
    out = tmp_path / "inc.pcap"
    with PcapWriter(out) as w:
        w.write(slice_pcap(src, 0, 300))
        w.write(slice_pcap(src, 300, 700), np.arange(100))
        assert w.packets_written == 400
    dst = read_pcap(out)
    want = _records(slice_pcap(src, 0, 300)) + _records(
        slice_pcap(src, 300, 400)
    )
    assert _records(dst) == want


def test_pcap_writer_empty_stream(tmp_path):
    from multithreading_string_matching_tpu.io.pcap import PcapWriter

    out = tmp_path / "none.pcap"
    with PcapWriter(out):
        pass
    assert read_pcap(out).num_packets == 0


def test_pcap_writer_metadata_mismatch(reference_dir, tmp_path):
    from dataclasses import replace

    from multithreading_string_matching_tpu.io.pcap import PcapWriter

    src = read_pcap(reference_dir / "udp.pcap")
    with PcapWriter(tmp_path / "x.pcap") as w:
        w.write(src)
        with pytest.raises(ValueError, match="metadata"):
            w.write(replace(src, linktype=113))


def test_dump_matches_streamed_equals_oneshot(reference_dir, tmp_path):
    from multithreading_string_matching_tpu.parallel.pipeline import (
        dump_matches_streamed,
    )

    pats = load_patterns(reference_dir / "strings.txt")
    m = Matcher(pats, engine="window")
    out = tmp_path / "hits.pcap"
    stats = {}
    # Tiny chunks force many writer appends and many per-row scans.
    counts = dump_matches_streamed(
        m, reference_dir / "udp_1000.pcap", out, "udp",
        batch_packets=97, stats=stats,
    )
    full = read_pcap(reference_dir / "udp_1000.pcap")
    batch = extract_payloads(full, "udp")
    want = m.count_batch(batch)
    assert counts.tolist() == want.tolist()
    assert int(counts.sum()) == 1006  # BASELINE.md variant A

    dump = read_pcap(out)
    assert dump.num_packets == stats["dumped_packets"]
    # The dump reproduces the full capture's counts exactly.
    got = m.count_batch(extract_payloads(dump, "udp"))
    assert got.tolist() == want.tolist()
    # And it contains precisely the matching packets.
    per_row = m.count_batch(batch, per_packet=True)
    n_valid = int(batch.valid.sum())
    assert dump.num_packets == int((per_row[:n_valid].sum(axis=1) > 0).sum())


def test_cli_stream_dump_matches(reference_dir, tmp_path, capsys):
    out = tmp_path / "hits.pcap"
    code = main([
        "match", "--pcap", str(reference_dir / "udp.pcap"),
        "--patterns", str(reference_dir / "strings.txt"),
        "--mode", "udp", "--json", "--stream", "--dump-matches", str(out),
    ])
    assert code == 0
    blob = json.loads(capsys.readouterr().out)
    assert sum(blob["counts"]) == 39
    assert blob["dump_path"] == str(out)
    assert read_pcap(out).num_packets == blob["dumped_packets"] == 10


# -- live-mode dump (StreamMatcher dump_writer) ----------------------------

def test_stream_matcher_dump_writer(reference_dir, tmp_path):
    from multithreading_string_matching_tpu.io.live import FileReplaySource
    from multithreading_string_matching_tpu.io.pcap import PcapWriter
    from multithreading_string_matching_tpu.parallel.stream import StreamMatcher

    pats = load_patterns(reference_dir / "strings.txt")
    m = Matcher(pats, engine="window")
    out = tmp_path / "live_hits.pcap"
    with PcapWriter(out) as w:
        stream = StreamMatcher(m, dump_writer=w)
        for batch in FileReplaySource(str(reference_dir / "udp.pcap")):
            stream.feed_pcap_slice(batch, "udp", bpf_filter=True)
        counts = stream.counts()
    assert int(counts.sum()) == 39

    dump = read_pcap(out)
    got = m.count_batch(extract_payloads(dump, "udp"))
    assert got.tolist() == counts.tolist()
    assert dump.num_packets == 10  # matching packets of udp.pcap


def test_cli_live_dump_matches(reference_dir, tmp_path, capsys):
    out = tmp_path / "live_hits.pcap"
    code = main([
        "live", str(reference_dir / "udp.pcap"),
        str(reference_dir / "strings.txt"), "4", "udp",
        "--dump-matches", str(out),
    ])
    assert code == 0
    stdout = capsys.readouterr().out
    assert "http: 5 times!" in stdout
    assert read_pcap(out).num_packets == 10


def test_cli_live_dump_matches_missing_value(reference_dir, capsys):
    code = main([
        "live", str(reference_dir / "udp.pcap"),
        str(reference_dir / "strings.txt"), "--dump-matches",
    ])
    assert code == 1
    assert "USAGE" in capsys.readouterr().out
