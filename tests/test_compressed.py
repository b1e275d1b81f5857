"""Compressed-capture ingest (io/pcap.py open_capture).

Capture archives are routinely stored compressed (tcpdump -z gzips rotated
files; libpcap built with zlib reads .pcap.gz itself).  The reference, built
on plain libpcap, would also accept gzip captures on zlib builds — so the
framework accepts gzip plus the other two stdlib codecs (bzip2, xz), detected
by content magic, never extension.  Pins: one-shot == streamed == plain on
every codec, through both the classic and pcapng containers, and through the
streamed counting pipeline.
"""

import bz2
import gzip
import lzma

import numpy as np
import pytest

from multithreading_string_matching_tpu.io import open_capture, read_pcap, iter_pcap, concat_pcaps
from multithreading_string_matching_tpu.api import Matcher, load_patterns
from multithreading_string_matching_tpu.parallel.pipeline import count_pcap_streamed

CODECS = {
    "gzip": gzip.compress,
    "bz2": bz2.compress,
    "xz": lzma.compress,
}


def _same_capture(a, b):
    # One-shot parses keep the whole file as buf (offsets point into it);
    # streamed batches keep only captured bytes — compare per-packet views.
    assert a.num_packets == b.num_packets
    assert a.linktype == b.linktype and a.nanos == b.nanos
    np.testing.assert_array_equal(a.caplens, b.caplens)
    np.testing.assert_array_equal(a.origlens, b.origlens)
    np.testing.assert_array_equal(a.ts_sec, b.ts_sec)
    np.testing.assert_array_equal(a.ts_frac, b.ts_frac)
    for i in range(a.num_packets):
        np.testing.assert_array_equal(a.packet(i), b.packet(i))


@pytest.mark.parametrize("codec", sorted(CODECS))
def test_read_pcap_compressed_equals_plain(codec, reference_dir, tmp_path):
    raw = (reference_dir / "udp.pcap").read_bytes()
    # Deliberately misleading extension: detection must be by magic.
    path = tmp_path / "capture.pcap"
    path.write_bytes(CODECS[codec](raw))
    _same_capture(read_pcap(path), read_pcap(reference_dir / "udp.pcap"))


@pytest.mark.parametrize("codec", sorted(CODECS))
def test_iter_pcap_streams_compressed(codec, reference_dir, tmp_path):
    raw = (reference_dir / "udp_1000.pcap").read_bytes()
    path = tmp_path / f"cap.{codec}"
    path.write_bytes(CODECS[codec](raw))
    # Small read_size forces many decompressor refills mid-record.
    batches = list(iter_pcap(path, batch_packets=64, read_size=4096))
    assert len(batches) > 1
    _same_capture(concat_pcaps(batches), read_pcap(reference_dir / "udp_1000.pcap"))


def test_open_capture_plain_passthrough(reference_dir):
    with open_capture(reference_dir / "udp.pcap") as f:
        head = f.read(4)
    assert head == (reference_dir / "udp.pcap").read_bytes()[:4]


def test_pcapng_gzip(tmp_path, reference_dir):
    # pcapng container under gzip: both readers agree with the plain parse.
    from tests.test_pcapng import _pcapng_from

    plain = tmp_path / "s.pcapng"
    plain.write_bytes(_pcapng_from(read_pcap(reference_dir / "udp.pcap")))
    gz = tmp_path / "s.pcapng.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    _same_capture(read_pcap(gz), read_pcap(plain))
    batches = list(iter_pcap(gz, batch_packets=7, read_size=512))
    _same_capture(concat_pcaps(batches), read_pcap(plain))


def test_iter_pcap_from_pipe(reference_dir):
    # The privilege-separated live shape: tcpdump -w - | match --pcap -.
    # A real OS pipe (non-seekable) standing in for the capture process.
    import subprocess

    proc = subprocess.Popen(
        ["cat", str(reference_dir / "udp_1000.pcap")], stdout=subprocess.PIPE
    )
    try:
        batches = list(iter_pcap(proc.stdout, batch_packets=100))
    finally:
        proc.wait(timeout=30)
    _same_capture(concat_pcaps(batches), read_pcap(reference_dir / "udp_1000.pcap"))


def test_read_pcap_from_gzip_pipe(reference_dir, tmp_path):
    # Compression magic sniffed on a non-seekable stream.
    import subprocess

    gz = tmp_path / "c.gz"
    gz.write_bytes(gzip.compress((reference_dir / "udp.pcap").read_bytes()))
    proc = subprocess.Popen(["cat", str(gz)], stdout=subprocess.PIPE)
    try:
        got = read_pcap(proc.stdout)
    finally:
        proc.wait(timeout=30)
    _same_capture(got, read_pcap(reference_dir / "udp.pcap"))


def test_cli_match_stdin(reference_dir, tmp_path, monkeypatch, capsys):
    # match --pcap - reads the capture from stdin.
    import io as _io

    from multithreading_string_matching_tpu.cli import main

    raw = (reference_dir / "udp.pcap").read_bytes()
    monkeypatch.setattr(
        "sys.stdin", type("S", (), {"buffer": _io.BytesIO(raw)})()
    )
    code = main([
        "match", "--pcap", "-",
        "--patterns", str(reference_dir / "strings.txt"),
        "--stream", "--engine", "window",
    ])
    out = capsys.readouterr().out
    assert code == 0
    assert "rpc: 7 times!" in out


def test_open_capture_does_not_close_caller_stream(reference_dir):
    import io as _io

    stream = _io.BytesIO((reference_dir / "udp.pcap").read_bytes())
    with open_capture(stream) as f:
        f.read(24)
    assert not stream.closed  # caller owns it
    # ... but paths we opened ourselves are closed by the context manager.
    with open_capture(reference_dir / "udp.pcap") as f:
        f.read(24)


@pytest.mark.parametrize("codec", sorted(CODECS))
def test_truncated_compressed_strict_raises(codec, reference_dir, tmp_path):
    blob = CODECS[codec]((reference_dir / "udp_1000.pcap").read_bytes())
    path = tmp_path / "t.bin"
    path.write_bytes(blob[: len(blob) - 17])
    with pytest.raises(ValueError, match="compressed"):
        read_pcap(path)  # strict default
    with pytest.raises(ValueError, match="compressed"):
        list(iter_pcap(path, batch_packets=64))


# bz2 is absent: it decodes in ~900 KB blocks, so a truncated single-block
# archive has NO recoverable prefix (codec-inherent) — tolerant mode then
# sees an empty stream and raises the missing-global-header ValueError.
@pytest.mark.parametrize("codec", ["gzip", "xz"])
def test_truncated_compressed_tolerant_keeps_prefix(codec, reference_dir, tmp_path):
    raw = (reference_dir / "udp_1000.pcap").read_bytes()
    blob = CODECS[codec](raw)
    path = tmp_path / "t.bin"
    path.write_bytes(blob[: len(blob) - 17])
    full = read_pcap(reference_dir / "udp_1000.pcap")
    part = read_pcap(path, strict=False)
    assert 0 < part.num_packets <= full.num_packets
    np.testing.assert_array_equal(part.caplens, full.caplens[: part.num_packets])
    streamed = list(iter_pcap(path, batch_packets=64, strict=False, read_size=4096))
    got = concat_pcaps(streamed)
    assert got.num_packets == part.num_packets


def test_streamed_counts_on_gzip(reference_dir, tmp_path):
    patterns = load_patterns(reference_dir / "strings.txt")
    gz = tmp_path / "udp_1000.pcap.gz"
    gz.write_bytes(gzip.compress((reference_dir / "udp_1000.pcap").read_bytes()))
    m = Matcher(patterns, engine="window")
    got = count_pcap_streamed(m, gz, batch_packets=128)
    want = m.count_pcap(reference_dir / "udp_1000.pcap")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
