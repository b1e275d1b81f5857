"""Native C++ ingest path must be bit-identical to the numpy spec path."""

import numpy as np
import pytest

from multithreading_string_matching_tpu.io import native
from multithreading_string_matching_tpu.io.pcap import read_pcap
from multithreading_string_matching_tpu.io.decode import decode_headers, extract_payloads

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native fast path"
)

FIXTURES = [
    ("udp.pcap", "udp"),
    ("tcp.pcap", "tcp"),
    ("udp_1000.pcap", "udp"),
    ("big_udp.pcap", "udp"),
    ("very_big_udp.pcap", "udp"),
    ("udp.pcap", "tcp"),  # cross-mode: exercises the no-protocol-check quirk
]


@pytest.mark.parametrize("name,mode", FIXTURES)
def test_native_equals_numpy(reference_dir, name, mode):
    py = read_pcap(reference_dir / name, use_native=False)
    nat = read_pcap(reference_dir / name, use_native=True)
    for f in ("offsets", "caplens", "origlens", "ts_sec", "ts_frac"):
        assert (getattr(py, f) == getattr(nat, f)).all(), f

    for strict in (False, True):
        v1, o1, l1 = decode_headers(py, mode, strict=strict, use_native=False)
        v2, o2, l2 = decode_headers(nat, mode, strict=strict, use_native=True)
        assert (v1 == v2).all()
        # geometry is only defined for valid packets
        assert (o1[v1] == o2[v2]).all() and (l1[v1] == l2[v2]).all()

    b1 = extract_payloads(py, mode)
    b2 = extract_payloads(nat, mode)
    assert b1.payloads.shape == b2.payloads.shape
    assert (b1.payloads == b2.payloads).all()
    assert (b1.lengths == b2.lengths).all()


def test_native_truncated_record(tmp_path):
    import struct

    raw = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    raw += struct.pack("<IIII", 0, 0, 10, 10) + b"x" * 6  # record cut short
    f = tmp_path / "t.pcap"
    f.write_bytes(raw)
    with pytest.raises(ValueError):
        read_pcap(f, use_native=True)
    pc = read_pcap(f, strict=False, use_native=True)
    assert pc.num_packets == 0
