"""FlowStreamMatcher checkpoint/resume + eviction policy (round 5,
VERDICT item 5): a killed flow monitor resumes to counts identical to the
uninterrupted run, and built-in eviction bounds state growth."""

import numpy as np
import pytest

from multithreading_string_matching_tpu import Matcher
from multithreading_string_matching_tpu.io.pcap import read_pcap, slice_pcap
from multithreading_string_matching_tpu.io.synth import synth_tcp_flows_pcap
from multithreading_string_matching_tpu.parallel.flow_stream import (
    FlowStreamMatcher,
)

KEY_A = ("10.0.0.1", "10.0.0.2", 1111, 80)
KEY_B = ("10.0.0.3", "10.0.0.2", 2222, 80)
PATS = [b"SIGNATURE", b"SIG", b"xx"]


def _mk_capture(tmp_path, **knobs):
    path = tmp_path / "c.pcap"
    synth_tcp_flows_pcap(
        path,
        [(KEY_A, b"xxSIGNATUREyy" * 3, [4] * 10),
         (KEY_B, b"zzSIGpp" * 2, [3, 4, 3, 4])],
        interleave_seed=5, **knobs,
    )
    return path


@pytest.mark.parametrize("engine", ["ac", "window"])
@pytest.mark.parametrize("reorder", [False, True])
def test_kill_resume_identical(tmp_path, engine, reorder):
    """Save mid-stream (with pending bytes and carried state), resume on a
    FRESH instance, finish: counts equal the uninterrupted run — across
    feed, round, AND checkpoint boundaries."""
    knobs = dict(reorder_seed=3, retransmit_rate=0.4) if reorder else {}
    path = _mk_capture(tmp_path, **knobs)
    pcap = read_pcap(path)
    mk = lambda: FlowStreamMatcher(
        Matcher(PATS, engine="ac"), "tcp", engine=engine,
        scan_bytes=9, width=8, min_lanes=8, reorder=reorder,
    )
    want = mk()
    for s in range(0, pcap.num_packets, 3):
        want.feed_pcap_slice(slice_pcap(pcap, s, s + 3, copy=False))
    want.flush()

    first = mk()
    half = pcap.num_packets // 2
    for s in range(0, half, 3):
        first.feed_pcap_slice(slice_pcap(pcap, s, min(s + 3, half), copy=False))
    ckpt = first.save(tmp_path / "ckpt")
    resumed = mk()
    resumed.load(ckpt)
    for s in range(half, pcap.num_packets, 3):
        resumed.feed_pcap_slice(slice_pcap(pcap, s, s + 3, copy=False))
    resumed.flush()
    assert resumed.counts().tolist() == want.counts().tolist()
    assert resumed.packets_seen == want.packets_seen
    assert resumed.bytes_seen == want.bytes_seen


def test_load_replaces_state(tmp_path):
    """load() is full rollback: resuming onto a USED instance must not
    double-count its prior activity."""
    path = _mk_capture(tmp_path)
    pcap = read_pcap(path)
    fs = FlowStreamMatcher(Matcher(PATS, engine="ac"), "tcp",
                           scan_bytes=9, width=8, min_lanes=8)
    fs.feed_pcap_slice(pcap)
    fs.flush()
    clean = fs.counts().copy()
    ckpt = fs.save(tmp_path / "full")
    # Pollute, then roll back.
    fs.feed_pcap_slice(pcap)
    fs.flush()
    assert fs.counts().sum() > clean.sum()
    fs.load(ckpt)
    assert fs.counts().tolist() == clean.tolist()
    # And continuing after rollback works.
    fs.feed_pcap_slice(pcap)
    fs.flush()
    assert fs.counts().tolist() == (2 * clean).tolist()


def test_checkpoint_config_mismatch_raises(tmp_path):
    path = _mk_capture(tmp_path)
    fs = FlowStreamMatcher(Matcher(PATS), "tcp", scan_bytes=9, min_lanes=8)
    fs.feed_pcap_slice(read_pcap(path))
    ckpt = fs.save(tmp_path / "k")
    with pytest.raises(ValueError, match="pattern"):
        FlowStreamMatcher(Matcher([b"other"]), "tcp").load(ckpt)
    with pytest.raises(ValueError, match="engine/mode"):
        FlowStreamMatcher(Matcher(PATS), "tcp", engine="window").load(ckpt)
    with pytest.raises(ValueError, match="reorder"):
        FlowStreamMatcher(Matcher(PATS), "tcp", reorder=True).load(ckpt)


def test_idle_eviction_bounds_state(tmp_path):
    """Churning flows: idle_rounds eviction keeps tracked state bounded."""
    m = Matcher(PATS, engine="ac")
    fs = FlowStreamMatcher(
        m, "tcp", scan_bytes=1, width=8, min_lanes=8, idle_rounds=2,
    )
    for burst in range(30):
        path = tmp_path / f"b{burst}.pcap"
        key = ("10.9.0.%d" % (burst % 250), "10.0.0.2", 30000 + burst, 80)
        synth_tcp_flows_pcap(path, [(key, b"xxSIGzz", [7])])
        fs.feed_pcap_slice(read_pcap(path))
        fs.flush()
        assert len(fs._states) <= 3  # idle flows dropped after 2 rounds
    assert fs.flows_evicted >= 27
    assert fs.counts()[1] == 30  # every SIG still counted before eviction


def test_max_flows_cap(tmp_path):
    m = Matcher(PATS, engine="ac")
    fs = FlowStreamMatcher(
        m, "tcp", scan_bytes=1, width=8, min_lanes=8, max_flows=4,
    )
    for i in range(12):
        path = tmp_path / f"f{i}.pcap"
        key = ("10.8.0.%d" % i, "10.0.0.2", 20000 + i, 80)
        synth_tcp_flows_pcap(path, [(key, b"ppSIGqq", [7])])
        fs.feed_pcap_slice(read_pcap(path))
        fs.flush()
        assert len(fs._states) <= 4
    assert fs.counts()[1] == 12
    with pytest.raises(ValueError, match="max_flows"):
        FlowStreamMatcher(m, "tcp", max_flows=0)


def test_fin_evict_drops_after_scan(tmp_path):
    """A FIN-carrying segment closes its flow AFTER its bytes are scanned;
    the half-signature state is forgotten, so a post-FIN continuation does
    not complete it (state was dropped, by policy)."""
    from multithreading_string_matching_tpu.io.synth import _eth_ipv4_tcp
    from multithreading_string_matching_tpu.io.pcap import (
        classic_global_header,
    )
    import struct

    def write(path, frames):
        with open(path, "wb") as f:
            f.write(classic_global_header())
            for i, pkt in enumerate(frames):
                f.write(struct.pack("<IIII", i, 0, len(pkt), len(pkt)))
                f.write(pkt)

    def with_flags(pkt, flags):
        b = bytearray(pkt)
        b[14 + 20 + 13] = flags
        return bytes(b)

    p1, p2 = tmp_path / "f1.pcap", tmp_path / "f2.pcap"
    write(p1, [with_flags(_eth_ipv4_tcp(b"xxSIGNA", KEY_A, 1000), 0x11)])
    write(p2, [_eth_ipv4_tcp(b"TURE", KEY_A, 1007)])
    m = Matcher(PATS, engine="ac")
    fs = FlowStreamMatcher(m, "tcp", scan_bytes=1, width=8, min_lanes=8,
                           fin_evict=True)
    fs.feed_pcap_slice(read_pcap(p1))
    fs.flush()
    assert len(fs._states) == 0 and fs.flows_evicted == 1
    assert fs.counts()[2] == 1  # "xx" in the pre-FIN bytes WAS counted
    fs.feed_pcap_slice(read_pcap(p2))
    fs.flush()
    assert fs.counts()[0] == 0  # join forgotten by policy
    # Without fin_evict the same sequence completes the signature.
    fs2 = FlowStreamMatcher(m, "tcp", scan_bytes=1, width=8, min_lanes=8)
    fs2.feed_pcap_slice(read_pcap(p1))
    fs2.flush()
    fs2.feed_pcap_slice(read_pcap(p2))
    fs2.flush()
    assert fs2.counts()[0] == 1


def test_checkpoint_window_tails_survive(tmp_path):
    """Window-engine tails (carried halo bytes) round-trip through the
    checkpoint: a signature split across the checkpoint boundary counts."""
    p1, p2 = tmp_path / "w1.pcap", tmp_path / "w2.pcap"
    synth_tcp_flows_pcap(p1, [(KEY_A, b"ppSIGNA", [7])])
    synth_tcp_flows_pcap(p2, [(KEY_A, b"TUREqq", [6])])
    m = Matcher(PATS, engine="window")
    fs = FlowStreamMatcher(m, "tcp", engine="window", scan_bytes=1,
                           width=8, min_lanes=8)
    fs.feed_pcap_slice(read_pcap(p1))
    fs.flush()
    ckpt = fs.save(tmp_path / "wc")
    fs2 = FlowStreamMatcher(m, "tcp", engine="window", scan_bytes=1,
                            width=8, min_lanes=8)
    fs2.load(ckpt)
    fs2.feed_pcap_slice(read_pcap(p2))
    fs2.flush()
    assert fs2.counts()[0] == 1
