"""Real live capture over loopback: LiveSource (AF_PACKET) end-to-end.

The reference's live program needs an interface and real traffic
(live_openmp_task.c); here we send crafted UDP datagrams to 127.0.0.1 while
capturing on ``lo``, and the full pipeline (raw socket -> batch -> decode ->
match) must count the planted patterns.  Skips when the environment forbids
raw sockets (non-root / seccomp).
"""

import socket
import threading
import time

import numpy as np
import pytest

from multithreading_string_matching_tpu import Matcher
from multithreading_string_matching_tpu.io.live import LiveSource
from multithreading_string_matching_tpu.parallel.stream import StreamMatcher


def _can_raw_socket() -> bool:
    try:
        s = socket.socket(socket.AF_PACKET, socket.SOCK_RAW, socket.htons(0x0003))
        s.close()
        return True
    except (PermissionError, OSError, AttributeError):
        return False


@pytest.mark.skipif(not _can_raw_socket(), reason="AF_PACKET raw sockets unavailable")
def test_live_loopback_counts():
    pats = [b"needle", b"hay"]
    matcher = Matcher(pats)
    stream = StreamMatcher(matcher, batch_size=4)
    source = LiveSource("lo", batch_size=4, timeout_s=0.2)

    NSEND = 12
    sent = threading.Event()

    def sender():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        time.sleep(0.3)  # let the capture socket open first
        for i in range(NSEND):
            tx.sendto(b"xx needle yy hay needle zz", ("127.0.0.1", 19999))
            time.sleep(0.01)
        tx.close()
        sent.set()

    t = threading.Thread(target=sender, daemon=True)
    t.start()
    deadline = time.time() + 15
    needle_idx = 0
    for batch in source:
        stream.feed_pcap_slice(batch, "udp")
        counts = stream.counts()
        # Each sent datagram carries 2x "needle"; loopback may deliver each
        # frame twice (tx+rx on lo), so require >= and bail once we have
        # evidence the full pipeline decoded and matched real traffic.
        if sent.is_set() and counts[needle_idx] >= 2 * NSEND:
            source.stop()
        if time.time() > deadline:
            source.stop()

    counts = stream.counts()
    assert counts[0] >= 2 * NSEND, counts  # "needle" per datagram x sends
    assert counts[1] >= NSEND, counts      # "hay"
    assert stream.packets_seen > 0
