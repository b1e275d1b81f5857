"""Batched producer/consumer pipeline (component C10, openmp_task.c analogue).

The reference's task program has one producer thread reading batches of 100
packets and extracting payloads inline, handing each batch to an OpenMP task
that matches it and atomically merges counts (openmp_task.c:126-186).

TPU-native shape: the host is the producer (pcap walk + vectorized extract),
the device is the consumer.  JAX dispatch is asynchronous, so enqueueing each
batch's jitted scan WITHOUT blocking gives producer/consumer overlap for
free — while the device scans batch k, the host extracts batch k+1 (the
double-buffering the reference builds manually with task queues).  Count
merging is a device-side add of the per-batch count vectors — associative
and exact, so batch order cannot change results (unlike the reference's
atomic-merge, which is order-dependent only in timing, not value).

To keep one compiled executable across batches, payload tensors are padded
to a fixed batch size and a fixed power-of-two byte length per pipeline.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from multithreading_string_matching_tpu.io.pcap import PcapFile, iter_pcap
from multithreading_string_matching_tpu.io.decode import extract_payloads
from multithreading_string_matching_tpu.ops.window import count_matches_window

DEFAULT_BATCH = 100  # openmp_task.c:113


def _slice_pcap(pcap: PcapFile, start: int, stop: int) -> PcapFile:
    return PcapFile(
        buf=pcap.buf,
        offsets=pcap.offsets[start:stop],
        caplens=pcap.caplens[start:stop],
        origlens=pcap.origlens[start:stop],
        ts_sec=pcap.ts_sec[start:stop],
        ts_frac=pcap.ts_frac[start:stop],
        linktype=pcap.linktype,
        snaplen=pcap.snaplen,
        nanos=pcap.nanos,
    )


def _next_pow2(x: int) -> int:
    return 1 << max(3, (x - 1).bit_length())


def iter_batches(
    pcap: PcapFile,
    mode: str,
    batch_size: int,
    *,
    strict: bool = False,
    fixed_len: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield fixed-shape (payloads[B, Lfix], lengths[B]) batches.

    ``fixed_len=None`` buckets each batch's byte axis to the next power of
    two (few distinct compiled shapes); pass e.g. the snaplen for exactly one.
    """
    for start in range(0, pcap.num_packets, batch_size):
        part = _slice_pcap(pcap, start, start + batch_size)
        batch = extract_payloads(
            part, mode, strict=strict, keep_invalid=True, pad_n_to=batch_size
        )
        payloads, lengths = batch.payloads, batch.lengths
        want = fixed_len or _next_pow2(payloads.shape[1])
        if payloads.shape[1] < want:
            payloads = np.pad(payloads, ((0, 0), (0, want - payloads.shape[1])))
        elif payloads.shape[1] > want:  # only when fixed_len undersized
            raise ValueError(
                f"payload length {payloads.shape[1]} exceeds fixed_len {want}"
            )
        yield payloads, lengths


def count_pcap_pipelined(
    matcher,
    pcap_path,
    mode: str = "udp",
    *,
    batch_size: int = DEFAULT_BATCH,
    strict: bool = False,
) -> np.ndarray:
    """Full-file counting through the batched pipeline; counts are identical
    to the one-shot scan (tested), only the execution schedule differs.

    Ingest is streamed (``io.pcap.iter_pcap``), exactly as the reference's
    producer pulls packets from libpcap incrementally instead of loading the
    capture first (openmp_task.c:131-156) — so captures larger than host RAM
    flow through with bounded residency (one batch + one read buffer)."""
    total = None
    for chunk in iter_pcap(pcap_path, batch_packets=batch_size):
        for payloads, lengths in iter_batches(chunk, mode, batch_size, strict=strict):
            # Async dispatch: does NOT block — device consumes batch k while
            # the host (producer) reads + extracts batch k+1.  The gather-free
            # window engine is the batch kernel (the AC scan is ~30x slower on
            # TPU; see docs/DESIGN.md §1 — counts are identical either way).
            counts = count_matches_window(
                matcher.window, jnp.asarray(payloads), jnp.asarray(lengths)
            )
            total = counts if total is None else total + counts
    if total is None:
        return np.zeros(len(matcher.patterns), dtype=np.int32)
    return np.asarray(total)  # single synchronization point
