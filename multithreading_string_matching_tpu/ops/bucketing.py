"""Length-bucketed execution: don't pay padded-scan cost for short packets.

Payload lengths are heavy-tailed (very_big_udp.pcap: mean 96 B, max 328 B),
so a single padded [N, Lmax] launch wastes ~4x the real byte work.  Counting
is order-independent, so we sort packets by length (host-side, stable),
split into fixed-size row tiles, and trim each tile's byte axis to its own
maximum (quantized so only a handful of distinct shapes ever compile).

This is the reference's scheduling problem in tensor form: OpenMP guided
scheduling (openmp_data.c:128) exists to balance uneven per-packet work
across threads; here the imbalance is removed before launch instead.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np


def bucket_plan(
    lengths: np.ndarray, n_tile: int = 2048, l_quant: int = 128
) -> List[Tuple[np.ndarray, int]]:
    """Partition packets into (row_indices, tile_byte_len) tiles.

    Rows are sorted by descending length so each tile's padded length is as
    tight as its longest member; tile byte lengths are rounded up to
    ``l_quant`` so at most Lmax/l_quant distinct shapes compile.
    """
    lengths = np.asarray(lengths)
    order = np.argsort(-lengths, kind="stable")
    plan = []
    for start in range(0, len(order), n_tile):
        idx = order[start : start + n_tile]
        lmax = int(lengths[idx].max(initial=0))
        lt = max(l_quant, -(-max(lmax, 1) // l_quant) * l_quant)
        plan.append((idx, lt))
    return plan


def run_bucketed(
    count_fn: Callable,
    payloads: np.ndarray,
    lengths: np.ndarray,
    *,
    n_tile: int = 2048,
    l_quant: int = 128,
    per_packet: bool = False,
):
    """Apply ``count_fn(payloads_tile, lengths_tile, per_packet=...)`` per
    bucket and merge.  Global counts sum across tiles (exact, associative);
    per-packet rows are scattered back to input order.

    Tiles are dispatched without host synchronization in between, so the
    device pipeline stays full (the openmp_task.c overlap, for free).
    """
    payloads = np.asarray(payloads)
    lengths = np.asarray(lengths)
    plan = bucket_plan(lengths, n_tile=n_tile, l_quant=l_quant)
    total = None
    rows = []
    row_idx = []
    for idx, lt in plan:
        tile_p = payloads[idx, :lt]
        tile_l = lengths[idx]
        if tile_p.shape[0] < n_tile:  # pad the ragged last tile (rows mask out)
            pad = n_tile - tile_p.shape[0]
            tile_p = np.pad(tile_p, ((0, pad), (0, 0)))
            tile_l = np.pad(tile_l, (0, pad))
        out = count_fn(tile_p, tile_l, per_packet=per_packet)
        if per_packet:
            rows.append(out)
            row_idx.append(idx)
        else:
            total = out if total is None else total + out
    if per_packet:
        first = np.asarray(rows[0])
        merged = np.zeros((len(lengths), first.shape[1]), dtype=first.dtype)
        for idx, out in zip(row_idx, rows):
            merged[idx] = np.asarray(out)[: len(idx)]
        return merged
    return total
