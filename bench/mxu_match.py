"""Measure the MXU (matmul) formulation of exact byte matching.

DESIGN.md §1b dismissed recasting byte equality as matmuls with an ops
estimate but no measurement — this harness supplies the number (round-4
verdict item 2).  Formulation measured here is the DENSEST exact one, the
±1 bit inner product:

- each payload byte expands to 8 bits encoded ±1; a window of m_max bytes
  starting at every position becomes a C = 8*m_max column of ±1 int8,
- each pattern byte becomes ±1 at its 8 bit positions; bytes past the
  pattern's length encode 0 (don't-care),
- score[pos, u] = <window bits, pattern bits> sums +1 per matching active
  bit and -1 per mismatching one, so score == 8*len_u  ⇔  every active
  byte matches exactly (the nibble one-hot alternative needs 32 MACs/byte
  for the same test — 4x sparser, strictly worse; not measured).

The kernel: grid (pattern_blocks, reps, row_tiles); per step it builds the
C shifted ±1 bitplanes of the payload tile once ([TN, C, L] int8), then for
each of the TN rows runs one [U_blk, C] x [C, L] int8 matmul on the MXU and
an eq+reduce epilogue on the VPU.  Zero-filled shifts past the row end give
all-zero window bytes, which cannot reach any NUL-free pattern's target
(the no-fit invariant) — the bench pattern sets are NUL-free.

Padded pattern slots get target = 1 (an all-zero pattern row scores exactly
0 everywhere, and no ±-sum parity reaches 1 with zero active bits), so they
count 0 and are sliced off.

Run on the TPU:  python bench/mxu_match.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U_BLOCK = 128


def _bit_tables(patterns):
    """(P int8[U_pad, C], targets int32[U_pad, 1], m_max) from raw bytes."""
    m_max = max(len(p) for p in patterns)
    C = 8 * m_max
    U = len(patterns)
    U_pad = -(-U // U_BLOCK) * U_BLOCK
    P = np.zeros((U_pad, C), np.int8)
    tgt = np.ones((U_pad, 1), np.int32)  # sentinel: unreachable for pads
    for u, p in enumerate(patterns):
        for k, byte in enumerate(p):
            for j in range(8):
                P[u, k * 8 + j] = 1 if (byte >> j) & 1 else -1
        tgt[u, 0] = 8 * len(p)
    return P, tgt, m_max


def _make_kernel(m_max: int, tn: int):
    C = 8 * m_max

    def kernel(pat_ref, tgt_ref, payload_ref, out_ref):
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = payload_ref[:].astype(jnp.int32)
        _, L = x.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (tn, L), 1)

        planes = []
        for k in range(m_max):
            if k:
                xk = jnp.where(
                    pos < L - k, pltpu.roll(x, (L - k) % L, 1), 0
                )
            else:
                xk = x
            for j in range(8):
                planes.append(
                    (((xk >> j) & 1) * 2 - 1).astype(jnp.int8)
                )
        R = jnp.stack(planes, axis=1)          # [TN, C, L] ±1
        tgt = tgt_ref[:]                        # [U_blk, 1]
        acc = jnp.zeros_like(out_ref)
        for t in range(tn):
            scores = jax.lax.dot_general(
                pat_ref[:], R[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                   # [U_blk, L]
            acc = acc + jnp.sum(
                (scores == tgt).astype(jnp.int32), axis=1, keepdims=True
            )
        out_ref[:] = out_ref[:] + acc

    return kernel


class MxuMatcher:
    """Minimal count/repeat surface for the measurement (build-order counts
    over unique patterns; tiles must be zero-padded past their lengths)."""

    def __init__(self, patterns, tn: int = 8, interpret: bool = False):
        self.P, self.tgt, self.m_max = _bit_tables(patterns)
        self.tn = tn
        self.interpret = interpret
        self.num_unique = len(patterns)
        self._kernel = _make_kernel(self.m_max, tn)

        def run(tiles, r):
            outs = [self._one_tile(p, l, r) for p, l in tiles]
            import functools

            return functools.reduce(jnp.add, outs)

        self._jit = jax.jit(run, static_argnames=("r",))

    def _one_tile(self, payloads, lengths, reps):
        n, L = payloads.shape
        if L % 128:
            payloads = jnp.pad(payloads, ((0, 0), (0, 128 - L % 128)))
            L = payloads.shape[1]
        if n % self.tn:
            pad = self.tn - n % self.tn
            payloads = jnp.pad(payloads, ((0, pad), (0, 0)))
            n += pad
        U_pad = self.P.shape[0]
        nblocks = U_pad // U_BLOCK
        return pl.pallas_call(
            self._kernel,
            grid=(nblocks, reps, n // self.tn),
            in_specs=[
                pl.BlockSpec((U_BLOCK, 8 * self.m_max),
                             lambda j, r, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((U_BLOCK, 1), lambda j, r, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.tn, L), lambda j, r, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((U_BLOCK, 1), lambda j, r, i: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((U_pad, 1), jnp.int32),
            interpret=self.interpret,
        )(jnp.asarray(self.P), jnp.asarray(self.tgt), payloads)

    def count_tiles_repeated(self, tiles, reps):
        tiles = tuple(
            (jnp.asarray(p, jnp.uint8), jnp.asarray(l, jnp.int32))
            for p, l in tiles
        )
        return self._jit(tiles, r=reps)[: self.num_unique, 0]


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multithreading_string_matching_tpu import (
        Matcher, extract_payloads, read_pcap,
    )
    from multithreading_string_matching_tpu.io.synth import synth_udp_pcap
    from multithreading_string_matching_tpu.ops.pallas_table import (
        PallasTableMatcher,
    )

    corpus = pathlib.Path("/tmp/msm_crossover.pcap")
    if not corpus.exists():
        import os

        tmp = corpus.with_suffix(f".{os.getpid()}.tmp")
        synth_udp_pcap(tmp, 10_000, payload_len=1024, payload_len_jitter=256,
                       patterns=[b"pt000000"], plant_rate=0.02, seed=3)
        os.replace(tmp, corpus)
    batch = extract_payloads(read_pcap(corpus), "udp")
    nbytes = batch.total_payload_bytes

    for U in (97, 768, 3072):
        if U == 97:
            pats = Matcher.from_file("/root/reference/strings.txt").patterns
            pats = list(dict.fromkeys(pats))
        else:
            pats = [b"pt%06d" % i for i in range(U)]
        m = Matcher(pats)
        prep = m.prepare_batch(batch, packed="auto")
        row = {"patterns": len(pats)}

        reps = max(10, 20_000 // len(pats))
        mxu = MxuMatcher(pats)
        t0 = time.perf_counter()
        out = np.asarray(mxu.count_tiles_repeated(prep.tiles, reps))
        row["mxu_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        np.asarray(mxu.count_tiles_repeated(prep.tiles, reps))
        dt = (time.perf_counter() - t0) / reps
        row["mxu_bytes_per_sec"] = round(nbytes / dt, 1)

        table = PallasTableMatcher(m.window, assume_zero_padded=True)
        want = np.asarray(table.count_tiles(prep.tiles,
                                            expand_duplicates=False))
        assert (out / reps == want).all(), "mxu counts != table counts"
        # Warm the REPEATED executable before timing (count_tiles above
        # compiles a different one; round-4 first run timed this cold).
        np.asarray(table.count_tiles_repeated(prep.tiles, reps))
        t0 = time.perf_counter()
        np.asarray(table.count_tiles_repeated(prep.tiles, reps))
        row["table_bytes_per_sec"] = round(nbytes * reps /
                                           (time.perf_counter() - t0), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
