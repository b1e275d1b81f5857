"""Pallas TPU kernel for the shifted-window matcher (the roofline path).

The XLA version (ops/window.py) leaves >10x on the table because the
[G, N, L] broadcast-compare chains spill intermediates to HBM.  This kernel
keeps everything in VMEM:

- grid over packet row tiles; each step loads one [TN, L] uint8 payload tile
  and its lengths, builds the per-position little-endian uint32 word view
  once (three lane-rolls), and
- runs the fully unrolled compare chain for every pattern word with the
  pattern words/masks/lengths baked into the kernel as immediates (the
  pattern set is compile-time constant for a deployment — no SMEM loads,
  no gathers anywhere), then
- reduces each pattern's hit mask to a scalar and accumulates into an SMEM
  counts vector shared across grid steps.

Roll wrap-around is harmless: a wrapped word only affects positions i where
i + m > L >= length, which the fit mask kills (see ops/window.py for the
masking algebra).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multithreading_string_matching_tpu.ops.window import WindowProgram


def window_views(payload_ref, K: int, use_fit: bool):
    """[TN, L] little-endian uint32 word views starting at every byte
    position, one per pattern-word offset — the shared construction both
    Pallas kernels' correctness depends on (this file and ops/pallas_table).

    ``use_fit=True``: plain rolls (wrap-around is allowed because per-pattern
    (pos + m <= len) fit masks discard overhanging positions).
    ``use_fit=False``: ZERO-filled shifts — the NUL-free fast path where a
    window poking past the payload contains 0x00 and cannot match, so no fit
    masks are needed (DESIGN.md §2)."""
    x = payload_ref[:].astype(jnp.uint32)
    tn, L = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (tn, L), 1)

    def roll_left(a, s):  # pltpu.roll wants non-negative shifts
        return pltpu.roll(a, (L - s) % L, 1)

    def shifted(a, s):
        """Roll left by s with ZERO fill (no wrap-around)."""
        return jnp.where(pos < L - s, roll_left(a, s), jnp.uint32(0))

    if use_fit:
        x1, x2, x3 = roll_left(x, 1), roll_left(x, 2), roll_left(x, 3)
        w = [x | (x1 << 8) | (x2 << 16) | (x3 << 24)]
        for k in range(1, K):
            w.append(roll_left(w[0], 4 * k))
    else:
        x1, x2, x3 = shifted(x, 1), shifted(x, 2), shifted(x, 3)
        w = [x | (x1 << 8) | (x2 << 16) | (x3 << 24)]
        for k in range(1, K):
            w.append(shifted(w[0], 4 * k))
    return w, pos


def _make_halo_kernel(
    pat_words: np.ndarray,
    pat_masks: np.ndarray,
    pat_lens: np.ndarray,
    use_fit: bool,
    min_end: int,
):
    """Flow-halo totals kernel: the carried-byte-halo chunk scan
    (ops/window._window_chunk's algebra) as a VMEM kernel.  Each lane's
    row is [H | chunk bytes] with H = min_end halo columns; a match is
    counted ONLY when its END index lands at/after the halo (>= min_end —
    assigns every straddling match to exactly one round) and its START at
    or after the lane's ``ms`` bound (the fabricated-zeros boundary: a
    revived flow's halo is right-aligned real tail bytes, and NUL patterns
    must not match into the zeros in front — ms = H - fill).  For NUL-free
    sets the zero bytes can never equal a pattern and ``ms`` is redundant,
    but it rides anyway: one [TN, 1] operand and one compare, far below
    measurement noise, one code path for both modes."""
    U, K = pat_words.shape
    pw = [[int(pat_words[u, k]) for k in range(K)] for u in range(U)]
    pm = [[int(pat_masks[u, k]) for k in range(K)] for u in range(U)]
    plens = [int(x) for x in pat_lens]

    def kernel(payload_ref, length_ref, ms_ref, out_ref):
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for u in range(U):
                out_ref[u] = 0

        w, pos = window_views(payload_ref, K, use_fit)
        lens = length_ref[:]                            # [TN, 1] int32
        ms = ms_ref[:]                                  # [TN, 1] int32

        for u in range(U):
            acc = (w[0] & jnp.uint32(pm[u][0])) == jnp.uint32(pw[u][0])
            for k in range(1, K):
                if pm[u][k]:
                    acc &= (w[k] & jnp.uint32(pm[u][k])) == jnp.uint32(pw[u][k])
            if use_fit:
                acc &= (pos + plens[u]) <= lens
            # end index pos + m - 1 must land at/after the halo width.
            acc &= (pos + plens[u]) > min_end
            acc &= pos >= ms
            out_ref[u] += jnp.sum(acc.astype(jnp.int32))

    return kernel


def _make_kernel(
    pat_words: np.ndarray,
    pat_masks: np.ndarray,
    pat_lens: np.ndarray,
    use_fit: bool,
    grid_dims: int = 1,
    per_row: bool = False,
    fwords: "np.ndarray | None" = None,
    fmasks: "np.ndarray | None" = None,
):
    """``use_fit=False`` is the NUL-free fast path: payload rows are zero-
    padded past their true length (io/decode + api.prepare guarantee it), so
    with ZERO-EXTENDING shifted windows any window poking past the payload
    contains a 0x00 byte and cannot equal a NUL-free pattern — the
    per-pattern (pos + m <= len) mask (2 ops x U per position) collapses
    into ~5 shared window-sanitizing ops.  Any pattern containing NUL forces
    ``use_fit=True`` (exact mask per pattern).

    ``fwords``/``fmasks`` (counts path only): per-pattern filter words as
    IMMEDIATES — one eq + any-reduce gates each pattern's compare chain
    behind ``pl.when``, exactly the table kernel's round-4 filter/verify
    design (same no-false-negative argument: a match at i puts the filter
    word at absolute i+4k on view w[0]).  Patterns ABSENT from the row
    block cost ~2 ops/position instead of the full chain — on real
    corpora most of a rule set never fires (25/97 fixture entries match
    very_big_udp), which is where the win lives."""
    U, K = pat_words.shape
    pw = [[int(pat_words[u, k]) for k in range(K)] for u in range(U)]
    pm = [[int(pat_masks[u, k]) for k in range(K)] for u in range(U)]
    plens = [int(x) for x in pat_lens]

    def kernel(payload_ref, length_ref, out_ref):
        if not per_row:
            first = pl.program_id(0) == 0
            for d in range(1, grid_dims):
                first &= pl.program_id(d) == 0

            @pl.when(first)
            def _():
                for u in range(U):
                    out_ref[u] = 0

        w, pos = window_views(payload_ref, K, use_fit)

        lens = length_ref[:]                            # [TN, 1] int32

        def chain(u):
            acc = (w[0] & jnp.uint32(pm[u][0])) == jnp.uint32(pw[u][0])
            for k in range(1, K):
                if pm[u][k]:
                    acc &= (w[k] & jnp.uint32(pm[u][k])) == jnp.uint32(pw[u][k])
            if use_fit:
                # (a per-length shared fit-mask cache was tried: no speedup,
                # and cached masks blow scoped VMEM on wide tiles)
                acc &= (pos + plens[u]) <= lens
            if per_row:
                # Per-packet attribution: each grid step owns its row block
                # of the [N, U] output — no cross-step accumulation.
                out_ref[:, u] = jnp.sum(acc.astype(jnp.int32), axis=1)
            else:
                out_ref[u] += jnp.sum(acc.astype(jnp.int32))

        for u in range(U):
            if fwords is None or per_row:
                chain(u)
            else:
                fm, fw = int(fmasks[u]), int(fwords[u])
                if fm == 0xFFFFFFFF:
                    hit = w[0] == jnp.uint32(fw)
                else:
                    hit = (w[0] & jnp.uint32(fm)) == jnp.uint32(fw)

                @pl.when(jnp.any(hit))
                def _(u=u):
                    chain(u)

    return kernel


def pad_tile(payloads, lengths, *, row_tile: int, K: int, vmem_budget: int):
    """Pad to hardware-friendly tiles and pick the row-tile size — the ONE
    padding rule both Pallas kernel classes rest on: width padded to the
    128-lane quantum, rows to a multiple of the row tile (padding rows are
    length-0 / all-zero, which the kernels mask out), and the row tile
    capped by the VMEM budget for the ~(K + 8) uint32 [tn, L] live
    temporaries.  A ZERO-row tile pads to one full row tile of empty lanes
    (callers get zero counts instead of a degenerate grid)."""
    n, L = payloads.shape
    if L % 128 or L == 0:
        # Zero-WIDTH tiles pad to one full lane quantum too (zero bytes,
        # lengths 0 -> zero counts) instead of dividing the VMEM budget by 0.
        payloads = jnp.pad(payloads, ((0, 0), (0, 128 - L % 128)))
        L = payloads.shape[1]
    vmem_cap = max(8, (vmem_budget // ((K + 8) * L)) // 8 * 8)
    tn = min(row_tile, vmem_cap, max(8, -(-n // 8) * 8))
    n_pad = max(tn, -(-n // tn) * tn)
    if n_pad != n:
        payloads = jnp.pad(payloads, ((0, n_pad - n), (0, 0)))
        lengths = jnp.pad(lengths, (0, n_pad - n))
    return payloads, lengths.reshape(-1, 1).astype(jnp.int32), tn


class TileCountSurface:
    """The public tile-count surface shared by BOTH Pallas kernel classes
    (the unrolled-immediates kernel here and the SMEM table kernel in
    ops/pallas_table) — one implementation, so the build-order and int32-
    bound contracts cannot drift between them.

    Subclass contract:

    - ``count_tile_unique(payloads, lengths, tables=None)`` — int32[U]
      counts in BUILD (unique-pattern) order for one tile, safe under
      jit/shard_map;
    - ``_tile_repeated_unique(payloads, lengths, r, tables=None)`` —
      build-order counts with ``r`` repeats chained inside ONE kernel
      (repeat axis on the grid, so repeats cannot be elided or
      deduplicated);
    - ``_one_tile_rows(payloads, lengths, tables=None)`` —
      int32[n_padded, U] build-order per-row counts;
    - ``_staged_tables()`` — the pattern-table pytree the jitted wrappers
      pass per call: () for the unrolled kernel (tables are immediates),
      the device table arrays for the SMEM kernel.  Passing them as jit
      ARGUMENTS instead of closure constants is what makes a
      same-geometry pattern swap (``PallasTableMatcher.swap_tables``)
      reuse the compiled executable with ZERO recompilation — the
      rule-push latency path;
    - attributes ``wp`` (the WindowProgram) and ``num_unique``;
    - ``_build_tile_jits()`` called at the end of ``__init__``.
    """

    def _staged_tables(self):
        return ()

    def _build_tile_jits(self):
        self._tables_dev = self._staged_tables()

        def run_tiles(tables, tiles):
            outs = [
                self.count_tile_unique(p, l, tables=tables) for p, l in tiles
            ]
            return functools.reduce(jnp.add, outs)

        self._jit_tiles = jax.jit(run_tiles)

        def run_repeated(tables, tiles, r):
            outs = [
                self._tile_repeated_unique(p, l, r, tables=tables)
                for p, l in tiles
            ]
            return functools.reduce(jnp.add, outs)

        self._jit_repeated = jax.jit(run_repeated, static_argnames=("r",))

        def run_summary(tables, payloads, lengths):
            rows = self._one_tile_rows(
                payloads, lengths, tables=tables
            )[: payloads.shape[0]]
            return rows.sum(axis=0), rows.sum(axis=1) > 0

        self._jit_summary = jax.jit(run_summary)
        # Stage dup_map ONCE — _dup_take runs per tile on the serving hot
        # path; re-materializing it would re-upload per dispatch.
        self._dup = jnp.asarray(self.wp.dup_map)

    def _dup_take(self, out):
        return jnp.take(out, self._dup, axis=-1)

    def count_tiles(self, tiles, *, expand_duplicates: bool = True):
        """Counts over device-resident (payloads, lengths) tiles, one dispatch."""
        if not tiles:
            n = len(self.wp.dup_map) if expand_duplicates else self.num_unique
            return jnp.zeros((n,), jnp.int32)
        tiles = tuple(
            (jnp.asarray(p, jnp.uint8), jnp.asarray(l, jnp.int32)) for p, l in tiles
        )
        out = self._jit_tiles(self._tables_dev, tiles)
        if expand_duplicates:
            out = self._dup_take(out)
        return out

    def count_tiles_repeated(self, tiles, repeats: int):
        """Run the full tile count ``repeats`` times inside one executable
        (one kernel launch per tile, repeats as a grid axis), one fetch —
        the honest way to measure steady-state scan rate on devices whose
        per-dispatch round-trip dwarfs the kernel: grid steps always
        execute, so repeats cannot be elided or deduplicated (returns
        repeats x counts, over unique patterns).  The int32 accumulator
        bounds honest use: repeats x per-pattern corpus count must stay
        below 2^31 (bench.py's rep == count * REPS assertion catches a
        wrap)."""
        if not tiles:
            return jnp.zeros((self.num_unique,), jnp.int32)
        tiles = tuple(
            (jnp.asarray(p, jnp.uint8), jnp.asarray(l, jnp.int32)) for p, l in tiles
        )
        return self._jit_repeated(self._tables_dev, tiles, r=repeats)

    def count_tiles_per_row(self, tiles, *, expand_duplicates: bool = True):
        """Per-packet counts, one int32[rows_i, U or P] array per tile (rows
        are the tile's padded row count; padding rows count zero).  The
        per-packet analogue of count_tiles — attribution at kernel rate
        instead of degrading to the XLA window engine."""
        outs = []
        for p, l in tiles:
            out = self._one_tile_rows(
                jnp.asarray(p, jnp.uint8), jnp.asarray(l, jnp.int32)
            )
            if expand_duplicates:
                out = self._dup_take(out)
            outs.append(out)
        return outs

    def count_tile_summary(self, payloads, lengths):
        """One tile's attribution SUMMARY, reduced on device:
        ``(totals int32[U] in build order, row_hits bool[n])`` — the only two
        things the streamed attribution path needs per chunk, fetched as
        ``U*4 + n`` bytes instead of the ``n*U*4`` per-row matrix (~300x less
        d2h at the serving chunk shape).  int32-exact while the tile scans
        fewer than 2^31 positions (``n*L``): a position starts at most one
        match per pattern (callers slice bigger feeds)."""
        return self._jit_summary(
            self._tables_dev,
            jnp.asarray(payloads, jnp.uint8), jnp.asarray(lengths, jnp.int32),
        )


class PallasWindowMatcher(TileCountSurface):
    """Holds the pattern-specialized kernel + a jitted multi-tile dispatcher."""

    def __init__(
        self,
        wp: WindowProgram,
        row_tile: int = 512,
        interpret: bool = False,
        assume_zero_padded: bool = False,
        filtered: bool = False,
    ):
        """``assume_zero_padded=True``: caller guarantees every row's bytes at
        positions >= lengths[i] are zero (io/decode.extract_payloads and
        api.Matcher.prepare both produce exactly that) — enables the no-fit
        fast path for NUL-free pattern sets.  With arbitrary payload buffers
        leave it False.  ``filtered=True`` gates each pattern's compare
        chain behind an immediate filter-word test (counts path; per-row
        attribution stays unfiltered)."""
        self.wp = wp
        self.row_tile = row_tile
        self.interpret = interpret
        self.filtered = filtered
        self.num_unique = int(wp.pat_words.shape[0])
        # NUL-containing patterns can match zero padding -> need exact fit.
        use_fit = (not assume_zero_padded) or any(0 in p for p in wp.unique_patterns)
        fwords = fmasks = None
        if filtered:
            from multithreading_string_matching_tpu.ops.pallas_table import (
                _filter_words,
            )

            fwords, fmasks = _filter_words(wp)
        self._kernel = _make_kernel(
            wp.pat_words, wp.pat_masks, wp.pat_lens, use_fit,
            fwords=fwords, fmasks=fmasks,
        )
        self._kernel2 = _make_kernel(
            wp.pat_words, wp.pat_masks, wp.pat_lens, use_fit, grid_dims=2,
            fwords=fwords, fmasks=fmasks,
        )
        self._kernel_rows = _make_kernel(
            wp.pat_words, wp.pat_masks, wp.pat_lens, use_fit, per_row=True
        )
        self._build_tile_jits()

    def _pad_tile(self, payloads, lengths):
        # VMEM budget: the live set is ~(K + 8) uint32 [tn, L] temporaries
        # (K shifted word views + payload/pos/len/acc and roll scratch) and
        # must fit in ~12 MB of scoped VMEM -> cap tn by width AND word count
        # (long patterns mean more live word views).  K=3 reproduces the
        # empirically tuned 250k/L cap.
        return pad_tile(
            payloads, lengths, row_tile=self.row_tile,
            K=self.wp.pat_words.shape[1], vmem_budget=2_750_000,
        )

    def _one_tile(self, payloads, lengths):
        payloads, lengths, tn = self._pad_tile(payloads, lengths)
        n, L = payloads.shape
        return pl.pallas_call(
            self._kernel,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((tn, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((self.num_unique,), jnp.int32),
            interpret=self.interpret,
        )(payloads, lengths)

    def _one_tile_repeated(self, payloads, lengths, reps: int):
        """Scan the tile ``reps`` times inside ONE kernel launch: the repeat
        axis is the leading grid dimension, so every pass re-streams the tile
        from HBM through the same VMEM pipeline and accumulates into the SMEM
        counts.  Grid steps execute unconditionally — nothing to elide, no
        artificial cross-pass serialization — so this measures the kernel's
        true sustained rate on a device-resident corpus."""
        payloads, lengths, tn = self._pad_tile(payloads, lengths)
        n, L = payloads.shape
        return pl.pallas_call(
            self._kernel2,
            grid=(reps, n // tn),
            in_specs=[
                pl.BlockSpec((tn, L), lambda r, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda r, i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((self.num_unique,), jnp.int32),
            interpret=self.interpret,
        )(payloads, lengths)

    def count_tile_unique(self, payloads, lengths, tables=None):
        """Counts in BUILD (unique-pattern) order for one tile — the shape
        contract shared with :class:`~.pallas_table.PallasTableMatcher`
        (whose raw ``_one_tile`` is sorted by word-count class).  Safe to
        call inside a jit/shard_map trace; parallel.mesh uses it so sharded
        runs can never see a kernel-internal permutation.  ``tables`` is
        unused here: the unrolled kernel's patterns are immediates."""
        return self._one_tile(payloads, lengths)

    def _tile_repeated_unique(self, payloads, lengths, reps: int, tables=None):
        return self._one_tile_repeated(payloads, lengths, reps)

    def _one_tile_rows(self, payloads, lengths, tables=None):
        """Per-row counts int32[n_padded, U]; each grid step writes its own
        row block (no cross-step state, no zeroing pass)."""
        payloads, lengths, tn = self._pad_tile(payloads, lengths)
        n, L = payloads.shape
        return pl.pallas_call(
            self._kernel_rows,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((tn, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, self.num_unique), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, self.num_unique), jnp.int32),
            interpret=self.interpret,
        )(payloads, lengths)

    # -- flow-halo rounds (round 5) ----------------------------------------

    @property
    def halo_width(self) -> int:
        return max(int(self.wp.max_len) - 1, 1)

    def _halo_run(self, payloads, lengths, ms):
        """Traceable core of :meth:`count_tile_halo` — also called inside
        the sharded flow-round shard_map (parallel.mesh), so it must stay
        jit-safe and kernel-cached on self."""
        kern = getattr(self, "_halo_kernel", None)
        if kern is None:
            kern = self._halo_kernel = _make_halo_kernel(
                self.wp.pat_words, self.wp.pat_masks, self.wp.pat_lens,
                # use_fit mirrors the counts kernel: NUL patterns need the
                # exact per-pattern fit masks, NUL-free rides the zero-
                # padding argument (fresh zeroed round buffers).
                any(0 in p for p in self.wp.unique_patterns),
                min_end=self.halo_width,
            )
        payloads, lengths2, tn = self._pad_tile(payloads, lengths)
        n, L = payloads.shape
        ms = jnp.pad(
            jnp.asarray(ms, jnp.int32).reshape(-1, 1),
            ((0, n - np.shape(ms)[0]), (0, 0)),
        )
        return pl.pallas_call(
            kern,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((tn, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((self.num_unique,), jnp.int32),
            interpret=self.interpret,
        )(payloads, lengths2, ms)

    def count_tile_halo(self, x, eff_len, min_start):
        """Build-order unique totals int32[U] for ONE flow-round tile
        ``x = [halo | round bytes]`` (halo = ``halo_width`` columns): the
        carried-halo chunk scan (ops/window.window_stream_chunk's algebra)
        at VMEM kernel rate — what lets a streamed flow round run at the
        one-shot kernel's speed instead of the XLA window engine's.

        ``eff_len[i]``: valid bytes of row i INCLUDING the halo columns
        (min(pending + H, H + C) — _window_chunk's rule); bytes past it
        must be ZERO (the flow stream builds fresh zeroed round buffers).
        ``min_start[i]``: first column a match may START at (H - real halo
        fill — the fabricated-zeros boundary; NUL-pattern exactness)."""
        if getattr(self, "_jit_halo", None) is None:
            self._jit_halo = jax.jit(self._halo_run)
        return self._jit_halo(
            jnp.asarray(x, jnp.uint8),
            jnp.asarray(eff_len, jnp.int32),
            jnp.asarray(min_start, jnp.int32),
        )

    # count_tiles / count_tiles_repeated / count_tiles_per_row /
    # count_tile_summary: inherited from TileCountSurface.
