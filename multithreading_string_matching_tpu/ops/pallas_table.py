"""Table-driven Pallas kernel — the large-pattern-set window matcher.

The unrolled kernel (ops/pallas_window.py) bakes every pattern word into the
instruction stream as an immediate.  That is unbeatable for the reference's
97 patterns (strings.txt), but the compare chain is materialized in the HLO,
so compile time grows ~quadratically with total pattern words (measured
220 s at 1.5k words on the remote compiler — docs/DESIGN.md §1) and every
pattern-set change recompiles.  This kernel keeps the same algorithm — the
shifted-window masked word compare that implements kmp_matcher's overlap
semantics (reference serial.c:190-215) — but reads the pattern set from
memory:

- pattern word/mask/len tables stream through SMEM blocks (``PB`` patterns
  per grid step along a pattern-block grid axis),
- an unrolled ``lax.fori_loop`` walks the block's patterns; each iteration
  broadcasts K scalar SMEM reads against the [TN, L] shifted uint32 window
  views built once per payload tile (still zero gathers, zero carried
  state).  The trip count is STATIC (the whole block, padded slots
  included) and the loop is unrolled 16-wide — both matter: a dynamic bound
  or a serial loop leaves the VPU idle between the per-pattern reduction
  trees, which costs ~an order of magnitude (sweep in the UNROLL comment),
- the pattern set is partitioned by word count K, one specialized kernel per
  class, so every compare in the loop is live (a mixed-length set costs
  sum_c U_c*K_c compares, not U*K_max).

Padded pattern slots (mask 0 → compare trivially true) accumulate garbage
counts into output slots the host slices off; classes smaller than one block
shrink their block to the class, so the waste is bounded by the last
partial block of each class.

Compile time is O(K_max) — independent of pattern count — which extends the
window formulation's fast path from the unrolled kernel's practical ~512-word
ceiling to the multi-thousand-pattern regime where the Aho-Corasick DFA
(whose per-byte gather is ~370x one compare, DESIGN.md §1) is the only other
option.  api.Matcher picks between the two kernels by pattern-set size.

Filter/verify (``filtered=True``): the plain table kernel pays the full
K-word chain (~6-8 VPU ops per position) for EVERY pattern at EVERY
position, which is why throughput scales ~1/U.  The filtered variant runs a
cheap shared first stage per pattern — ONE masked word-compare of ``w[0]``
against the pattern's rarest full word, plus a scalar any-reduce (~2 ops per
position) — and gates the full verification chain behind ``pl.when`` on the
reduced flag, so patterns absent from the tile cost 2 ops/position instead
of 6-8.  Correctness hinges on one observation: a match of pattern u at
position i puts u's word k at ABSOLUTE position i+4k, so testing view
``w[0]`` at every position catches it — no per-pattern view selection, which
matters because the pattern tables are data and the K window views are a
compile-time Python list.  The filter word per pattern is the full (mask
0xFFFFFFFF) word whose value is rarest across the whole pattern set (shared
prefixes like "HTTP" or the crossover bench's "pt00" would otherwise fire
everywhere); sets sharing ALL their full words degrade to the unfiltered
cost plus the 2-op filter, never to wrong counts — false positives only
cost the verify, false negatives are impossible.  Padded pattern slots get
(fword=1, fmask=0): the filter can never fire, so padded slots report 0
instead of the unfiltered kernel's garbage (host slices them off either
way).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multithreading_string_matching_tpu.ops.window import WindowProgram
from multithreading_string_matching_tpu.ops.pallas_window import (
    TileCountSurface,
    window_views as _window_views,
)

# Patterns per SMEM block: multiples of 128 satisfy Mosaic's rank-1 block
# rule; 128 keeps partial-block waste ≤127 pattern slots per class while the
# per-block window-view rebuild (~15 vector ops) stays ~1% of block compute.
PATTERN_BLOCK = 128
# In-loop unroll factor: independent compare/reduce chains per loop step so
# the VPU pipelines across patterns instead of stalling on each pattern's
# reduction tree.  Swept on v5e (768 length-8 patterns / 97-pattern fixture):
# 1-wide 0.59/2.53 GB/s, 8-wide 0.73/4.82, 16-wide 0.78/4.79, 32-wide
# 0.81/3.57 (32 pads small word-count classes too hard) -> 16.
UNROLL = 16


def _make_table_kernel(K: int, use_fit: bool, with_reps: bool, unroll: int = UNROLL):
    """Grid: (pattern_blocks[, reps], row_tiles) — row tiles iterate fastest,
    so each pattern block's SMEM counts are zeroed once (first row tile of
    its first rep) and accumulate over every row tile (x reps)."""

    def kernel(words_ref, masks_ref, lens_ref, payload_ref, length_ref,
               out_ref):
        first = pl.program_id(1) == 0 if not with_reps else (
            (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
        )
        PB = out_ref.shape[0]

        @pl.when(first)
        def _():
            def zero(u, c):
                out_ref[u, 0] = 0
                return c

            jax.lax.fori_loop(0, PB, zero, 0)

        w, pos = _window_views(payload_ref, K, use_fit)
        lens = length_ref[:]                     # [TN, 1] int32

        # Manual UNROLL-wide body (Mosaic's fori_loop only lowers unroll=1
        # or full unroll): UNROLL independent compare/reduce chains per loop
        # step keep the VPU pipelined across patterns.  pb is always a
        # multiple of lcm(UNROLL, 8) (_PatternClass), so the loop covers
        # every slot.
        def body(g, c):
            base = g * unroll
            for t in range(unroll):
                u = base + t
                acc = (w[0] & masks_ref[u, 0]) == words_ref[u, 0]
                for k in range(1, K):
                    acc &= (w[k] & masks_ref[u, k]) == words_ref[u, k]
                if use_fit:
                    acc &= (pos + lens_ref[u, 0]) <= lens
                out_ref[u, 0] = out_ref[u, 0] + jnp.sum(acc.astype(jnp.int32))
            return c

        jax.lax.fori_loop(0, PB // unroll, body, 0)

    return kernel


def _make_table_kernel_rows(K: int, use_fit: bool, unroll: int = UNROLL):
    """Per-row variant: grid (pattern_blocks, row_tiles); each step owns its
    [PB, TN] block of the transposed [U, N] output (no cross-step state)."""

    def kernel(words_ref, masks_ref, lens_ref, payload_ref, length_ref,
               out_ref):
        PB = out_ref.shape[0]
        w, pos = _window_views(payload_ref, K, use_fit)
        lens = length_ref[:]

        def body(g, c):
            base = g * unroll
            for t in range(unroll):
                u = base + t
                acc = (w[0] & masks_ref[u, 0]) == words_ref[u, 0]
                for k in range(1, K):
                    acc &= (w[k] & masks_ref[u, k]) == words_ref[u, k]
                if use_fit:
                    acc &= (pos + lens_ref[u, 0]) <= lens
                out_ref[u, :] = jnp.sum(acc.astype(jnp.int32), axis=1)
            return c

        jax.lax.fori_loop(0, PB // unroll, body, 0)

    return kernel


def _make_filter_kernel(K: int, use_fit: bool, with_reps: bool,
                        unroll: int = UNROLL, gate: str = "group"):
    """Filter/verify totals kernel: same grid/accumulation contract AND the
    same operand list as _make_table_kernel — the filter word/mask ride as
    an EXTRA COLUMN K of the words/masks tables.  That is not cosmetic:
    adding two more SMEM operands multiplied the Mosaic compile time ~20x
    (measured 194 s vs 9 s for an identical kernel body; the packed-column
    form compiles like the plain kernel).

    Each unroll group computes its ``unroll`` filter-hit masks branchlessly
    (independent eq chains keep the VPU pipelined), ORs them, and gates the
    group's verify chains behind ONE ``pl.when`` on the reduced flag.

    ``gate`` modes, MEASURED on the v5e (bench/filter_probe, length-8
    sets; table kernel = 1.0x): ``'pattern-any'`` (default) gates each
    pattern behind ``jnp.any`` of its hit mask — 1.5x at 256 patterns,
    1.6-1.7x at 3072, the only mode whose branches Mosaic actually takes;
    ``'pattern'`` is the same with a sum-based flag (~3% slower);
    ``'group'`` and ``'hier'`` wrap bigger regions in the ``pl.when`` and
    Mosaic executes them regardless (~= unfiltered, both corpora — kept
    for re-measurement); ``'none'`` verifies unconditionally (the filter
    cost floor: ~2% overhead).  The ceiling is structural: the per-pattern
    eq + any-reduce floor is ~2-3 VPU ops against the K=2 verify chain's
    ~6.5, so ~2x is the best case on 8-byte patterns and it grows with
    pattern length (the verify chain scales with K, the filter does not)."""

    def kernel(words_ref, masks_ref, lens_ref, payload_ref, length_ref,
               out_ref):
        first = pl.program_id(1) == 0 if not with_reps else (
            (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
        )
        PB = out_ref.shape[0]

        @pl.when(first)
        def _():
            def zero(u, c):
                out_ref[u, 0] = 0
                return c

            jax.lax.fori_loop(0, PB, zero, 0)

        w, pos = _window_views(payload_ref, K, use_fit)
        lens = length_ref[:]

        def verify(u):
            acc = (w[0] & masks_ref[u, 0]) == words_ref[u, 0]
            for k in range(1, K):
                acc &= (w[k] & masks_ref[u, k]) == words_ref[u, k]
            if use_fit:
                acc &= (pos + lens_ref[u, 0]) <= lens
            out_ref[u, 0] = out_ref[u, 0] + jnp.sum(acc.astype(jnp.int32))

        def body(g, c):
            base = g * unroll
            hits = []
            for t in range(unroll):
                u = base + t
                hits.append(
                    (w[0] & masks_ref[u, K]) == words_ref[u, K]
                )
            if gate == "group":
                anyhit = hits[0]
                for h in hits[1:]:
                    anyhit |= h
                flag = jnp.sum(anyhit.astype(jnp.int32))

                @pl.when(flag > 0)
                def _():
                    for t in range(unroll):
                        verify(base + t)
            elif gate in ("pattern", "pattern-any"):
                if gate == "pattern-any":
                    # Mask OR-reduce: no bool->int32 conversion pass.
                    flags = [jnp.any(h) for h in hits]
                else:
                    flags = [jnp.sum(h.astype(jnp.int32)) > 0 for h in hits]
                for t in range(unroll):

                    @pl.when(flags[t])
                    def _(u=base + t):
                        verify(u)
            elif gate == "hier":
                # Hierarchical: ONE cheap any-reduce gates the group's
                # per-pattern reduces+branches, which gate the verifies.
                # Sound because a pattern's flag can only fire where the
                # group OR fired.  (Whether Mosaic lowers the outer region
                # as a real branch is what bench/filter_probe measures.)
                anyhit = hits[0]
                for h in hits[1:]:
                    anyhit |= h
                gflag = jnp.sum(anyhit.astype(jnp.int32))

                @pl.when(gflag > 0)
                def _():
                    for t in range(unroll):
                        f = jnp.sum(hits[t].astype(jnp.int32))

                        @pl.when(f > 0)
                        def _(u=base + t):
                            verify(u)
            else:
                for t in range(unroll):
                    verify(base + t)
            return c

        jax.lax.fori_loop(0, PB // unroll, body, 0)

    return kernel


def _make_filter_kernel_rows(K: int, use_fit: bool, unroll: int = UNROLL,
                             gate: str = "group"):
    """Per-row filter/verify variant: each grid step OWNS its [PB, TN]
    output block, so ungated groups must write explicit zero rows (cheap:
    one store per element vs the verify chain's compare tree).  Filter
    word/mask live in column K of the tables (see _make_filter_kernel)."""

    def kernel(words_ref, masks_ref, lens_ref, payload_ref, length_ref,
               out_ref):
        PB = out_ref.shape[0]
        w, pos = _window_views(payload_ref, K, use_fit)
        lens = length_ref[:]

        def verify_rows(u):
            acc = (w[0] & masks_ref[u, 0]) == words_ref[u, 0]
            for k in range(1, K):
                acc &= (w[k] & masks_ref[u, k]) == words_ref[u, k]
            if use_fit:
                acc &= (pos + lens_ref[u, 0]) <= lens
            out_ref[u, :] = jnp.sum(acc.astype(jnp.int32), axis=1)

        def body(g, c):
            base = g * unroll
            if gate == "none":
                for t in range(unroll):
                    verify_rows(base + t)
                return c
            hits = []
            for t in range(unroll):
                u = base + t
                hits.append((w[0] & masks_ref[u, K]) == words_ref[u, K])
            anyhit = hits[0]
            for h in hits[1:]:
                anyhit |= h
            flag = jnp.sum(anyhit.astype(jnp.int32))

            @pl.when(flag > 0)
            def _():
                for t in range(unroll):
                    verify_rows(base + t)

            @pl.when(flag == 0)
            def _():
                for t in range(unroll):
                    out_ref[base + t, :] = jnp.zeros(
                        (out_ref.shape[1],), jnp.int32
                    )
            return c

        jax.lax.fori_loop(0, PB // unroll, body, 0)

    return kernel


def _filter_words(wp: WindowProgram):
    """Per-unique-pattern (filter_word, filter_mask): the FULL (mask
    0xFFFFFFFF) word whose value is rarest across the whole pattern set —
    shared-prefix sets ("HTTP/1.1 ...", the crossover bench's "pt%06d")
    keep a discriminative filter because ties break toward the LAST word.
    Patterns with no full word (length < 4) fall back to their masked
    word 0."""
    full = wp.pat_masks == np.uint32(0xFFFFFFFF)
    vals, counts = np.unique(wp.pat_words[full], return_counts=True)
    freq = dict(zip(vals.tolist(), counts.tolist()))
    U, K = wp.pat_words.shape
    fwords = np.empty(U, np.uint32)
    fmasks = np.empty(U, np.uint32)
    for u in range(U):
        cands = np.flatnonzero(full[u])
        if cands.size:
            k = min(cands.tolist(),
                    key=lambda k: (freq[int(wp.pat_words[u, k])], -k))
            fwords[u] = wp.pat_words[u, k]
            fmasks[u] = np.uint32(0xFFFFFFFF)
        else:
            fwords[u] = wp.pat_words[u, 0]
            fmasks[u] = wp.pat_masks[u, 0]
    return fwords, fmasks


class _PatternClass:
    """One word-count class: contiguous tables padded to whole SMEM blocks.

    A class smaller than one block shrinks its block to the (8-padded) class
    size — a block equal to the whole array satisfies Mosaic's block rules
    at any size, and small classes then carry ≤7 padded slots."""

    def __init__(self, K: int, words: np.ndarray, masks: np.ndarray,
                 lens: np.ndarray, block: int, unroll: int = UNROLL,
                 fwords: Optional[np.ndarray] = None,
                 fmasks: Optional[np.ndarray] = None):
        self.K = K
        self.num = words.shape[0]
        # pb must be a multiple of the kernel's unroll width (the loop runs
        # PB // unroll groups) AND of the sublane count (8) — max() is NOT
        # enough: unroll=5 with 8-padding would leave PB//unroll covering
        # only the first 5 of 8 slots, silently zeroing trailing patterns.
        import math

        q = math.lcm(unroll, 8)
        block = -(-block // q) * q
        self.pb = min(block, -(-self.num // q) * q)
        self.nblocks = -(-self.num // self.pb)
        pad = self.nblocks * self.pb - self.num
        self.words = np.pad(words[:, :K], ((0, pad), (0, 0)))
        self.masks = np.pad(masks[:, :K], ((0, pad), (0, 0)))
        self.lens = np.pad(lens, (0, pad)).reshape(-1, 1).astype(np.int32)
        if fwords is not None:
            # Filter word/mask ride as COLUMN K of the same tables (extra
            # SMEM operands cost ~20x in Mosaic compile time — kernel
            # docstring).  Padded slots get the never-fires sentinel
            # (x & 0 == 1 is false everywhere), so they skip verification
            # and report 0.
            fw = np.pad(fwords, (0, pad), constant_values=1)
            fm = np.pad(fmasks, (0, pad), constant_values=0)
            self.words = np.concatenate(
                [self.words, fw[:, None].astype(self.words.dtype)], axis=1
            )
            self.masks = np.concatenate(
                [self.masks, fm[:, None].astype(self.masks.dtype)], axis=1
            )


def plan_shard_geometry(C: int, unroll: int = UNROLL,
                        block: int = PATTERN_BLOCK):
    """(S, pb, nblocks) for a pattern shard of C real patterns: the padded
    shard size S = nblocks*pb every device's table must share (pattern-
    parallel shards run ONE SPMD program, so geometry is uniform by
    construction — parallel/pattern_shard.py).  Same padding algebra as
    _PatternClass (pb a multiple of lcm(unroll, 8), capped at the SMEM
    block)."""
    import math

    q = math.lcm(unroll, 8)
    block = -(-block // q) * q
    pb = min(block, -(-max(C, 1) // q) * q)
    nblocks = -(-max(C, 1) // pb)
    return nblocks * pb, pb, nblocks


class ShardTableKernel:
    """Fixed-geometry single-class table kernel for PATTERN-parallel
    execution (parallel/pattern_shard.py): every mesh shard passes its own
    ``[S, K(+1)]`` table block as DATA through one shared SPMD program, so
    — unlike PallasTableMatcher's per-word-count-class specialization —
    all patterns run the full K-word chain (mask-0 words past a pattern's
    end compare trivially true, exactly ops/window.WindowProgram's own
    padding).  That uniformity is the price of sharding the pattern axis;
    the ~1/U throughput law (DESIGN §1) means dividing U by N devices
    repays it ~N-fold on exactly the large sets this path exists for.

    Padded shard slots: with ``use_fit`` they carry a never-fitting length
    (counted 0); in no-fit mode they count garbage the host slices off
    (PatternShardPlan.gather slices per-shard valid ranges either way);
    with ``filtered`` their (fword=1, fmask=0) sentinel never fires."""

    def __init__(self, K: int, S: int, use_fit: bool, filtered: bool,
                 interpret: bool, row_tile: int = 512, unroll: int = UNROLL,
                 vmem_budget: int = 1_600_000,
                 pattern_block: int = PATTERN_BLOCK,
                 filter_gate: str = "pattern-any"):
        import math

        q = math.lcm(unroll, 8)
        if S % q:
            raise ValueError(f"shard size {S} must be a multiple of {q}")
        block = -(-pattern_block // q) * q
        self.pb = min(block, S)
        if S % self.pb:
            raise ValueError(
                f"shard size {S} must be a whole number of {self.pb}-blocks"
            )
        self.nblocks = S // self.pb
        self.K = K
        self.S = S
        self.use_fit = use_fit
        self.filtered = filtered
        self.interpret = interpret
        self.row_tile = row_tile
        self.vmem_budget = vmem_budget
        if filtered:
            self._kernel = _make_filter_kernel(
                K, use_fit, with_reps=False, unroll=unroll, gate=filter_gate
            )
            self._kernel_rows = _make_filter_kernel_rows(
                K, use_fit, unroll=unroll, gate=filter_gate
            )
        else:
            self._kernel = _make_table_kernel(
                K, use_fit, with_reps=False, unroll=unroll
            )
            self._kernel_rows = _make_table_kernel_rows(K, use_fit,
                                                        unroll=unroll)

    def _pad(self, payloads, lengths):
        from multithreading_string_matching_tpu.ops.pallas_window import (
            pad_tile,
        )

        return pad_tile(
            payloads, lengths, row_tile=self.row_tile, K=self.K,
            vmem_budget=self.vmem_budget,
        )

    def counts(self, words, masks, lens, payloads, lengths):
        """int32[S] totals for this shard's table block (jit/shard_map-safe;
        build order within the shard — no class permutation exists here)."""
        payloads, lengths, tn = self._pad(payloads, lengths)
        n, L = payloads.shape
        kw = self.K + (1 if self.filtered else 0)
        return pl.pallas_call(
            self._kernel,
            grid=(self.nblocks, n // tn),
            in_specs=[
                pl.BlockSpec((self.pb, kw), lambda j, i: (j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.pb, kw), lambda j, i: (j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.pb, 1), lambda j, i: (j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tn, L), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((self.pb, 1), lambda *ix: (ix[0], 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((self.S, 1), jnp.int32),
            interpret=self.interpret,
        )(words, masks, lens, payloads, lengths)[:, 0]

    def rows(self, words, masks, lens, payloads, lengths):
        """Per-row counts int32[n_padded, S] for this shard's block."""
        payloads, lengths, tn = self._pad(payloads, lengths)
        n, L = payloads.shape
        kw = self.K + (1 if self.filtered else 0)
        out = pl.pallas_call(
            self._kernel_rows,
            grid=(self.nblocks, n // tn),
            in_specs=[
                pl.BlockSpec((self.pb, kw), lambda j, i: (j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.pb, kw), lambda j, i: (j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.pb, 1), lambda j, i: (j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tn, L), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((self.pb, tn), lambda j, i: (j, i)),
            out_shape=jax.ShapeDtypeStruct((self.S, n), jnp.int32),
            interpret=self.interpret,
        )(words, masks, lens, payloads, lengths)
        return out.T  # [n, S]


class PallasTableMatcher(TileCountSurface):
    """Drop-in alternative to PallasWindowMatcher for large pattern sets:
    same count/repeat/per-row surface (TileCountSurface), pattern tables in
    SMEM instead of the instruction stream."""

    def __init__(
        self,
        wp: WindowProgram,
        row_tile: int = 512,
        interpret: bool = False,
        assume_zero_padded: bool = False,
        pattern_block: int = PATTERN_BLOCK,
        unroll: int = UNROLL,
        vmem_budget: int = 1_600_000,
        filtered: bool = False,
        filter_gate: str = "pattern-any",
    ):
        self.wp = wp
        self.row_tile = row_tile
        self.unroll = unroll
        self.vmem_budget = vmem_budget
        self.interpret = interpret
        self.num_unique = int(wp.pat_words.shape[0])
        self.pattern_block = pattern_block
        self.filtered = filtered
        self._assume_zero_padded = assume_zero_padded
        self.classes, self._inv, self.use_fit = self._partition(
            wp, pattern_block, unroll, filtered, assume_zero_padded
        )
        use_fit = self.use_fit
        if filtered:
            mk = functools.partial(_make_filter_kernel, gate=filter_gate)
            mk_rows = functools.partial(
                _make_filter_kernel_rows, gate=filter_gate
            )
        else:
            mk, mk_rows = _make_table_kernel, _make_table_kernel_rows
        self._kernels = {
            c.K: mk(c.K, use_fit, with_reps=False, unroll=unroll)
            for c in self.classes
        }
        self._kernels_rep = {
            c.K: mk(c.K, use_fit, with_reps=True, unroll=unroll)
            for c in self.classes
        }
        self._kernels_rows = {
            c.K: mk_rows(c.K, use_fit, unroll=unroll)
            for c in self.classes
        }
        self._maxK = max(c.K for c in self.classes)

        self._build_tile_jits()

    @staticmethod
    def _partition(wp: WindowProgram, pattern_block: int, unroll: int,
                   filtered: bool, assume_zero_padded: bool):
        """(classes, inv, use_fit): partition unique patterns by word count
        (stable, so the sorted order is reproducible) and remember how to
        get back to build order — the ONE table-construction path shared by
        __init__ and swap_tables (geometry checks compare their outputs)."""
        use_fit = (not assume_zero_padded) or any(
            0 in p for p in wp.unique_patterns
        )
        kcounts = np.asarray([-(-int(l) // 4) for l in wp.pat_lens])
        order = np.argsort(kcounts, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)

        fwords = fmasks = None
        if filtered:
            fwords, fmasks = _filter_words(wp)

        classes = []
        sorted_k = kcounts[order]
        for K in sorted(set(sorted_k.tolist())):
            sel = order[sorted_k == K]
            classes.append(
                _PatternClass(
                    int(K),
                    wp.pat_words[sel],
                    wp.pat_masks[sel],
                    wp.pat_lens[sel],
                    pattern_block,
                    unroll=unroll,
                    fwords=fwords[sel] if filtered else None,
                    fmasks=fmasks[sel] if filtered else None,
                )
            )
        return classes, jnp.asarray(inv.astype(np.int32)), use_fit

    def _pad_tile(self, payloads, lengths):
        # Budget swept on v5e: 2.75M (the unrolled kernel's) spills registers
        # with 16 concurrent accumulator chains (0.98 GB/s on the fixture);
        # 1.6M avoids the spill (4.8 GB/s) and 1.2M gains nothing more.
        from multithreading_string_matching_tpu.ops.pallas_window import (
            pad_tile,
        )

        return pad_tile(
            payloads, lengths, row_tile=self.row_tile,
            K=self._maxK, vmem_budget=self.vmem_budget,
        )

    def _staged_tables(self):
        """(inv, per-class (words, masks, lens)) as DEVICE arrays — passed
        to the jitted wrappers as ARGUMENTS (not closure constants), so a
        same-geometry :meth:`swap_tables` hits the compiled executable."""
        return (
            self._inv,
            tuple(
                (jnp.asarray(c.words), jnp.asarray(c.masks),
                 jnp.asarray(c.lens))
                for c in self.classes
            ),
        )

    def _class_call(self, c: _PatternClass, tabs, kernel, payloads, lengths,
                    tn, reps=None):
        n, L = payloads.shape
        if reps is None:
            grid = (c.nblocks, n // tn)
            pat_ix = lambda j, i: (j, 0)
            vec_ix = lambda j, i: (i, 0)
        else:
            grid = (c.nblocks, reps, n // tn)
            pat_ix = lambda j, r, i: (j, 0)
            vec_ix = lambda j, r, i: (i, 0)
        kw = c.words.shape[1]  # K, or K+1 with the packed filter column
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((c.pb, kw), pat_ix, memory_space=pltpu.SMEM),
                pl.BlockSpec((c.pb, kw), pat_ix, memory_space=pltpu.SMEM),
                pl.BlockSpec((c.pb, 1), pat_ix, memory_space=pltpu.SMEM),
                pl.BlockSpec((tn, L), vec_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), vec_ix, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c.pb, 1), lambda *ix: (ix[0], 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((c.nblocks * c.pb, 1), jnp.int32),
            interpret=self.interpret,
        )(tabs[0], tabs[1], tabs[2], payloads, lengths)

    def _resolve_tables(self, tables):
        return self._tables_dev if tables is None else tables

    def _one_tile(self, payloads, lengths, reps=None, tables=None):
        """Counts in SORTED-unique order, concatenated across classes."""
        _, class_tabs = self._resolve_tables(tables)
        payloads, lengths, tn = self._pad_tile(payloads, lengths)
        outs = []
        for c, tabs in zip(self.classes, class_tabs):
            kern = self._kernels[c.K] if reps is None else self._kernels_rep[c.K]
            out = self._class_call(c, tabs, kern, payloads, lengths, tn,
                                   reps=reps)
            outs.append(out[: c.num, 0])
        return jnp.concatenate(outs)

    def count_tile_unique(self, payloads, lengths, tables=None):
        """Counts in BUILD (unique-pattern) order for one tile: ``_one_tile``
        concatenates word-count classes in sorted order, so the inverse
        permutation must be applied before any caller mixes these counts
        with build-order data (same contract as PallasWindowMatcher)."""
        inv, _ = self._resolve_tables(tables)
        return jnp.take(
            self._one_tile(payloads, lengths, tables=tables), inv
        )

    def _tile_repeated_unique(self, payloads, lengths, reps: int,
                              tables=None):
        inv, _ = self._resolve_tables(tables)
        return jnp.take(
            self._one_tile(payloads, lengths, reps=reps, tables=tables), inv
        )

    def _one_tile_rows(self, payloads, lengths, tables=None):
        inv, class_tabs = self._resolve_tables(tables)
        payloads, lengths, tn = self._pad_tile(payloads, lengths)
        n, L = payloads.shape
        outs = []
        for c, tabs in zip(self.classes, class_tabs):
            kw = c.words.shape[1]
            out = pl.pallas_call(
                self._kernels_rows[c.K],
                grid=(c.nblocks, n // tn),
                in_specs=[
                    pl.BlockSpec((c.pb, kw), lambda j, i: (j, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((c.pb, kw), lambda j, i: (j, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((c.pb, 1), lambda j, i: (j, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((tn, L), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((c.pb, tn), lambda j, i: (j, i)),
                out_shape=jax.ShapeDtypeStruct((c.nblocks * c.pb, n), jnp.int32),
                interpret=self.interpret,
            )(tabs[0], tabs[1], tabs[2], payloads, lengths)
            outs.append(out[: c.num])
        return jnp.take(jnp.concatenate(outs), inv, axis=0).T  # [n, U]

    def swap_tables(self, wp: WindowProgram) -> None:
        """Replace the pattern set IN PLACE without recompiling.

        The kernels read pattern tables from SMEM and the jitted wrappers
        take them as arguments, so a new set with the SAME GEOMETRY (same
        word-count classes with the same padded sizes, same unique count,
        same use_fit/filter configuration) reuses every compiled
        executable — rule-push latency is one host table build plus one
        h2d upload of a few KB, not a 4-200 s compile.  Raises ValueError
        when the geometry differs (callers fall back to building a fresh
        matcher)."""
        classes, inv, use_fit = self._partition(
            wp, self.pattern_block, self.unroll, self.filtered,
            self._assume_zero_padded,
        )
        if use_fit != self.use_fit:
            raise ValueError(
                "swap_tables: fit-mask mode differs (NUL patterns changed)"
            )
        if len(classes) != len(self.classes) or any(
            (a.K, a.pb, a.nblocks, a.num) != (b.K, b.pb, b.nblocks, b.num)
            for a, b in zip(classes, self.classes)
        ):
            raise ValueError("swap_tables: pattern-set geometry differs")
        self.wp = wp
        self.classes = classes
        self._inv = inv
        self.num_unique = int(wp.pat_words.shape[0])
        self._tables_dev = self._staged_tables()
        self._dup = jnp.asarray(wp.dup_map)
        # The SHARDED wrappers (parallel/mesh.py) trace count_tile_unique
        # with tables=None, baking the tables as constants into jitted
        # shard_maps cached ON this object — drop those caches (and the
        # interpret-flag sibling built from the old tables) so the next
        # sharded call re-traces against the new set.  Sharded paths thus
        # pay a re-trace/compile on swap; the single-device serving path
        # keeps the zero-recompile guarantee.
        for attr in ("_sharded_jit_cache", "_sharded_rows_jit_cache",
                     "_sharded_summary_jit_cache", "_alt_interpret"):
            if hasattr(self, attr):
                delattr(self, attr)

    # count_tiles / count_tiles_repeated / count_tiles_per_row /
    # count_tile_summary: inherited from TileCountSurface.
