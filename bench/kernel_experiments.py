"""Isolate the cost components of the DFA byte-scan on the TPU.

Variants (same shapes, same data):
  full        — transition gather + [N,E] hist accumulate (production kernel)
  no-hist     — transition gather only (final states out)   -> gather cost
  hist-only   — fake arithmetic transition + hist           -> hist cost
  traj        — transition gather + [L,N] trajectory out    -> gather + IO
  traj+bincount — trajectory out, then scatter-add histogram outside the scan
  unroll8     — gather + hist, 8 bytes per scan step (less scan overhead)

Run:  python bench/kernel_experiments.py [N] [L] [reps]

Measurement caveat (see CLAUDE.md / DESIGN.md §7): timeit() repeats
identical fetched calls, which is only honest when the measured kernel is
much slower than the ~28 ms remote round-trip — true for these >=40 ms AC
variants (error <2 ms/call), NOT for sub-ms kernels.  Sub-ms comparisons
must use the chained-repeat pattern (bench/engines.py `chained`,
PallasWindowMatcher.count_tiles_repeated).
"""

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from multithreading_string_matching_tpu.io.patterns import load_patterns
from multithreading_string_matching_tpu.models.aho_corasick import AhoCorasick


def timeit(fn, cols, lengths, reps=10):
    # FETCH every rep and make each rep's arguments DATA-DEPEND on the
    # previous result: on the remote tunnel block_until_ready returns early
    # and identical-argument dispatches can be deduplicated (CLAUDE.md), so
    # an un-fetched same-args loop can measure nothing.  The per-rep fetch
    # adds one ~28 ms round-trip uniformly to every variant; the official
    # bench (bench.py) instead chains repeats inside one executable.
    np.asarray(fn(cols, lengths))  # warm/compile
    t0 = time.perf_counter()
    for i in range(reps):
        # VALUE-distinct arguments per rep (one payload byte varies):
        # value-identical dispatches can be served from cache through the
        # tunnel.  The one-byte difference perturbs counts, not cost —
        # these are timing experiments, not correctness checks.  Fetch ONE
        # element, not the whole output: variants return wildly different
        # shapes (traj's [L, n] is ~21 MB vs full's [E]) and a full fetch
        # would add non-uniform d2h transfer to the comparison.
        c = cols.at[0, 0].set(jnp.uint8(i % 251))
        np.asarray(fn(c, lengths).ravel()[:1])
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 13824
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    pats = load_patterns("/root/reference/strings.txt")
    ac = AhoCorasick.build(pats)
    goto_flat = jnp.asarray(ac.goto.reshape(-1))
    emit_ids = jnp.asarray(ac.emitting_states)
    dead = ac.dead_state
    S = ac.goto.shape[0]
    E = emit_ids.shape[0]

    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, size=(n, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(n, L, np.int32))
    cols = payloads.T
    states0 = jnp.zeros((n,), jnp.int32)
    positions = jnp.arange(L, dtype=jnp.int32)

    nbytes = n * L

    @jax.jit
    def full(cols, lengths):
        def step(carry, xs):
            st, hist = carry
            byte, pos = xs
            nxt = jnp.take(goto_flat, st * 256 + byte.astype(jnp.int32), axis=0)
            nxt = jnp.where(pos < lengths, nxt, dead)
            hist = hist + (nxt[:, None] == emit_ids[None, :]).astype(jnp.int32)
            return (nxt, hist), None

        init = (states0, jnp.zeros((n, E), jnp.int32))
        (st, hist), _ = jax.lax.scan(step, init, (cols, positions))
        return hist.sum(axis=0)

    @jax.jit
    def no_hist(cols, lengths):
        def step(st, xs):
            byte, pos = xs
            nxt = jnp.take(goto_flat, st * 256 + byte.astype(jnp.int32), axis=0)
            nxt = jnp.where(pos < lengths, nxt, dead)
            return nxt, None

        st, _ = jax.lax.scan(step, states0, (cols, positions))
        return st

    @jax.jit
    def hist_only(cols, lengths):
        def step(carry, xs):
            st, hist = carry
            byte, pos = xs
            nxt = (st + byte.astype(jnp.int32)) % S  # fake transition, no gather
            hist = hist + (nxt[:, None] == emit_ids[None, :]).astype(jnp.int32)
            return (nxt, hist), None

        init = (states0, jnp.zeros((n, E), jnp.int32))
        (st, hist), _ = jax.lax.scan(step, init, (cols, positions))
        return hist.sum(axis=0)

    @jax.jit
    def traj(cols, lengths):
        def step(st, xs):
            byte, pos = xs
            nxt = jnp.take(goto_flat, st * 256 + byte.astype(jnp.int32), axis=0)
            nxt = jnp.where(pos < lengths, nxt, dead)
            return nxt, nxt

        _, ys = jax.lax.scan(step, states0, (cols, positions))
        return ys

    @jax.jit
    def traj_bincount(cols, lengths):
        ys = traj(cols, lengths)
        visits = jnp.zeros((S + 1,), jnp.int32).at[ys.reshape(-1)].add(1)
        return visits

    K = 8

    @jax.jit
    def unroll8(cols, lengths):
        # cols reshaped [L//K, K, N]
        c = cols.reshape(L // K, K, n)
        p = positions.reshape(L // K, K)

        def step(carry, xs):
            st, hist = carry
            bytes_k, pos_k = xs
            for i in range(K):
                nxt = jnp.take(
                    goto_flat, st * 256 + bytes_k[i].astype(jnp.int32), axis=0
                )
                st = jnp.where(pos_k[i] < lengths, nxt, dead)
                hist = hist + (st[:, None] == emit_ids[None, :]).astype(jnp.int32)
            return (st, hist), None

        init = (states0, jnp.zeros((n, E), jnp.int32))
        (st, hist), _ = jax.lax.scan(step, init, (c, p))
        return hist.sum(axis=0)

    print(f"N={n} L={L} S={S} E={E} bytes={nbytes} device={jax.devices()[0]}")
    for name, fn in [
        ("full", full),
        ("no-hist", no_hist),
        ("hist-only", hist_only),
        ("traj", traj),
        ("traj+bincount", traj_bincount),
        ("unroll8", unroll8),
    ]:
        try:
            t = timeit(fn, cols, lengths, reps=reps)
            print(f"{name:14s} {t*1e3:8.3f} ms   {nbytes/t/1e9:8.3f} GB/s")
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
