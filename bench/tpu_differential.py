"""On-chip differential soak for the table/filter Pallas kernels.

Interpret-mode tests prove the kernel SEMANTICS; this harness exercises
the real Mosaic lowering on the TPU — the thing interpret mode cannot
witness (the round-4 filter work found two Mosaic-only behaviors: the
SMEM-operand compile blowup and pl.when regions executing despite false
flags).  The trick that makes an on-chip soak affordable: pattern tables
are DATA to these kernels, so cases reuse one compiled executable per
(payload shape, pattern GEOMETRY) — the harness fixes both and randomizes
all content, paying ~3 compiles total for hundreds of cases.

Each case: random pattern bytes over a small alphabet (forced collisions
and overlaps), random payloads with planted occurrences, counts from the
filtered kernel vs the plain table kernel vs a numpy oracle; per-row
variant sampled every 8th case.

Run on the TPU:  python bench/tpu_differential.py [cases] [seed]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np


def oracle_counts(payloads, lengths, pats):
    texts = [payloads[i, : lengths[i]].tobytes() for i in range(len(lengths))]
    out = []
    for p in pats:
        c = 0
        for t in texts:
            start = 0
            while True:
                i = t.find(p, start)
                if i < 0:
                    break
                c += 1
                start = i + 1
        out.append(c)
    return np.array(out)


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multithreading_string_matching_tpu.ops.pallas_table import (
        PallasTableMatcher,
    )
    from multithreading_string_matching_tpu.ops.window import WindowProgram

    cases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)

    # Fixed geometry per run: pattern lengths (mixed word-count classes
    # including sub-word), payload tile shape.  Content re-rolls per case;
    # ODD seeds pick an alternate geometry (uniform-length + wide tile) so
    # different runs witness different Mosaic specializations.
    if seed % 2:
        PAT_LENS = [8] * 64 + [4] * 16
        N, L = 32, 640
    else:
        PAT_LENS = [2, 3, 4, 4, 5, 7, 8, 8, 8, 9, 11, 12] * 4  # 48 patterns
        N, L = 64, 384
    t0 = time.time()
    ok = 0
    for case in range(cases):
        nul = case % 5 == 4  # every 5th case exercises the fit path
        lo = 0 if nul else 1
        pats = []
        seen = set()
        for ln in PAT_LENS:
            while True:
                p = bytes(rng.integers(lo, 5, size=ln).tolist())
                if p not in seen:
                    seen.add(p)
                    pats.append(p)
                    break
        wp = WindowProgram.build(pats)
        payloads = rng.integers(lo, 5, size=(N, L)).astype(np.uint8)
        lengths = rng.integers(0, L + 1, size=N).astype(np.int32)
        for _ in range(8):  # plant occurrences (some split/overlapping)
            p = pats[int(rng.integers(0, len(pats)))]
            r = int(rng.integers(0, N))
            if lengths[r] > len(p):
                off = int(rng.integers(0, lengths[r] - len(p)))
                payloads[r, off : off + len(p)] = np.frombuffer(p, np.uint8)
        cols = np.arange(L)[None, :]
        payloads = np.where(cols < lengths[:, None], payloads, 0).astype(np.uint8)

        want = oracle_counts(payloads, lengths, pats)
        plain = PallasTableMatcher(wp, assume_zero_padded=True)
        filt = PallasTableMatcher(wp, assume_zero_padded=True, filtered=True)
        got_p = np.asarray(plain.count_tiles([(payloads, lengths)]))
        got_f = np.asarray(filt.count_tiles([(payloads, lengths)]))
        assert (got_p == want).all(), (
            f"case {case}: plain != oracle\n{got_p}\n{want}"
        )
        assert (got_f == want).all(), (
            f"case {case}: filtered != oracle\n{got_f}\n{want}"
        )
        if case % 8 == 0:
            (rows_f,) = filt.count_tiles_per_row([(payloads, lengths)])
            rows_f = np.asarray(rows_f)
            assert (rows_f[:N].sum(axis=0) == want).all(), f"case {case}: rows"
            assert (rows_f[N:] == 0).all()
        ok += 1
        if ok % 25 == 0:
            print(f"{ok}/{cases} clean ({time.time()-t0:.0f}s)", flush=True)
    print(f"TPU DIFFERENTIAL CLEAN: {ok} cases, seed={seed}", flush=True)


if __name__ == "__main__":
    main()
