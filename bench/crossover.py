"""Pattern-count scaling: unrolled kernel vs table kernel vs the AC DFA.

Three engines, three regimes:

- ``pallas-unrolled`` (ops/pallas_window.py): pattern words baked into the
  instruction stream — fastest per byte, but the HLO grows with the pattern
  set, so compile time is ~quadratic in total words (220 s at 1.5k words on
  the remote compiler).  Practical ceiling ~512 words; measured here only up
  to 768 patterns.
- ``pallas-table`` (ops/pallas_table.py): pattern words streamed through
  SMEM — same ~1/U throughput scaling, O(1) compile time, no ceiling until
  the AC crossover.
- ``ac`` (ops/scan.py): one transition gather per byte independent of U, but
  the gather is ~370x one compare and the table outgrows cache as U grows.

``Matcher`` picks unrolled/table at PALLAS_TABLE_WORDS and pallas/ac at 32k
words (api.py) — this harness measures all three across pattern-set sizes so
those thresholds rest on data.  Patterns are length-8 (2 words), mutually
non-matching, over a synthetic ~10 MB corpus.

Run on the TPU:  python bench/crossover.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# Unrolled-kernel compile cost explodes past this (that is the point of the
# table kernel); skip it above.  The remote compiler also hard-rejects the
# 768-pattern unrolled HLO now (HTTP 413 request-body limit on the compile
# tunnel — measured round 4), so the attempt is try/except-guarded.
UNROLLED_MAX_U = 768


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
    from multithreading_string_matching_tpu.ops.pallas_window import (
        PallasWindowMatcher,
    )
    from multithreading_string_matching_tpu.ops.scan import count_matches_ac

    corpus = pathlib.Path("/tmp/msm_crossover.pcap")
    if not corpus.exists():
        # Temp + atomic rename (bench.py's pattern): an interrupted synth
        # must not leave a truncated file that every later run trusts.
        import os

        tmp = corpus.with_suffix(f".{os.getpid()}.tmp")
        synth_udp_pcap(tmp, 10_000, payload_len=1024, payload_len_jitter=256,
                       patterns=[b"pt000000"], plant_rate=0.02, seed=3)
        os.replace(tmp, corpus)
    batch = extract_payloads(read_pcap(corpus), "udp")
    nbytes = batch.total_payload_bytes

    for U in (16, 64, 256, 768, 3072, 12288):
        pats = [b"pt%06d" % i for i in range(U)]
        m = Matcher(pats)
        prep = m.prepare_batch(batch, packed="auto")
        row = {"patterns": U, "pattern_words": U * 2}

        def measure(matcher, reps):
            t0 = time.perf_counter()
            out = np.asarray(matcher.count_tiles_repeated(prep.tiles, reps))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(matcher.count_tiles_repeated(prep.tiles, reps))
            return (time.perf_counter() - t0) / reps, compile_s, out / reps

        reps = max(20, 40_960 // U)
        table = PallasTableMatcher(m.window, assume_zero_padded=True)
        t_dt, t_compile, t_counts = measure(table, reps)
        row["table_bytes_per_sec"] = round(nbytes / t_dt, 1)
        row["table_compile_s"] = round(t_compile, 1)

        # Filter/verify variant: same tables, ~2-op filter stage gating the
        # full chain per pattern — the round-4 answer to the ~1/U wall.
        filt = PallasTableMatcher(
            m.window, assume_zero_padded=True, filtered=True
        )
        f_dt, f_compile, f_counts = measure(filt, reps)
        row["filter_bytes_per_sec"] = round(nbytes / f_dt, 1)
        row["filter_compile_s"] = round(f_compile, 1)
        row["filter_over_table"] = round(t_dt / f_dt, 2)
        assert (f_counts == t_counts).all(), "filter != table counts"

        if U <= UNROLLED_MAX_U:
            try:
                unrolled = PallasWindowMatcher(m.window, assume_zero_padded=True)
                u_dt, u_compile, u_counts = measure(unrolled, reps)
                row["unrolled_bytes_per_sec"] = round(nbytes / u_dt, 1)
                row["unrolled_compile_s"] = round(u_compile, 1)
                assert (u_counts == t_counts).all(), "table != unrolled counts"
            except Exception as e:  # compile-tunnel body limit at large U
                row["unrolled_error"] = f"{type(e).__name__}: {str(e)[:80]}"

        payloads = jnp.asarray(batch.payloads, jnp.uint8)
        lengths = jnp.asarray(batch.lengths, jnp.int32)

        # AC: chained data-dependent repeats inside one executable (DESIGN §7)
        ac_reps = 5

        @jax.jit
        def run_ac():
            def body(_, total):
                dep = jnp.minimum(total.sum(), 0).astype(jnp.int32)
                return total + count_matches_ac(
                    m.cac, payloads, lengths + dep, dup_map=m.ac.dup_map
                )
            return jax.lax.fori_loop(
                0, ac_reps, body, jnp.zeros((U,), jnp.int32)
            )

        try:
            ac_counts = np.asarray(run_ac())
            assert (ac_counts == np.asarray(t_counts)[m.window.dup_map] * ac_reps).all() or \
                (ac_counts / ac_reps == np.asarray(t_counts)[m.window.dup_map]).all(), \
                "ac != table counts"
            t0 = time.perf_counter()
            np.asarray(run_ac())
            ac_dt = (time.perf_counter() - t0) / ac_reps
            row["ac_bytes_per_sec"] = round(nbytes / ac_dt, 1)
            row["table_over_ac"] = round(ac_dt / t_dt, 2)
        except Exception as e:
            # At ~12k patterns the AC goto table is a ~100 MB inline HLO
            # constant — past the compile tunnel's request-body limit.
            row["ac_error"] = f"{type(e).__name__}: {str(e)[:80]}"

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
