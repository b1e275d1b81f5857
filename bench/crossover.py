"""Pattern-count scaling: where the O(U) compare chain meets the O(1) DFA.

The pallas/window engines do ~U masked word compares per byte position; the
AC scan does one table gather per byte regardless of pattern count.
``Matcher(engine="auto")`` switches at >32k pattern words (api.py) — this
harness measures both engines across synthetic pattern-set sizes so that
threshold rests on data, not arithmetic.  Patterns are length-8 (2 words),
mutually non-matching, over a synthetic ~10 MB corpus.

Run on the TPU:  python bench/crossover.py
Each pattern-set size compiles its own specialized kernel (the pattern set
is baked in as immediates), so the first run pays several remote compiles.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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
    from multithreading_string_matching_tpu.ops.scan import count_matches_ac

    corpus = pathlib.Path("/tmp/msm_crossover.pcap")
    if not corpus.exists():
        synth_udp_pcap(corpus, 10_000, payload_len=1024, payload_len_jitter=256,
                       patterns=[b"pt000000"], plant_rate=0.02, seed=3)
    batch = extract_payloads(read_pcap(corpus), "udp")
    nbytes = batch.total_payload_bytes

    for U in (16, 64, 256, 768):
        pats = [b"pt%06d" % i for i in range(U)]
        m = Matcher(pats)
        prep = m.prepare_batch(batch, packed="auto")

        reps = max(20, 40_960 // U)
        t0 = time.perf_counter()
        np.asarray(m.pallas.count_tiles_repeated(prep.tiles, reps))  # compile
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(m.pallas.count_tiles_repeated(prep.tiles, reps))
        pallas_dt = (time.perf_counter() - t0) / reps

        payloads = jnp.asarray(batch.payloads, jnp.uint8)
        lengths = jnp.asarray(batch.lengths, jnp.int32)

        # AC: chained data-dependent repeats inside one executable (DESIGN §7)
        def make_out(dep):
            return count_matches_ac(
                m.cac, payloads, lengths + dep, dup_map=m.ac.dup_map
            )

        ac_reps = 5

        @jax.jit
        def run_ac():
            def body(_, total):
                dep = jnp.minimum(total.sum(), 0).astype(jnp.int32)
                return total + make_out(dep)
            return jax.lax.fori_loop(
                0, ac_reps, body, jnp.zeros((U,), jnp.int32)
            )

        np.asarray(run_ac())
        t0 = time.perf_counter()
        np.asarray(run_ac())
        ac_dt = (time.perf_counter() - t0) / ac_reps

        print(json.dumps({
            "patterns": U,
            "pattern_words": U * 2,
            "pallas_bytes_per_sec": round(nbytes / pallas_dt, 1),
            "ac_bytes_per_sec": round(nbytes / ac_dt, 1),
            "pallas_over_ac": round(ac_dt / pallas_dt, 2),
            "pallas_compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
