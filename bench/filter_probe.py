"""Why is the filter/verify gate not paying?  Direct gate-mode probes.

The round-4 crossover run showed filtered ≈ 0.62-0.94x the plain table
kernel even where 15/16 unroll groups should skip verification entirely.
Hypotheses this probe discriminates:

  H1 Mosaic speculates the (pure) verify compute out of the ``pl.when``
     region — then filter == table + stage-1 overhead everywhere, even
     when NO group ever fires.
  H2 the 15-deep dependent OR chain + scalar reduce serializes the VPU —
     then gate='none' (filter ops, no branch) ~= gate='group'.
  H3 the skip works but stage 1 really costs ~verify — then the
     zero-plant corpus shows a big win and the planted one does not.

Two corpora: 'plant' (2% packets contain pattern 0 — every row tile fires
group 0) and 'clean' (no pattern present — no group should ever fire).
Gate modes none/group/pattern at U = 256 and 1024.

Run on the TPU:  python bench/filter_probe.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
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
    from multithreading_string_matching_tpu.ops.pallas_table import (
        PallasTableMatcher,
    )

    corpora = {}
    for name, rate in (("plant", 0.02), ("clean", 0.0)):
        path = pathlib.Path(f"/tmp/msm_fprobe_{name}.pcap")
        if not path.exists():
            import os

            tmp = path.with_suffix(f".{os.getpid()}.tmp")
            synth_udp_pcap(tmp, 5_000, payload_len=1024, payload_len_jitter=256,
                           patterns=[b"pt000000"], plant_rate=rate, seed=4)
            os.replace(tmp, path)
        corpora[name] = extract_payloads(read_pcap(path), "udp")

    for U in (256, 1024, 3072):
        pats = [b"pt%06d" % i for i in range(U)]
        m = Matcher(pats)
        for cname, batch in corpora.items():
            prep = m.prepare_batch(batch, packed="auto")
            nbytes = batch.total_payload_bytes
            reps = max(20, 20_000 // U)
            row = {"patterns": U, "corpus": cname}

            def measure(matcher):
                np.asarray(matcher.count_tiles_repeated(prep.tiles, reps))
                t0 = time.perf_counter()
                np.asarray(matcher.count_tiles_repeated(prep.tiles, reps))
                return (time.perf_counter() - t0) / reps

            plain = PallasTableMatcher(m.window, assume_zero_padded=True)
            row["table"] = round(nbytes / measure(plain) / 1e9, 3)
            for gate in ("none", "group", "pattern", "hier"):
                f = PallasTableMatcher(
                    m.window, assume_zero_padded=True, filtered=True,
                    filter_gate=gate,
                )
                row[f"filter_{gate}"] = round(nbytes / measure(f) / 1e9, 3)
            for un in (8, 32):
                f = PallasTableMatcher(
                    m.window, assume_zero_padded=True, filtered=True,
                    filter_gate="pattern", unroll=un,
                )
                row[f"filter_pattern_u{un}"] = round(
                    nbytes / measure(f) / 1e9, 3
                )
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
