/* CPU serial KMP baseline for bench.py — the "serial.c-equivalent" cost of
 * the reference's hot loop (per-pattern KMP over every payload) measured on
 * THIS machine, since the reference publishes no numbers (BASELINE.md).
 *
 * Own implementation (not copied from the reference): explicit-length KMP
 * with overlap counting, which is the variant-A spec the framework follows.
 *
 * Input file format (little-endian):
 *   int64 n_payloads, int64 total_bytes, int64 n_patterns
 *   int32 payload_len[n_payloads]
 *   uint8 payload_bytes[total_bytes]           (concatenated)
 *   int32 pattern_len[n_patterns]
 *   uint8 pattern_bytes[sum(pattern_len)]
 *
 * Output: one line "elapsed_s total_matches bytes_scanned".
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

static void build_failure(const uint8_t *pat, int m, int32_t *fail) {
    fail[0] = 0;
    int k = 0;
    for (int q = 1; q < m; q++) {
        while (k > 0 && pat[q] != pat[k]) k = fail[k - 1];
        if (pat[q] == pat[k]) k++;
        fail[q] = k;
    }
}

static long long kmp_count(const uint8_t *text, long long n,
                           const uint8_t *pat, int m, const int32_t *fail) {
    long long hits = 0;
    int q = 0;
    if (n < m) return 0;
    for (long long i = 0; i < n; i++) {
        while (q > 0 && text[i] != pat[q]) q = fail[q - 1];
        if (text[i] == pat[q]) q++;
        if (q == m) { hits++; q = fail[q - 1]; }
    }
    return hits;
}

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: %s dump.bin\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    int64_t n_payloads, total_bytes, n_patterns;
    if (fread(&n_payloads, 8, 1, f) != 1 ||
        fread(&total_bytes, 8, 1, f) != 1 ||
        fread(&n_patterns, 8, 1, f) != 1) { fprintf(stderr, "bad header\n"); return 1; }
    int32_t *plen = malloc(n_payloads * 4);
    uint8_t *bytes = malloc(total_bytes ? total_bytes : 1);
    if (fread(plen, 4, n_payloads, f) != (size_t)n_payloads ||
        (total_bytes && fread(bytes, 1, total_bytes, f) != (size_t)total_bytes)) {
        fprintf(stderr, "bad body\n"); return 1;
    }
    int32_t *mlen = malloc(n_patterns * 4);
    if (fread(mlen, 4, n_patterns, f) != (size_t)n_patterns) { fprintf(stderr, "bad patlens\n"); return 1; }
    long long pat_total = 0;
    for (int i = 0; i < n_patterns; i++) pat_total += mlen[i];
    uint8_t *pats = malloc(pat_total ? pat_total : 1);
    if (pat_total && fread(pats, 1, pat_total, f) != (size_t)pat_total) { fprintf(stderr, "bad pats\n"); return 1; }
    fclose(f);

    /* Precompute failure tables (the reference also precomputes LPS before
     * timing its match loop in the OpenMP/MPI variants). */
    int32_t **fails = malloc(n_patterns * sizeof(int32_t *));
    uint8_t **pp = malloc(n_patterns * sizeof(uint8_t *));
    long long off = 0;
    for (int i = 0; i < n_patterns; i++) {
        pp[i] = pats + off;
        fails[i] = malloc(mlen[i] * 4);
        build_failure(pp[i], mlen[i], fails[i]);
        off += mlen[i];
    }

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    long long total = 0;
    long long pos = 0;
    for (int64_t k = 0; k < n_payloads; k++) {
        for (int64_t i = 0; i < n_patterns; i++)
            total += kmp_count(bytes + pos, plen[k], pp[i], mlen[i], fails[i]);
        pos += plen[k];
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double el = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    printf("%.9f %lld %lld\n", el, total, total_bytes);
    return 0;
}
