/* Native alignment primitives for pintron-tpu.
 *
 * The reference implements these loops in C (src/compute-alignments.c,
 * src/refine.c); this library provides the same recurrences as a small
 * shared object used by the host pipeline via ctypes.  Semantics are
 * identical to the Python fallbacks in pintron_tpu/factorize/alignments.py.
 *
 * Build: cc -O2 -fPIC -shared dp.c -o libpintron_dp.so
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define BIG (1LL << 60)

static inline int64_t min3(int64_t a, int64_t b, int64_t c) {
    int64_t m = a < b ? a : b;
    return m < c ? m : c;
}

/* K-band edit distance (compute-alignments.c:319-453 semantics).
 * seq1 must be the longer sequence; callers handle the swap/shortcuts.
 * Returns the final band cell value M[n+k-m]. */
int64_t kband_core(const char *seq1, int64_t n, const char *seq2, int64_t m,
                   int64_t k) {
    int64_t w = 2 * k + 1;
    int64_t *M1 = (int64_t *)malloc(w * sizeof(int64_t));
    int64_t *M2 = (int64_t *)malloc(w * sizeof(int64_t));
    int64_t r, c, d, result;
    if (!M1 || !M2) { free(M1); free(M2); return -1; }
    for (c = 0; c < w; c++) M1[c] = BIG;
    for (c = 0; c <= k; c++) M1[k + c] = c;
    for (c = 0; c < w; c++) M2[c] = k + 1;

    for (r = 1; r <= k && r <= m; r++) {
        M2[k - r] = r;
        for (c = 1; c < r + k; c++) {
            d = M1[k - r + c] + (seq1[c - 1] != seq2[r - 1]);
            if (M2[k - r + c - 1] + 1 < d) d = M2[k - r + c - 1] + 1;
            if (M1[k - r + c + 1] + 1 < d) d = M1[k - r + c + 1] + 1;
            M2[k - r + c] = d;
        }
        d = M1[2 * k] + (seq1[r + k - 1] != seq2[r - 1]);
        if (M2[2 * k - 1] + 1 < d) d = M2[2 * k - 1] + 1;
        M2[2 * k] = d;
        { int64_t *t = M1; M1 = M2; M2 = t; }
    }

    for (r = k + 1; r <= n - k && r <= m; r++) {
        M2[0] = M1[0] + (seq1[r - k - 1] != seq2[r - 1]);
        if (M1[1] + 1 < M2[0]) M2[0] = M1[1] + 1;
        for (c = r + 1 - k; c < r + k; c++) {
            d = M1[c + k - r] + (seq1[c - 1] != seq2[r - 1]);
            if (M2[c + k - r - 1] + 1 < d) d = M2[c + k - r - 1] + 1;
            if (M1[c + k - r + 1] + 1 < d) d = M1[c + k - r + 1] + 1;
            M2[c + k - r] = d;
        }
        d = M1[2 * k] + (seq1[r + k - 1] != seq2[r - 1]);
        if (M2[2 * k - 1] + 1 < d) d = M2[2 * k - 1] + 1;
        M2[2 * k] = d;
        { int64_t *t = M1; M1 = M2; M2 = t; }
    }

    for (r = n + 1 - k; r <= m; r++) {
        if (r < k + 1) continue;
        M2[0] = M1[0] + (seq1[r - k - 1] != seq2[r - 1]);
        if (M1[1] + 1 < M2[0]) M2[0] = M1[1] + 1;
        for (c = r + 1 - k; c <= n; c++) {
            d = M1[c + k - r] + (seq1[c - 1] != seq2[r - 1]);
            if (M2[c + k - r - 1] + 1 < d) d = M2[c + k - r - 1] + 1;
            if (M1[c + k - r + 1] + 1 < d) d = M1[c + k - r + 1] + 1;
            M2[c + k - r] = d;
        }
        { int64_t *t = M1; M1 = M2; M2 = t; }
    }

    result = M1[n + k - m];
    free(M1); free(M2);
    return result;
}

/* Global alignment (compute-alignments.c:85-207 semantics): unit cost,
 * N wildcards, direction preference diag > up > left with strict
 * improvement.  Fills dirs (n+1)x(m+1) row-major int8 and returns the
 * final score.  Caller runs the traceback. */
int64_t nw_align(const char *est, int64_t n, const char *gen, int64_t m,
                 int8_t *dirs) {
    int64_t *prev = (int64_t *)malloc((m + 1) * sizeof(int64_t));
    int64_t *cur = (int64_t *)malloc((m + 1) * sizeof(int64_t));
    int64_t i, j, score;
    if (!prev || !cur) { free(prev); free(cur); return -1; }
    for (j = 0; j <= m; j++) prev[j] = j;
    /* no memset: the traceback only reads dirs[i][j] for i,j >= 1,
     * all of which are written below */
    for (i = 1; i <= n; i++) {
        char e = est[i - 1];
        int ewild = (e == 'n' || e == 'N');
        cur[0] = i;
        for (j = 1; j <= m; j++) {
            char g = gen[j - 1];
            int match = (e == g) || ewild || g == 'n' || g == 'N';
            int64_t v = prev[j - 1] + (match ? 0 : 1);
            int8_t d = 0;
            if (prev[j] + 1 < v) { v = prev[j] + 1; d = 1; }
            if (cur[j - 1] + 1 < v) { v = cur[j - 1] + 1; d = 2; }
            cur[j] = v;
            dirs[i * (m + 1) + j] = d;
        }
        { int64_t *t = prev; prev = cur; cur = t; }
    }
    score = prev[m];
    free(prev); free(cur);
    return score;
}

/* Edit distance matrix (refine.c:50-83): rows over s2, int64 row-major
 * (l2+1)x(l1+1) output. */
void edit_matrix(const char *s1, int64_t l1, const char *s2, int64_t l2,
                 int64_t *M) {
    int64_t i, j;
    for (j = 0; j <= l1; j++) M[j] = j;
    for (i = 1; i <= l2; i++) {
        int64_t *row = M + i * (l1 + 1);
        int64_t *prev = M + (i - 1) * (l1 + 1);
        row[0] = i;
        for (j = 1; j <= l1; j++) {
            row[j] = min3(prev[j - 1] + (s1[j - 1] != s2[i - 1]),
                          prev[j] + 1, row[j - 1] + 1);
        }
    }
}
