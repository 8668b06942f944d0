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

/* Longest common factor DP (factorization-refinement.c:253-316 semantics:
 * N wildcards always match; first strictly-greater maximum wins, with the
 * earliest i2 inside that row).  Writes occ1/occ2, returns plen. */
int64_t lcf_dp(const char *s1, int64_t l1, const char *s2, int64_t l2,
               int64_t *occ1, int64_t *occ2) {
    int64_t *prev, *cur, *tmp;
    int64_t i1, i2, plen = 0;
    *occ1 = 0; *occ2 = 0;
    if (l1 == 0 || l2 == 0) return 0;
    prev = (int64_t *)calloc(l2, sizeof(int64_t));
    cur = (int64_t *)calloc(l2, sizeof(int64_t));
    if (!prev || !cur) { free(prev); free(cur); return -1; }
    for (i1 = 0; i1 < l1; i1++) {
        char c1 = s1[i1];
        int w1 = (c1 == 'n' || c1 == 'N');
        int64_t row_max = 0, row_arg = 0;
        for (i2 = 0; i2 < l2; i2++) {
            char c2 = s2[i2];
            int match = (c1 == c2) || w1 || c2 == 'n' || c2 == 'N';
            int64_t v = match ? ((i2 > 0 ? prev[i2 - 1] : 0) + 1) : 0;
            cur[i2] = v;
            if (v > row_max) { row_max = v; row_arg = i2; }
        }
        if (row_max > plen) {
            plen = row_max;
            *occ1 = i1 + 1 - plen;
            /* earliest i2 achieving the row maximum */
            for (i2 = 0; i2 < l2; i2++)
                if (cur[i2] == row_max) { row_arg = i2; break; }
            *occ2 = row_arg + 1 - plen;
        }
        tmp = prev; prev = cur; cur = tmp;
    }
    free(prev); free(cur);
    return plen;
}

/* MatInspector BPS sliding search (classify-intron.c:575-663 semantics).
 * pwm: 4 rows x L columns of weighted frequencies; cv: L consensus
 * weights; den = sum(cv*max).  Windows of 12 chars starting at
 * start_w..end_w (chars past the sequence end read as index 3, matching
 * the host fallback).  Later positions win ties (sb >= score).
 * Returns best position, stores score. */
int64_t bps_search(const char *seq, int64_t len, const double *pwm,
                   int64_t L, const double *cv, double den,
                   int64_t start_w, int64_t end_w, double *out_score) {
    static int base_idx[256];
    static int init_done = 0;
    int64_t i, j;
    double score = 0.0;
    int64_t best = -1;
    int first = 1;
    if (!init_done) {
        for (i = 0; i < 256; i++) base_idx[i] = 3;
        base_idx['A'] = base_idx['a'] = 0;
        base_idx['C'] = base_idx['c'] = 1;
        base_idx['G'] = base_idx['g'] = 2;
        base_idx['T'] = base_idx['t'] = 3;
        base_idx['N'] = base_idx['n'] = 0;
        init_done = 1;
    }
    for (i = start_w; i <= end_w; i++) {
        double num = 0.0;
        for (j = 0; j < L; j++) {
            int idx;
            if (i + j < len) idx = base_idx[(unsigned char)seq[i + j]];
            else idx = 3;   /* '\0' beyond the window -> fallback row */
            num += pwm[idx * L + j];
        }
        {
            double sb = num / den;
            if (first || sb >= score) { score = sb; best = i; first = 0; }
        }
    }
    *out_score = score;
    return best;
}

/* 3-matrix gap alignment fill (refine-intron.c:623-806 semantics; see
 * pintron_tpu/factorize/gap_align.py for the direction-update chains).
 * Fills the three (n+1)x(m+1) int8 direction matrices and the final
 * L/G/R values at (n, m). */
void gap_align_fill(const char *est, int64_t n, const char *gen, int64_t m,
                    int8_t *Ldir, int8_t *Gdir, int8_t *Rdir,
                    int64_t *finals) {
    int64_t *Lprev = (int64_t *)calloc(m + 1, sizeof(int64_t));
    int64_t *Lcur = (int64_t *)calloc(m + 1, sizeof(int64_t));
    int64_t *Gcur = (int64_t *)calloc(m + 1, sizeof(int64_t));
    int64_t *Rprev = (int64_t *)calloc(m + 1, sizeof(int64_t));
    int64_t *Rcur = (int64_t *)calloc(m + 1, sizeof(int64_t));
    int64_t *Lrows = (int64_t *)malloc((n + 1) * (m + 1) * sizeof(int64_t));
    int64_t *Grows = (int64_t *)malloc((n + 1) * (m + 1) * sizeof(int64_t));
    int64_t i, j, *tmp;
    if (!Lprev || !Lcur || !Gcur || !Rprev || !Rcur || !Lrows || !Grows) {
        finals[0] = finals[1] = finals[2] = -(1LL << 40);
        goto done;
    }
    for (j = 0; j <= m; j++) { Lrows[j] = 0; Grows[j] = 0; }
    for (i = 1; i <= n; i++) {
        char e = est[i - 1];
        int ew = (e == 'n' || e == 'N');
        Lcur[0] = 0;
        Gcur[0] = 0;
        for (j = 1; j <= m; j++) {
            char g = gen[j - 1];
            int match = (e == g) || ew || g == 'n' || g == 'N';
            int64_t diag = Lprev[j - 1] + (match ? 1 : -1);
            int64_t up = Lprev[j] - 1;
            int64_t left = Lcur[j - 1] - 1;
            int64_t v = diag; int8_t d = 0;
            if (up > v) { v = up; d = 1; }
            if (left > v) { v = left; d = 2; }
            Lcur[j] = v;
            Ldir[i * (m + 1) + j] = d;
            /* G matrix uses L's current row */
            if (Gcur[j - 1] < Lcur[j - 1]) {
                Gcur[j] = Lcur[j - 1];
                Gdir[i * (m + 1) + j] = -2;
            } else {
                Gcur[j] = Gcur[j - 1];
                Gdir[i * (m + 1) + j] = 2;
            }
        }
        memcpy(Lrows + i * (m + 1), Lcur, (m + 1) * sizeof(int64_t));
        memcpy(Grows + i * (m + 1), Gcur, (m + 1) * sizeof(int64_t));
        tmp = Lprev; Lprev = Lcur; Lcur = tmp;
    }
    for (i = 1; i <= n; i++) {
        char e = est[i - 1];
        int ew = (e == 'n' || e == 'N');
        int64_t cost = (i == n) ? 0 : 1;
        const int64_t *Grow = Grows + i * (m + 1);
        Rcur[0] = 0;
        for (j = 1; j <= m; j++) {
            char g = gen[j - 1];
            int match = (e == g) || ew || g == 'n' || g == 'N';
            int64_t diag = Rprev[j - 1] + (match ? 1 : -1);
            int64_t up = Rprev[j] - 1;
            int64_t i_del = Rcur[j - 1] - cost;
            int64_t grow = Grow[j - 1];
            int64_t v = diag; int8_t d = 0;
            if (i_del > v) { v = i_del; d = 2; }
            if (grow > v) { v = grow; d = -2; }
            if (up > v) { v = up; d = 1; }
            Rcur[j] = v;
            Rdir[i * (m + 1) + j] = d;
        }
        tmp = Rprev; Rprev = Rcur; Rcur = tmp;
    }
    finals[0] = Lprev[m];  /* careful: L was swapped each row */
    finals[0] = Lrows[n * (m + 1) + m];
    finals[1] = Grows[n * (m + 1) + m];
    finals[2] = Rprev[m];
done:
    free(Lprev); free(Lcur); free(Gcur); free(Rprev); free(Rcur);
    free(Lrows); free(Grows);
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
