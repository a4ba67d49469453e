// Dynamic-time-warping accumulated-cost DP.
//
// The DTW recurrence D[i][j] = c[i][j] + min(D[i-1][j], D[i][j-1],
// D[i-1][j-1]) is sequential along rows AND columns, so pure-numpy can't
// vectorize it; this kernel runs the DP in C++ (the pseudotime aligner's
// hot loop — reference dynaclr rides on dtaidistance's C core for the
// same reason). Python computes the pairwise cost matrix (BLAS) and
// backtracks the path (O(T+N)); only the O(T*N) DP lives here.
//
// subsequence=1 gives free start/end in the QUERY axis (j): row 0 of the
// accumulator is 0, so the template (i axis) must fully participate while
// the matched query segment floats — the SubsequenceAlignment semantics.

#include <cstdint>
#include <limits>

extern "C" {

// cost: (T, N) row-major; acc: (T+1, N+1) row-major output.
void dtw_dp(const double* cost, int64_t T, int64_t N, int subsequence, double* acc) {
    const double INF = std::numeric_limits<double>::infinity();
    const int64_t W = N + 1;
    acc[0] = 0.0;
    for (int64_t j = 1; j <= N; ++j) acc[j] = subsequence ? 0.0 : INF;
    for (int64_t i = 1; i <= T; ++i) acc[i * W] = INF;
    for (int64_t i = 1; i <= T; ++i) {
        const double* crow = cost + (i - 1) * N;
        double* prev = acc + (i - 1) * W;
        double* cur = acc + i * W;
        for (int64_t j = 1; j <= N; ++j) {
            double best = prev[j - 1];
            if (prev[j] < best) best = prev[j];
            if (cur[j - 1] < best) best = cur[j - 1];
            cur[j] = crow[j - 1] + best;
        }
    }
}

}  // extern "C"
