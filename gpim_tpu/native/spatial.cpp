// Greedy spatial suppression for Bayesian-optimization batch selection.
//
// Native implementation of gpim_tpu/native/spatial.py::spaced_batch (the
// contract of the reference's cKDTree-in-a-Python-loop batch spacing,
// boptim.py:326-376): walk candidates in descending priority order; each
// accepted point suppresses every remaining candidate within Euclidean
// distance `dscale`. O(k * n * d) with a dense alive bitmap - candidate
// sets here are grid-sized (1e4-1e6), where the flat scan beats tree
// construction overhead.
//
// Build: gpim_tpu/native/build.sh  ->  _spatial.so (loaded via ctypes).

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

int64_t spaced_batch(const double* pts, int64_t n, int64_t d,
                     double dscale, int64_t max_out, int64_t* out) {
    if (n <= 0 || max_out <= 0) return 0;
    const double r2 = dscale * dscale;
    std::vector<char> alive(static_cast<size_t>(n), 1);
    int64_t count = 0;
    for (int64_t i = 0; i < n && count < max_out; ++i) {
        if (!alive[static_cast<size_t>(i)]) continue;
        out[count++] = i;
        const double* pi = pts + i * d;
        for (int64_t j = i; j < n; ++j) {
            if (!alive[static_cast<size_t>(j)]) continue;
            const double* pj = pts + j * d;
            double acc = 0.0;
            for (int64_t k = 0; k < d; ++k) {
                const double diff = pi[k] - pj[k];
                acc += diff * diff;
            }
            if (acc <= r2) alive[static_cast<size_t>(j)] = 0;
        }
    }
    return count;
}

}  // extern "C"
