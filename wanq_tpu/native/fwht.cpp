// Native fast Walsh–Hadamard butterfly for the PTQ host path.
//
// TPU-native framework note: the reference's native code is CUDA GEMM /
// fused kernels (kernels/csrc) whose TPU equivalents are Pallas kernels.
// The one host-side hot loop our runtime owns is the float64 weight-side
// Hadamard rotation used by QuaRot/ViDiT-Q PTQ (quant/hadamard.py) — at
// 14B ffn dims the numpy butterfly allocates a temporary per stage; this
// in-place C++ version runs the log2(n/K) stages allocation-free.
//
// Layout: row-major [rows, n]; butterflies over the last axis down to
// segment length K (the Paley base order), matching matmul_hadU_np's
// adjacent-pair decimation exactly. No normalization (python applies the
// base matrix and 1/sqrt(n)).

#include <cstdint>

extern "C" {

void fwht_rows_f64(double* data, int64_t rows, int64_t n, int64_t k) {
    for (int64_t row = 0; row < rows; ++row) {
        double* d = data + row * n;
        int64_t L = n;   // current segment count dimension
        int64_t r = 1;   // trailing repeat (doubles each stage)
        while (L > k) {
            const int64_t half = L / 2;
            for (int64_t j = 0; j < half; ++j) {
                double* base = d + j * 2 * r;
                for (int64_t u = 0; u < r; ++u) {
                    const double a = base[u];
                    const double b = base[r + u];
                    base[u] = a + b;
                    base[r + u] = a - b;
                }
            }
            L /= 2;
            r *= 2;
        }
    }
}

}  // extern "C"
