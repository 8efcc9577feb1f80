// Exact fp64 cosine scorer for candidate pairs of ELL-encoded TF-IDF rows.
//
// Native host-side counterpart of the reference's sparse_dot_topn C++ kernel
// (reference string_grouper/string_grouper.py:12, :725-746): where the
// reference computes the full sparse-sparse product on CPU threads, the TPU
// build does candidate *selection* on the TPU MXU (hashed upper-bound filter,
// ops/matcher.py) and only the surviving (row, col) pairs are scored here --
// a merge-intersection over the two rows' ascending term ids, accumulating
// in ascending-term order exactly like a CSR row-times-row kernel, in
// float64.  OpenMP-parallel over pairs.
//
// Built as a shared library by native/build.py; loaded with ctypes
// (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Round-to-nearest-even float32 -> bfloat16 (bit pattern).
inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t lsb = (x >> 16) & 1u;
    x += 0x7fffu + lsb;
    return static_cast<uint16_t>(x >> 16);
}

}  // namespace

extern "C" {

// Feature-hashed dense projection of ELL rows (ops/hashing.py semantics:
// Knuth multiplicative hash of the term id into [0, 2^log2_dim), values
// accumulated per bucket in float32, emitted as bfloat16 bit patterns).
// Host-side replacement for the device scatter-add, which is slow for
// corpus-sized row counts; computed once per corpus and transferred.
void hash_project_bf16(
    const int32_t* ids, const float* vals, int64_t n_rows, int64_t width,
    int64_t log2_dim, uint16_t* out)
{
    const int64_t dim = int64_t(1) << log2_dim;
    const uint32_t shift = 32 - static_cast<uint32_t>(log2_dim);
#pragma omp parallel
    {
        std::vector<float> acc(dim);
#pragma omp for schedule(static)
        for (int64_t r = 0; r < n_rows; ++r) {
            std::memset(acc.data(), 0, dim * sizeof(float));
            const int32_t* idr = ids + r * width;
            const float* vr = vals + r * width;
            for (int64_t k = 0; k < width; ++k) {
                int32_t t = idr[k];
                if (t < 0) break;  // padding: ids ascend, -1 tail
                uint32_t b = (static_cast<uint32_t>(t) * 2654435761u) >> shift;
                acc[b] += vr[k];
            }
            uint16_t* o = out + r * dim;
            for (int64_t j = 0; j < dim; ++j) o[j] = f32_to_bf16(acc[j]);
        }
    }
}

// a_ids/b_ids: ELL term-id rows, -1 padded, ascending per row.
// a_vals/b_vals: matching float64 TF-IDF values (0 on padding).
// rows/cols index into the left/right ELL matrices; out receives the exact
// float64 dot product of each pair.
void score_pairs_f64(
    const int32_t* a_ids, const double* a_vals, int64_t a_width,
    const int32_t* b_ids, const double* b_vals, int64_t b_width,
    const int64_t* rows, const int64_t* cols, int64_t n_pairs,
    double* out)
{
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n_pairs; ++p) {
        const int32_t* ai = a_ids + rows[p] * a_width;
        const double*  av = a_vals + rows[p] * a_width;
        const int32_t* bi = b_ids + cols[p] * b_width;
        const double*  bv = b_vals + cols[p] * b_width;
        double acc = 0.0;
        int64_t i = 0, j = 0;
        while (i < a_width && j < b_width) {
            int32_t ta = ai[i], tb = bi[j];
            if (ta < 0 || tb < 0) break;  // padding: row exhausted
            if (ta == tb) {
                acc += av[i] * bv[j];
                ++i; ++j;
            } else if (ta < tb) {
                ++i;
            } else {
                ++j;
            }
        }
        out[p] = acc;
    }
}

// Row-wise dot of two equal-length ELL matrices (reference dot(),
// string_grouper.py:433-440).
void row_dot_f64(
    const int32_t* a_ids, const double* a_vals, int64_t a_width,
    const int32_t* b_ids, const double* b_vals, int64_t b_width,
    int64_t n_rows, double* out)
{
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_rows; ++r) {
        const int32_t* ai = a_ids + r * a_width;
        const double*  av = a_vals + r * a_width;
        const int32_t* bi = b_ids + r * b_width;
        const double*  bv = b_vals + r * b_width;
        double acc = 0.0;
        int64_t i = 0, j = 0;
        while (i < a_width && j < b_width) {
            int32_t ta = ai[i], tb = bi[j];
            if (ta < 0 || tb < 0) break;
            if (ta == tb) { acc += av[i] * bv[j]; ++i; ++j; }
            else if (ta < tb) { ++i; }
            else { ++j; }
        }
        out[r] = acc;
    }
}

}  // extern "C"
