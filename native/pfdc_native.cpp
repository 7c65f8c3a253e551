// Native runtime helpers for the TPU FD/RTM framework.
//
// TPU-native equivalents of the reference's host-side native components:
//  * the image.num text observability dump (cuda_reference_RTM/src/
//    fd-code.cu:522-528) — 6 shots x 61k values of " %f \n" lines; buffered
//    C stdio is ~20x faster than Python string formatting here;
//  * the psnr comparison tool (cuda_reference_RTM/models/marmousi/psnr, a
//    prebuilt ELF from rmse.c: prints RMSE/PSNR of two float32 files and
//    writes dir.output);
//  * the Laplacian image post-filter (models/3lay_mod/laplace.f90).
//
// Exposed via a C ABI consumed with ctypes (utils/native.py); no pybind11.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Append one image.num section: "======== <idx> ========" header followed by
// n values formatted as " %f \n". Returns 0 on success.
int pfdc_write_image_num_section(const char* path, int append, int index,
                                 const float* data, int64_t n) {
    FILE* f = fopen(path, append ? "a" : "w");
    if (!f) return 1;
    setvbuf(f, nullptr, _IOFBF, 1 << 20);
    fprintf(f, "======== %d ========\n", index);
    for (int64_t i = 0; i < n; ++i) fprintf(f, " %f \n", data[i]);
    fclose(f);
    return 0;
}

// RMSE and PSNR between two float32 buffers (the psnr tool's metrics).
// PSNR uses the peak of |a| over the first buffer as MAX, matching the
// usual rmse.c formulation: psnr = 20*log10(max/rmse).
int pfdc_rmse_psnr(const float* a, const float* b, int64_t n,
                   double* rmse_out, double* psnr_out) {
    if (n <= 0) return 1;
    double acc = 0.0, peak = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double d = (double)a[i] - (double)b[i];
        acc += d * d;
        double m = fabs((double)a[i]);
        if (m > peak) peak = m;
    }
    double rmse = sqrt(acc / (double)n);
    *rmse_out = rmse;
    *psnr_out = rmse > 0.0 ? 20.0 * log10(peak / rmse) : INFINITY;
    return 0;
}

// Second-derivative Laplacian sharpening filter over an (nx, nz) x-major
// image (laplace.f90:25-30): o = d2/dz2 + d2/dx2, borders zero.
int pfdc_laplace_filter(const float* img, float* out, int nx, int nz,
                        float dx, float dz) {
    const double idz2 = 1.0 / ((double)dz * dz);
    const double idx2 = 1.0 / ((double)dx * dx);
    memset(out, 0, sizeof(float) * (size_t)nx * nz);
    for (int ix = 1; ix < nx - 1; ++ix) {
        for (int iz = 1; iz < nz - 1; ++iz) {
            const float* c = img + (size_t)ix * nz + iz;
            double v = ((double)c[1] - 2.0 * c[0] + c[-1]) * idz2 +
                       ((double)c[nz] - 2.0 * c[0] + c[-nz]) * idx2;
            out[(size_t)ix * nz + iz] = (float)v;
        }
    }
    return 0;
}

}  // extern "C"

#ifdef PFDC_PSNR_MAIN
// Standalone psnr CLI, drop-in for the reference's prebuilt ELF:
//   ./pfdc_psnr file1 file2   -> prints "RMSE: .." / "PSNR: ..",
//                                writes dir.output
int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s file1 file2\n", argv[0]);
        return 2;
    }
    auto read_all = [](const char* p, std::vector<float>& v) -> bool {
        FILE* f = fopen(p, "rb");
        if (!f) return false;
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        v.resize(sz / sizeof(float));
        size_t got = fread(v.data(), sizeof(float), v.size(), f);
        fclose(f);
        return got == v.size();
    };
    std::vector<float> a, b;
    if (!read_all(argv[1], a) || !read_all(argv[2], b)) {
        fprintf(stderr, "error reading inputs\n");
        return 1;
    }
    int64_t n = (int64_t)(a.size() < b.size() ? a.size() : b.size());
    double rmse, psnr;
    pfdc_rmse_psnr(a.data(), b.data(), n, &rmse, &psnr);
    printf("RMSE: %g\n", rmse);
    printf("PSNR: %g\n", psnr);
    FILE* out = fopen("dir.output", "w");
    if (out) {
        fprintf(out, "RMSE: %g\nPSNR: %g\n", rmse, psnr);
        fclose(out);
    }
    return 0;
}
#endif
