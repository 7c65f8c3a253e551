/* gpu_rtm_oracle.c — standalone serial oracle for the reference GPU RTM
 * suite, used to generate full-configuration golden outputs on any host.
 *
 * The upstream repository's GPU two-snapshot RTM (`rtm_code`) ships goldens
 * that cannot be reproduced (its `file-teste` is all zeros and the
 * `image.num`/`dir.image` goldens need a missing `dobs.6` blob), so this
 * program re-implements the same *semantics* in plain serial C to serve as
 * an external value gate for the framework's `pipeline.run_rtm_gpu`.
 *
 * Semantics follow the reference (transcribed from behavior, not copied):
 *   - kernels K1-K6:      cuda_reference_RTM/src/fd-code.cu:53-144
 *   - fd_forward/fd_back: fd-code.cu:247-341
 *   - main shot loop:     fd-code.cu:380-584
 *   - coefficients, wavelet, taper, random boundary:
 *                         cuda_reference_RTM/lib/src/functions.c:78-157,267-385
 *
 * Usage:
 *   gpu_rtm_oracle mod <input.dat> <out_dobs.bin>
 *       Forward-model synthetic shot gathers (clamp-extended velocity,
 *       GPU-suite forward propagator, record receiver row gz each step).
 *       Output layout: float32[ns][nx][nt], the layout `datfile` expects
 *       (fd-code.cu:420-424).
 *   gpu_rtm_oracle rtm <input.dat> <outdir>
 *       Full two-snapshot RTM. Writes dir.image, image.num, imlocs.bin
 *       (float32[ns][nx][nz] per-shot images), vel_ext_used.bin
 *       (float32[ns][nxe][nze], the extended velocities actually used —
 *       feed this back as `vel_ext_file` for bit-equal boundary parity,
 *       the path fd-code.cu:483-487 provides for exactly this purpose),
 *       and file-teste (forward wavefield probe at it==750, fd-code.cu:268).
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ---------------- parameters ---------------- */

static char *g_cfg_text = NULL;

static char *cfg_lookup(const char *key) {
    /* exact key=value match, line-based (the reference's strstr-substring
     * parser resolves to the same values on every shipped input.dat) */
    static char buf[512];
    char *line = g_cfg_text;
    size_t klen = strlen(key);
    while (line && *line) {
        char *eol = strchr(line, '\n');
        size_t len = eol ? (size_t)(eol - line) : strlen(line);
        if (len < sizeof buf) {
            memcpy(buf, line, len);
            buf[len] = '\0';
            char *eq = strchr(buf, '=');
            if (eq && (size_t)(eq - buf) == klen &&
                strncmp(buf, key, klen) == 0)
                return eq + 1;
        }
        line = eol ? eol + 1 : NULL;
    }
    return NULL;
}

static int cfg_int(const char *key) {
    char *v = cfg_lookup(key);
    return v ? atoi(v) : -1;
}
static float cfg_float(const char *key) {
    char *v = cfg_lookup(key);
    return v ? (float)atof(v) : -1.0f;
}
static char *cfg_str(const char *key) {
    char *v = cfg_lookup(key);
    return v ? strdup(v) : NULL;
}

static int nz, nx, nt, ns, sz, fsx, ds, gz, order, nzb, nxb, iss;
static float dz, dx, dt, fpeak, fac;
static char *vpfile, *datfile, *vel_ext_file, *tmpdir;
static int nze, nxe;

static void load_config(const char *path) {
    FILE *f = fopen(path, "r");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    g_cfg_text = malloc(n + 1);
    fread(g_cfg_text, 1, n, f);
    g_cfg_text[n] = '\0';
    fclose(f);

    tmpdir = cfg_str("tmpdir");
    vpfile = cfg_str("vpfile");
    datfile = cfg_str("datfile");
    vel_ext_file = cfg_str("vel_ext_file");
    nz = cfg_int("nz"); nx = cfg_int("nx"); nt = cfg_int("nt");
    ns = cfg_int("ns"); sz = cfg_int("sz"); fsx = cfg_int("fsx");
    ds = cfg_int("ds"); gz = cfg_int("gz"); order = cfg_int("order");
    nzb = cfg_int("nzb"); nxb = cfg_int("nxb"); iss = cfg_int("iss");
    dz = cfg_float("dz"); dx = cfg_float("dx"); dt = cfg_float("dt");
    fpeak = cfg_float("fpeak"); fac = cfg_float("fac");
    /* defaults per init_args, fd-code.cu:367-378 */
    if (iss == -1) iss = 0;
    if (ns == -1) ns = 1;
    if (sz == -1) sz = 0;
    if (fsx == -1) fsx = 0;
    if (ds == -1) ds = 1;
    if (gz == -1) gz = 0;
    if (order == -1) order = 8;
    if (nzb == -1) nzb = 40;
    if (nxb == -1) nxb = 40;
    if (fac == -1.0f) fac = 0.7f;
    nze = nz + 2 * nzb;
    nxe = nx + 2 * nxb;
}

/* ---------------- numerics ---------------- */

static void makeo2(float *coef, int n) {
    /* Hamming-windowed arbitrary-even-order weights, functions.c:124-157 */
    const float alpha = .54f, beta = 6.f;
    float h_beta = 0.5f * beta;
    float a1 = 2.f * alpha - 1.0f, a2 = 2.f * (1.0f - alpha);
    float central = 0.0f;
    int msign = -1;
    for (int ix = 1; ix <= n / 2; ix++) {
        msign = -msign;
        float cf = (2.f * msign) / (float)(ix * ix);
        float arg = (float)(M_PI * ix / (2. * (n / 2 + 2)));
        float cw = powf(a1 + a2 * cosf(arg) * cosf(arg), h_beta);
        coef[n / 2 + ix] = cf * cw;
        central += coef[n / 2 + ix];
        coef[n / 2 - ix] = coef[n / 2 + ix];
    }
    coef[n / 2] = -2.f * central;
}

static float *calc_coefs(int n) {
    /* standard central-difference second-derivative weights,
     * functions.c:78-122 (a published mathematical table) */
    float *c = calloc(n + 1, sizeof(float));
    switch (n) {
    case 2: { float t[] = {1.f, -2.f, 1.f};
              memcpy(c, t, sizeof t); break; }
    case 4: { float t[] = {-1.f/12, 4.f/3, -5.f/2, 4.f/3, -1.f/12};
              memcpy(c, t, sizeof t); break; }
    case 6: { float t[] = {1.f/90, -3.f/20, 3.f/2, -49.f/18,
                           3.f/2, -3.f/20, 1.f/90};
              memcpy(c, t, sizeof t); break; }
    case 8: { float t[] = {-1.f/560, 8.f/315, -1.f/5, 8.f/5, -205.f/72,
                           8.f/5, -1.f/5, 8.f/315, -1.f/560};
              memcpy(c, t, sizeof t); break; }
    default: makeo2(c, n);
    }
    return c;
}

static float *make_taper(int nb, float F) {
    /* exp(-(sqrt(-ln F)/nb * (nb-i))^2), functions.c:361-379 */
    float *t = malloc(nb * sizeof(float));
    float dfrac = sqrtf(-logf(F)) / (float)nb;
    for (int i = 0; i < nb; i++)
        t[i] = expf(-powf(dfrac * (nb - i), 2));
    return t;
}

static void ricker_wavelet(float *s) {
    /* untruncated Ricker delayed by 1/fpeak, functions.c:267-299 */
    for (int it = 0; it < nt; it++) {
        float x = (float)(M_PI) * fpeak * (it * dt - 1.0f / fpeak);
        float xx = x * x;
        s[it] = expf(-xx) * (1.0f - 2.0f * xx);
    }
}

#define VE(ix, iz) ve[(ix) * nze + (iz)]

static int rand_band(float v, float v_ave) {
    /* rand()%(v+delta-(v_ave-delta)+1) + v_ave-delta, functions.c:301-359 */
    const float delta = 200.f;
    return rand() % (int)(v + delta - (v_ave - delta) + 1)
           + (int)(v_ave - delta);
}

static void extendvel_random(float *ve) {
    /* random linear-ramp boundary (glibc rand(), unseeded like the
     * reference), functions.c:301-359. Bottom/left/right ramp toward
     * l_lim=300 with +-200 jitter; top clamps; corners mirror/ramp. */
    const float l_lim = 300.f;
    float v, v_ave;
    for (int ix = 0; ix < nx; ix++) {
        for (int iz = 0; iz < nzb; iz++) {
            VE(ix + nxb, iz) = VE(ix + nxb, nzb);
            v = VE(ix + nxb, nzb + nz - 1);
            v_ave = v - (v - l_lim) * iz / (nzb - 1);
            VE(ix + nxb, nz + nzb + iz) = (float)rand_band(v, v_ave);
        }
    }
    for (int iz = 0; iz < nz; iz++) {
        for (int ix = 0; ix < nxb; ix++) {
            v = VE(nxb, nzb + iz);
            v_ave = v - (v - l_lim) * ix / (nxb - 1);
            VE(nxb - 1 - ix, nzb + iz) = (float)rand_band(v, v_ave);
            v = VE(nxb + nx - 1, nzb + iz);
            v_ave = v - (v - l_lim) * ix / (nxb - 1);
            VE(nxb + nx + ix, nzb + iz) = (float)rand_band(v, v_ave);
        }
    }
    for (int iz = 0; iz < nzb; iz++) {
        for (int ix = 0; ix < nxb; ix++) {
            VE(ix, iz) = VE(nxb, iz);
            VE(nxb + nx + ix, iz) = VE(nxb + nx - 1, iz);
        }
    }
    for (int iz = 0; iz < nzb; iz++) {
        for (int ix = 0; ix <= iz; ix++) {
            v = VE(nxb, nzb + nz - 1);
            v_ave = v - (v - l_lim) * (nxb - 1 - ix) / (nzb - 1);
            VE(ix, nz + 2 * nzb - 1 - iz) = (float)rand_band(v, v_ave);
            VE(iz, nz + 2 * nzb - 1 - ix) = (float)rand_band(v, v_ave);
        }
    }
    for (int iz = 0; iz < nzb; iz++) {
        for (int ix = 0; ix <= iz; ix++) {
            v = VE(nxb + nx - 1, nzb + nz - 1);
            v_ave = v - (v - l_lim) * (nxb - 1 - ix) / (nzb - 1);
            VE(nx + 2 * nxb - 1 - ix, nz + 2 * nzb - 1 - iz) =
                (float)rand_band(v, v_ave);
            VE(nx + 2 * nxb - 1 - iz, nz + 2 * nzb - 1 - ix) =
                (float)rand_band(v, v_ave);
        }
    }
}

static void extendvel_clamp(float *ve) {
    /* deterministic clamp padding (the CPU pipeline's extendvel,
     * dpct_gpu_rtm_domain_division/src/boundary/taper.c:7-23), used by the
     * `mod` mode to synthesize observed data over absorbing boundaries */
    for (int ix = 0; ix < nxe; ix++) {
        int cx = ix < nxb ? nxb : (ix >= nxb + nx ? nxb + nx - 1 : ix);
        for (int iz = 0; iz < nze; iz++) {
            int cz = iz < nzb ? nzb : (iz >= nzb + nz ? nzb + nz - 1 : iz);
            VE(ix, iz) = VE(cx, cz);
        }
    }
}

/* ---------------- propagation ---------------- */

static float *coefs_x, *coefs_z, *taper_x, *taper_z;
static float dt2;

#define F(a, ix, iz) a[(ix) * nze + (iz)]

static void laplacian(const float *p, float *lap) {
    /* K1, interior-only in both dims, coefs premultiplied by 1/dx^2,1/dz^2
     * (fd-code.cu:53-78, :203-216) */
    int h = order / 2;
    for (int ix = h; ix < nxe - h; ix++) {
        for (int iz = h; iz < nze - h; iz++) {
            float az = 0.f, ax = 0.f;
            for (int io = 0; io <= order; io++) {
                az += F(p, ix, iz + io - h) * coefs_z[io];
                ax += F(p, ix + io - h, iz) * coefs_x[io];
            }
            F(lap, ix, iz) = az + ax;
        }
    }
}

static void leapfrog(const float *p, float *pp, const float *v2,
                     const float *lap) {
    /* K2 over the full extended grid (fd-code.cu:80-92) */
    for (long i = 0; i < (long)nxe * nze; i++)
        pp[i] = 2.f * p[i] - pp[i] + v2[i] * dt2 * lap[i];
}

static void taper_top(float *p, float *pp) {
    /* K3: top z-strip for all x, plus taperx in the two top corners
     * (fd-code.cu:94-117) */
    for (int ix = 0; ix < nxe; ix++)
        for (int iz = 0; iz < nzb; iz++) {
            F(p, ix, iz) *= taper_z[iz];
            F(pp, ix, iz) *= taper_z[iz];
        }
    for (int ix = 0; ix < nxb; ix++)
        for (int iz = 0; iz < nzb; iz++) {
            F(p, ix, iz) *= taper_x[ix];
            F(pp, ix, iz) *= taper_x[ix];
            F(p, nxe - 1 - ix, iz) *= taper_x[ix];
            F(pp, nxe - 1 - ix, iz) *= taper_x[ix];
        }
}

#define SWAP(a, b) { float *swp_ = (a); (a) = (b); (b) = swp_; }

static void forward(float **pio, float **ppio, const float *v2,
                    const float *srce, int sx_abs, float *lap,
                    float *record, const char *probe_path) {
    /* fd_forward (fd-code.cu:247-288): per step swap, taper, laplacian,
     * leapfrog, point source. Optionally records receiver row gz into
     * record[ix*nt+it] (mod mode) and dumps the it==750 probe (rtm mode). */
    float *p = *pio, *pp = *ppio;
    for (int it = 0; it < nt; it++) {
        SWAP(p, pp);
        taper_top(p, pp);
        laplacian(p, lap);
        leapfrog(p, pp, v2, lap);
        F(pp, sx_abs, sz + nzb) += srce[it];
        if (record)
            for (int ix = 0; ix < nx; ix++)
                record[(long)ix * nt + it] = F(pp, ix + nxb, gz + nzb);
        if (it == 750 && probe_path) {
            FILE *f = fopen(probe_path, "w");
            for (long i = 0; i < (long)nxe * nze; i++)
                fprintf(f, "%f\n", p[i]);
            fclose(f);
        }
    }
    *pio = p;
    *ppio = pp;
}

static void backward(float *p, float *pp, float *pr, float *ppr,
                     const float *v2, const float *snap0, const float *snap1,
                     const float *dobs_shot, float *imloc, float *lap) {
    /* fd_back (fd-code.cu:290-341): source field reconstructed backwards
     * from the two final snapshots with NO taper (random boundaries make
     * edge reflections incoherent instead of absorbed); receiver field
     * propagated with taper + time-reversed data injection; zero-lag
     * cross-correlation imaging on the interior. */
    long cells = (long)nxe * nze;
    for (int it = 0; it < nt; it++) {
        if (it == 0)
            memcpy(pp, snap1, cells * sizeof(float));
        else if (it == 1)
            memcpy(pp, snap0, cells * sizeof(float));
        else {
            laplacian(p, lap);
            leapfrog(p, pp, v2, lap);
        }
        SWAP(p, pp);

        taper_top(pr, ppr);
        laplacian(pr, lap);
        leapfrog(pr, ppr, v2, lap);
        for (int ix = 0; ix < nx; ix++)          /* K5, fd-code.cu:124-131 */
            F(ppr, ix + nxb, gz + nzb) += dobs_shot[(long)ix * nt
                                                    + (nt - 1 - it)];
        for (int ix = 0; ix < nx; ix++)          /* K6, fd-code.cu:133-144 */
            for (int iz = 0; iz < nz; iz++)
                imloc[(long)ix * nz + iz] +=
                    F(p, ix + nxb, iz + nzb) * F(ppr, ix + nxb, iz + nzb);
        SWAP(pr, ppr);
    }
}

/* ---------------- drivers ---------------- */

static float *read_f32(const char *path, long count) {
    FILE *f = fopen(path, "r");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    float *buf = calloc(count, sizeof(float));
    fread(buf, sizeof(float), count, f);
    fclose(f);
    return buf;
}

static void write_f32(const char *path, const float *buf, long count) {
    FILE *f = fopen(path, "w");
    if (!f) { fprintf(stderr, "cannot write %s\n", path); exit(1); }
    fwrite(buf, sizeof(float), count, f);
    fclose(f);
}

static float *load_extended_vp(void) {
    /* vp embedded in the interior of the extended grid, fd-code.cu:437-449 */
    float *vp = read_f32(vpfile, (long)nx * nz);
    float *ve = calloc((long)nxe * nze, sizeof(float));
    for (int ix = 0; ix < nx; ix++)
        for (int iz = 0; iz < nz; iz++)
            VE(ix + nxb, iz + nzb) = vp[(long)ix * nz + iz];
    free(vp);
    return ve;
}

static void init_numerics(void) {
    float *c = calc_coefs(order);
    coefs_x = calloc(order + 1, sizeof(float));
    coefs_z = calloc(order + 1, sizeof(float));
    float dx2inv = (1.f / dx) * (1.f / dx), dz2inv = (1.f / dz) * (1.f / dz);
    for (int io = 0; io <= order; io++) {
        coefs_x[io] = dx2inv * c[io];
        coefs_z[io] = dz2inv * c[io];
    }
    free(c);
    dt2 = dt * dt;
    taper_x = make_taper(nxb, fac);
    taper_z = make_taper(nzb, fac);
}

static int run_mod(const char *out_path) {
    init_numerics();
    float *ve = load_extended_vp();
    extendvel_clamp(ve);
    long cells = (long)nxe * nze;
    float *v2 = malloc(cells * sizeof(float));
    for (long i = 0; i < cells; i++) v2[i] = ve[i] * ve[i];
    float *srce = malloc(nt * sizeof(float));
    ricker_wavelet(srce);
    float *p = calloc(cells, sizeof(float));
    float *pp = calloc(cells, sizeof(float));
    float *lap = calloc(cells, sizeof(float));
    float *dobs = calloc((long)ns * nx * nt, sizeof(float));
    for (int is = 0; is < ns; is++) {
        memset(p, 0, cells * sizeof(float));
        memset(pp, 0, cells * sizeof(float));
        forward(&p, &pp, v2, srce, fsx + is * ds + nxb, lap,
                dobs + (long)is * nx * nt, NULL);
        fprintf(stderr, "mod shot %d/%d done\n", is + 1, ns);
    }
    write_f32(out_path, dobs, (long)ns * nx * nt);
    return 0;
}

static int run_rtm(const char *outdir) {
    init_numerics();
    long cells = (long)nxe * nze;
    float *vel_ext = NULL;
    if (vel_ext_file)
        vel_ext = read_f32(vel_ext_file, (long)ns * cells);
    float *dobs = read_f32(datfile, (long)ns * nx * nt);
    float *ve = load_extended_vp();
    float *v2 = malloc(cells * sizeof(float));
    float *srce = malloc(nt * sizeof(float));
    ricker_wavelet(srce);
    float *p = calloc(cells, sizeof(float));
    float *pp = calloc(cells, sizeof(float));
    float *pr = calloc(cells, sizeof(float));
    float *ppr = calloc(cells, sizeof(float));
    float *lap = calloc(cells, sizeof(float));
    float *snap0 = malloc(cells * sizeof(float));
    float *snap1 = malloc(cells * sizeof(float));
    long icells = (long)nx * nz;
    float *imloc = calloc(icells, sizeof(float));
    float *img = calloc(icells, sizeof(float));
    float *imlocs = calloc((long)ns * icells, sizeof(float));

    char path[4096];
    snprintf(path, sizeof path, "%s/image.num", outdir);
    FILE *fnum = fopen(path, "w");
    snprintf(path, sizeof path, "%s/vel_ext_used.bin", outdir);
    FILE *fve = fopen(path, "w");

    for (int is = 0; is < ns; is++) {
        float *vpe = ve;
        if (vel_ext)
            vpe = vel_ext + (long)is * cells;       /* fd-code.cu:483-484 */
        else
            extendvel_random(ve);                   /* fd-code.cu:486 */
        fwrite(vpe, sizeof(float), cells, fve);
        for (long i = 0; i < cells; i++) v2[i] = vpe[i] * vpe[i];

        memset(p, 0, cells * sizeof(float));
        memset(pp, 0, cells * sizeof(float));
        snprintf(path, sizeof path, "%s/file-teste", outdir);
        forward(&p, &pp, v2, srce, fsx + is * ds + nxb, lap, NULL,
                is == iss && nt > 750 ? path : NULL);
        memcpy(snap0, p, cells * sizeof(float));    /* fd-code.cu:502-507 */
        memcpy(snap1, pp, cells * sizeof(float));

        memset(p, 0, cells * sizeof(float));
        memset(pp, 0, cells * sizeof(float));
        memset(pr, 0, cells * sizeof(float));
        memset(ppr, 0, cells * sizeof(float));
        memset(imloc, 0, icells * sizeof(float));
        backward(p, pp, pr, ppr, v2, snap0, snap1,
                 dobs + (long)is * nx * nt, imloc, lap);
        memcpy(imlocs + (long)is * icells, imloc, icells * sizeof(float));

        /* cumulative-image text dump, z-outer x-inner (fd-code.cu:522-528) */
        fprintf(fnum, "======== %i ========\n", is);
        for (int iz = 0; iz < nz; iz++)
            for (int ix = 0; ix < nx; ix++) {
                img[(long)ix * nz + iz] += imloc[(long)ix * nz + iz];
                fprintf(fnum, " %f \n", img[(long)ix * nz + iz]);
            }
        fprintf(stderr, "rtm shot %d/%d done\n", is + 1, ns);
    }
    fclose(fnum);
    fclose(fve);
    snprintf(path, sizeof path, "%s/dir.image", outdir);
    write_f32(path, img, icells);
    snprintf(path, sizeof path, "%s/imlocs.bin", outdir);
    write_f32(path, imlocs, (long)ns * icells);
    return 0;
}

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr,
                "usage: %s mod <input.dat> <out_dobs.bin>\n"
                "       %s rtm <input.dat> <outdir>\n", argv[0], argv[0]);
        return 2;
    }
    load_config(argv[2]);
    fprintf(stderr, "oracle %s: nz=%d nx=%d nt=%d ns=%d order=%d "
            "nxb=%d nzb=%d fac=%g vel_ext=%s\n",
            argv[1], nz, nx, nt, ns, order, nxb, nzb, fac,
            vel_ext_file ? vel_ext_file : "(random)");
    if (strcmp(argv[1], "mod") == 0)
        return run_mod(argv[3]);
    if (strcmp(argv[1], "rtm") == 0)
        return run_rtm(argv[3]);
    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
