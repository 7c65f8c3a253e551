#!/usr/bin/env python
"""Check the upstream-recorded wavefield norms.

The marmousi config (``cuda_reference_RTM/models/marmousi/input.dat:22-24``)
records::

    norm_source=74.3729
    norm_rev=7410.05
    norm_imloc=53.0236

These keys are read by no code path in the reference (they match no
``get_*_input`` call) — they are run-derived values the upstream authors
left behind, and the only numerical record of a real reference run. This
script runs the framework on the same configuration (oracle-synthesized
observed data + the vel_ext parity path, since the upstream
``dado_teste.bin`` and the glibc ``rand()`` boundary realization are
unrecoverable) and evaluates a battery of candidate norm definitions
(L1 / L2 / RMS / Linf over the full extended grid and the interior) of the
final forward / source-reconstruction / receiver fields and the per-shot
image, reporting how close each comes to the recorded values.

Result (see docs/NORMS.md): norm_imloc matches the L2 norm of ``imloc``
(same order of magnitude), and the norm_rev/norm_source ratio (~100x) is
reproduced by the L2 norms of the final receiver field vs the final forward
field — but exact-value agreement is impossible without the upstream
observed data and boundary realization.

Usage: python scripts/check_upstream_norms.py [--platform cpu|tpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORDED = {"norm_source": 74.3729, "norm_rev": 7410.05,
            "norm_imloc": 53.0236}


def norms(name, a):
    import numpy as np
    a = np.asarray(a, np.float64)
    out = {
        f"L2({name})": float(np.sqrt((a ** 2).sum())),
        f"L1({name})": float(np.abs(a).sum()),
        f"RMS({name})": float(np.sqrt((a ** 2).mean())),
        f"Linf({name})": float(np.abs(a).max()),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from parallel_finite_difference_computation_tpu.utils.oracle import (
        marmousi_final_fields)

    # one shared setup with validate.py config 6c (utils/oracle.py) so the
    # gate and this diagnostic can never diverge
    p, ctx, fields = marmousi_final_fields()

    cand = {}
    for name, a in fields.items():
        a = np.asarray(a)
        cand.update(norms(name, a))
        if a.shape == (ctx.nxe, ctx.nze):
            cand.update(norms(name + "_int",
                              a[ctx.nxb:-ctx.nxb, ctx.nzb:-ctx.nzb]))

    print(f"marmousi {p.nx}x{p.nz} nt={p.nt} (oracle dobs + parity "
          f"boundaries); candidate norms vs upstream-recorded values\n")
    for key, want in RECORDED.items():
        print(f"{key} = {want} (recorded)")
        scored = sorted(cand.items(), key=lambda kv: abs(kv[1] - want)
                        / max(want, 1e-12))
        for nm, v in scored[:4]:
            print(f"   {nm:22s} = {v:12.4f}   (x{v / want:8.3f} recorded)")
        print()

    # headline comparison: L2 of the natural field for each recorded key
    natural = {
        "norm_source": cand["L2(fwd_p)"],
        "norm_rev": cand["L2(rev_ppr)"],
        "norm_imloc": cand["L2(imloc)"],
    }
    print("natural (L2 of final forward / receiver field / imloc):")
    for k, v in natural.items():
        print(f"   {k}: got {v:.4f} vs recorded {RECORDED[k]} "
              f"(ratio {v / RECORDED[k]:.3f})")


if __name__ == "__main__":
    main()
