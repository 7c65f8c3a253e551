"""Prove the bench headline guard (VERDICT r3 #3 done-criterion):
simulate the round-3 failure mode — the compiled MXU tier dying of a
toolchain change — and show `python bench.py` exits 1 via the
committed-headline floor check instead of silently falling back to the
VPU tier.

Proven on-chip 2026-08-20: the run prints the JSON headline (vpu
fallback at 6.9 ms) and exits 1 with floor_violations = ['committed
headline tier mxu errored: simulated: Mosaic lowering rejected the MXU
kernel']. Slow entries irrelevant to the guard are stubbed so the proof
runs in ~4 minutes.

Run:  python scripts/prove_bench_guard.py
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import bench

def dead(*a, **k):
    raise RuntimeError("simulated: Mosaic lowering rejected the MXU kernel")

# the tier under test dies:
bench.bench_rtm_mxu_accuracy = dead
# stub the slow entries irrelevant to the guard (recorded as *_error):
for name in ["bench_rtm_domain_pallas",
             "bench_rtm_domain_pallas_slope", "bench_rtm_domain2d_slope",
             "bench_rtm_shotshard_stream_slope", "bench_modeling",
             "bench_modeling_pallas", "bench_stencil",
             "bench_stencil_large", "bench_stencil_padded",
             "bench_pluto_modeling", "bench_pluto_rtm", "bench_marmousi",
             "bench_marmousi_pallas"]:
    setattr(bench, name, dead)
bench.bench_stencil = lambda *a, **k: (0.0, 0.0)
bench.bench_modeling = lambda *a, **k: 1.0
bench.bench_marmousi = lambda *a, **k: None
bench.bench_rtm_pallas_single = lambda *a, **k: 1.0
_orig = bench.bench_rtm_pallas_batched
def batched(n_shots=8, lap_impl=None):
    if lap_impl in ("mxu", "mxu6"):
        dead()
    return _orig(n_shots, lap_impl)
bench.bench_rtm_pallas_batched = batched
import json
import shutil
import tempfile
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
tmp = tempfile.mkdtemp(prefix="bench_guard_")
shutil.copy(os.path.join(repo, "BENCH_DETAILS.json"),
            os.path.join(tmp, "BENCH_DETAILS.json"))
os.chdir(tmp)  # don't clobber the real BENCH_DETAILS.json
try:
    bench.main()
    print("GUARD FAILED: bench did not exit")
except SystemExit as e:
    print("bench exited with code:", e.code)
    d = json.load(open(os.path.join(tmp, "BENCH_DETAILS.json")))
    viols = d.get("floor_violations") or []
    print("floor_violations:", viols)
    # VERDICT r4 #3: the committed headline tier must fail the run
    assert any("committed headline tier mxu" in v for v in viols), viols
    # VERDICT r4 #4: the headline-ADJACENT guard must also fire — this
    # scenario stubs bench_pluto_rtm dead, so the pluto kstep4 entries
    # the committed record holds are missing from the run
    assert any("guarded tier rtm_pluto_scale_kstep4" in v
               for v in viols), viols
    assert e.code == 1, e.code
    print("GUARD PROVEN: headline + pluto guarded tiers both fail the run")
