"""lap_impl="auto" routing: the measured accuracy envelope of the
multi-pass bf16 MXU Laplacian tiers (validate 6d; docs/PALLAS_NOTES.md
"Measured accuracy envelope") drives kernel selection so a user never
silently gets the 3-pass tier's 2.4e-3 marmousi-class drift.

Reference context: the MXU tiers accelerate the K1 Laplacian
(``cuda_reference_RTM/src/fd-code.cu:53-78``); the reference itself has
one float32 path and no such routing to test.
"""

import warnings

import numpy as np
import pytest

from parallel_finite_difference_computation_tpu.solver import FDContext
from parallel_finite_difference_computation_tpu.ops.pallas_fd import (
    MXU3_NT_MAX, MXU6_NT_MAX, _use_mxu_lap, resolve_lap_impl)


def _ctx(nt, dx=10.0, dz=10.0):
    return FDContext.create(64, 48, nt, dx=dx, dz=dz, dt=0.001,
                            order=8, nxb=8, nzb=8, fac=0.7)


class TestAutoRouting:
    def test_short_isotropic_routes_to_3pass(self):
        """3lay-class (nt=1001 <= MXU3_NT_MAX, dx == dz): the validated
        speed tier."""
        assert resolve_lap_impl(_ctx(1001), "auto") == "mxu"

    def test_long_nt_routes_to_6pass(self):
        """marmousi-class nt (3004): past the 3-pass envelope, inside the
        6-pass one — the accuracy tier that measured 4.0e-6 on the full
        marmousi config."""
        assert resolve_lap_impl(_ctx(3004), "auto") == "mxu6"

    def test_anisotropic_routes_to_6pass_even_short(self):
        """dz != dx puts dt at the CFL edge of the fine axis — the
        measured amplification mechanism — so even short-nt anisotropic
        configs leave the 3-pass envelope."""
        assert resolve_lap_impl(_ctx(800, dx=25.0, dz=8.0), "auto") == "mxu6"

    def test_beyond_validated_range_routes_to_exact(self):
        """Production-length runs (pluto nt=12860) exceed every validated
        envelope: exact VPU taps (bit-identical to the lax path)."""
        assert resolve_lap_impl(_ctx(12860), "auto") == "vpu"

    def test_envelope_boundaries(self):
        assert resolve_lap_impl(_ctx(MXU3_NT_MAX), "auto") == "mxu"
        assert resolve_lap_impl(_ctx(MXU3_NT_MAX + 1), "auto") == "mxu6"
        assert resolve_lap_impl(_ctx(MXU6_NT_MAX), "auto") == "mxu6"
        assert resolve_lap_impl(_ctx(MXU6_NT_MAX + 1), "auto") == "vpu"

    def test_explicit_choices_pass_through(self):
        c = _ctx(100)
        for impl in ("vpu", "mxu6", "padded", None):
            assert resolve_lap_impl(c, impl) == impl

    def test_split_counts(self):
        """_use_mxu_lap maps the routed impl to the bf16 split count."""
        assert _use_mxu_lap("auto", _ctx(1001)) == 2
        assert _use_mxu_lap("auto", _ctx(3004)) == 3
        assert _use_mxu_lap("auto", _ctx(12860)) == 0

    def test_auto_without_ctx_raises(self):
        with pytest.raises(ValueError, match="auto"):
            _use_mxu_lap("auto")


class TestEnvelopeWarning:
    def test_explicit_mxu_outside_envelope_warns_but_honors(self):
        """An explicit 'mxu' on a marmousi-class config is honored (the
        user may be probing) but must warn — the measured drift there is
        2.4e-3, past the 1e-4 bar."""
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert resolve_lap_impl(_ctx(3004), "mxu") == "mxu"
        assert len(w) == 1 and "envelope" in str(w[0].message)

    def test_explicit_mxu_inside_envelope_is_silent(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert resolve_lap_impl(_ctx(1001), "mxu") == "mxu"
        assert not w


class TestAutoEndToEnd:
    def test_auto_matches_routed_tier_in_kernel(self, rng):
        """rtm_snapshot_pallas(lap_impl="auto") produces bit-identical
        output to the tier auto routes to (interpret mode)."""
        from parallel_finite_difference_computation_tpu import numerics
        from parallel_finite_difference_computation_tpu.ops.pallas_fd \
            import rtm_snapshot_pallas
        import jax.numpy as jnp
        nt, nx, nz, nb = 8, 48, 40, 8
        ctx = FDContext.create(nx, nz, nt, dx=10.0, dz=10.0, dt=0.001,
                               order=8, nxb=nb, nzb=nb, fac=0.7)
        v2 = (1500.0 + 500.0 * rng.random(
            (ctx.nxe, ctx.nze))).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(nt, 0.001, 25.0))
        dobs = jnp.asarray(
            rng.standard_normal((ctx.nx, nt)).astype(np.float32))
        args = (ctx, jnp.asarray(v2), wav, dobs, nb + nx // 2, 10, 9)
        routed = resolve_lap_impl(ctx, "auto")
        assert routed == "mxu"  # short isotropic config
        im_auto = np.asarray(rtm_snapshot_pallas(*args, interpret=True,
                                                 lap_impl="auto"))
        im_mxu = np.asarray(rtm_snapshot_pallas(*args, interpret=True,
                                                lap_impl="mxu"))
        np.testing.assert_array_equal(im_auto, im_mxu)


class TestNoTraceTimeEnvReads:
    def test_compute_modules_read_environ_only_at_import(self):
        """No os.environ access inside any function of the compute-path
        modules (ops/, parallel/, solver.py): a trace-time env read is
        invisible to the jit cache key, so two traces under different env
        values silently serve each other's compilations. Knobs are
        explicit kwargs or import-time module snapshots."""
        import ast
        import pathlib
        import parallel_finite_difference_computation_tpu as pkg
        root = pathlib.Path(pkg.__file__).parent
        files = (list((root / "ops").glob("*.py"))
                 + list((root / "parallel").glob("*.py"))
                 + [root / "solver.py", root / "numerics.py"])
        offenders = []
        for f in files:
            tree = ast.parse(f.read_text())
            for fn in ast.walk(tree):
                if not isinstance(fn, (ast.FunctionDef,
                                       ast.AsyncFunctionDef)):
                    continue
                for node in ast.walk(fn):
                    if (isinstance(node, ast.Attribute)
                            and node.attr == "environ"):
                        offenders.append(f"{f.name}:{node.lineno} "
                                         f"in {fn.name}")
        assert not offenders, offenders

    def test_env_change_after_import_does_not_change_behavior(self,
                                                              monkeypatch):
        """The PFDC_LAP_IMPL knob is an import-time snapshot: flipping the
        env var mid-process must NOT change what lap_impl=None resolves
        to (process-stable -> the jit cache can never serve a stale
        trace)."""
        from parallel_finite_difference_computation_tpu.ops.pallas_fd \
            import _use_mxu_lap
        before = _use_mxu_lap(None)
        monkeypatch.setenv("PFDC_LAP_IMPL", "mxu")
        assert _use_mxu_lap(None) == before

    def test_env_auto_routes_on_tiled_paths(self, monkeypatch):
        """PFDC_LAP_IMPL=auto must route (not raise) on the tiled/streaming
        paths too: solver's resolve_lap_impl(ctx, None) resolves the env
        snapshot before the kernels, so pallas_stream never sees a
        ctx-less 'auto' (the round-4 advisor finding)."""
        import parallel_finite_difference_computation_tpu.ops.stencil as st
        from parallel_finite_difference_computation_tpu.ops.pallas_fd \
            import resolve_lap_impl
        from parallel_finite_difference_computation_tpu.solver import (
            FDContext, rtm_shot_snapshot_tiled)
        import numpy as np
        import jax.numpy as jnp
        from parallel_finite_difference_computation_tpu import numerics
        monkeypatch.setattr(st, "_ENV_LAP_IMPL", "auto")
        ctx = FDContext.create(40, 40, 12, dx=10.0, dz=10.0, dt=0.001,
                               order=8, nxb=8, nzb=8, fac=0.7)
        assert resolve_lap_impl(ctx, None) == "mxu"  # short-nt isotropic
        rng = np.random.default_rng(0)
        v2 = (1500.0 + 500.0 * rng.random((ctx.nxe, ctx.nze))
              ).astype(np.float32) ** 2
        wav = jnp.asarray(numerics.ricker_wavelet(ctx.nt, 0.001, 25.0))
        dobs = jnp.asarray(rng.standard_normal((ctx.nx, ctx.nt)),
                           jnp.float32)
        # lap_impl=None + env 'auto': must build and run without the
        # "pass ctx to _use_mxu_lap" ValueError
        out = rtm_shot_snapshot_tiled(ctx, jnp.asarray(v2), wav, dobs,
                                      20, 10, 9, tile_rows=16,
                                      interpret=True, block_k=3)
        assert np.isfinite(np.asarray(out)).all()
