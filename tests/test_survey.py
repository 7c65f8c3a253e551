"""Survey-level checkpoint/resume (`survey.run_survey`).

The reference has no job-level fault recovery (SURVEY §5): an interrupted
`rtm_code` shot loop (`cuda_reference_RTM/src/fd-code.cu:480-529`) restarts
from shot 0. These tests pin the two properties the module promises:
chunked execution is exact (per-shot PRNG keys and the `rtm_main`
cross-shot it=0 quirk are functions of the *global* shot index), and a run
killed mid-survey resumes from the completed chunks without recomputation.
"""

import numpy as np
import pytest

import parallel_finite_difference_computation_tpu as pfdc
from parallel_finite_difference_computation_tpu import pipeline, survey
from parallel_finite_difference_computation_tpu.models import layered_model


def _params(ns=5, **kw):
    d = dict(nz=24, nx=24, nt=40, dz=10.0, dx=10.0, dt=0.001,
             fpeak=25.0, ns=ns, sz=0, fsx=2, ds=4, gz=0,
             nxb=8, nzb=8, fac=0.7, order=8)
    d.update(kw)
    return pfdc.Params(**d)


@pytest.fixture(scope="module")
def setup():
    p = _params()
    vp = layered_model(p.nx, p.nz, (1500.0, 2500.0), interfaces=[12])
    rng = np.random.default_rng(7)
    dobs = rng.standard_normal((p.ns, p.nx, p.nt)).astype(np.float32)
    return p, vp, dobs


class TestShotIndices:
    def test_rtm_gpu_chunked_equals_full(self, setup):
        """Per-shot boundary PRNG keys are global-index keyed, so a subset
        run reproduces the same shots of the full run exactly."""
        p, vp, dobs = setup
        _, full = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=3,
                                       backend="lax")
        _, part = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=3,
                                       backend="lax",
                                       shot_indices=np.array([1, 3, 4]))
        np.testing.assert_array_equal(part, full[[1, 3, 4]])

    def test_rtm_cpu_chunked_equals_full(self, setup):
        """The it=0 flat-read of a chunk's last shot must take the *true
        successor's* first sample from the full survey (rtm_main.cpp:202),
        not 0 — single-shot chunks exercise every cross-shot boundary."""
        p, vp, dobs = setup
        _, full = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs)
        for i in range(p.ns):
            _, part = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs,
                                           shot_indices=np.array([i]))
            np.testing.assert_array_equal(part[0], full[i], err_msg=str(i))

    def test_rtm_cpu_domain_chunked_equals_full(self, setup, monkeypatch):
        """The domain-decomposed path threads the cross-shot sample through
        embed_injection_rows(next_first=...)."""
        jax = pytest.importorskip("jax")
        if len(jax.devices()) < 4:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        from parallel_finite_difference_computation_tpu.parallel import (
            make_mesh)
        p, vp, dobs = setup
        mesh = make_mesh(n_shot=1, n_x=2)
        _, full = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs)
        _, part = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs, mesh=mesh,
                                       shot_indices=np.array([1, 2]))
        scale = np.abs(full).max() or 1.0
        np.testing.assert_allclose(part / scale, full[[1, 2]] / scale,
                                   atol=1e-5)


class TestSurveyCheckpoint:
    def test_survey_matches_direct_run(self, setup, tmp_path):
        p, vp, dobs = setup
        img0, im0 = pipeline.run_rtm_gpu(p, vp=vp, dobs=dobs, seed=3,
                                         backend="lax")
        img1, im1 = survey.run_survey(p, str(tmp_path / "ck"), vp=vp,
                                      dobs=dobs, chunk_shots=2, seed=3,
                                      backend="lax")
        np.testing.assert_array_equal(im1, im0)
        np.testing.assert_allclose(img1, img0, rtol=1e-6)

    def test_resume_after_crash(self, setup, tmp_path, monkeypatch):
        """Kill the run inside chunk 2; the resumed run must reuse chunk 1
        from disk (no recomputation) and finish with the exact result."""
        p, vp, dobs = setup
        ck = str(tmp_path / "ck")
        calls = []
        real = pipeline.run_rtm_gpu

        def dying(*a, **kw):
            calls.append(np.asarray(kw["shot_indices"]).tolist())
            if len(calls) == 2:
                raise KeyboardInterrupt("simulated preemption")
            return real(*a, **kw)

        monkeypatch.setattr(pipeline, "run_rtm_gpu", dying)
        with pytest.raises(KeyboardInterrupt):
            survey.run_survey(p, ck, vp=vp, dobs=dobs, chunk_shots=2,
                              seed=3, backend="lax")
        assert calls == [[0, 1], [2, 3]]

        calls.clear()
        monkeypatch.setattr(pipeline, "run_rtm_gpu",
                            lambda *a, **kw: (calls.append(
                                np.asarray(kw["shot_indices"]).tolist())
                                or real(*a, **kw)))
        img1, im1 = survey.run_survey(p, ck, vp=vp, dobs=dobs,
                                      chunk_shots=2, seed=3, backend="lax")
        # chunk [0,2) was checkpointed; only [2,4) and [4,5) recompute
        assert calls == [[2, 3], [4]]
        img0, im0 = real(p, vp=vp, dobs=dobs, seed=3, backend="lax")
        np.testing.assert_array_equal(im1, im0)

    def test_rtm_cpu_kind(self, setup, tmp_path):
        p, vp, dobs = setup
        img0, im0 = pipeline.run_rtm_cpu(p, vp=vp, dobs=dobs)
        img1, im1 = survey.run_survey(p, str(tmp_path / "ck"),
                                      kind="rtm_cpu", vp=vp, dobs=dobs,
                                      chunk_shots=2)
        np.testing.assert_array_equal(im1, im0)

    def test_fingerprint_guard(self, setup, tmp_path):
        """A checkpoint dir written with one configuration refuses chunks
        for another (different seed / params / kind / chunking)."""
        p, vp, dobs = setup
        ck = str(tmp_path / "ck")
        survey.run_survey(p, ck, vp=vp, dobs=dobs, chunk_shots=2, seed=3,
                          backend="lax")
        with pytest.raises(ValueError, match="different survey"):
            survey.run_survey(p, ck, vp=vp, dobs=dobs, chunk_shots=2,
                              seed=4, backend="lax")
        with pytest.raises(ValueError, match="same chunking"):
            survey.run_survey(p, ck, vp=vp, dobs=dobs, chunk_shots=3,
                              seed=3, backend="lax")

    def test_outputs_written(self, setup, tmp_path):
        p, vp, dobs = setup
        out = tmp_path / "out"
        out.mkdir()
        img, _ = survey.run_survey(p, str(tmp_path / "ck"), vp=vp,
                                   dobs=dobs, chunk_shots=2, seed=3,
                                   backend="lax", outdir=str(out))
        got = np.fromfile(out / "dir.image", np.float32).reshape(p.nx, p.nz)
        np.testing.assert_array_equal(got, np.asarray(img, np.float32))
