"""Channel blend/normalize function tests + MetricsBoard + image metrics."""

import numpy as np
import jax.numpy as jnp
import pytest

from wisp_tpu.core import channel_fn
from wisp_tpu.ops.image.metrics import psnr, ssim
from wisp_tpu.trainers.tracker.metrics import MetricsBoard


class TestBlendFns:
    def test_alpha_composite_over(self):
        c1 = jnp.asarray([[1.0, 0.0, 0.0]])
        c2 = jnp.asarray([[0.0, 0.0, 1.0]])
        out = channel_fn.blend_alpha_composite_over(
            c1, c2, jnp.asarray([[1.0]]), jnp.asarray([[1.0]]))
        np.testing.assert_allclose(np.asarray(out), [[1.0, 0.0, 0.0]], atol=1e-6)
        # half-transparent front blends
        out = channel_fn.blend_alpha_composite_over(
            c1, c2, jnp.asarray([[0.5]]), jnp.asarray([[1.0]]))
        np.testing.assert_allclose(np.asarray(out), [[0.5, 0.0, 0.5]], atol=1e-6)

    def test_normal_blend_front_wins(self):
        out = channel_fn.blend_normal(jnp.asarray([1.0]), jnp.asarray([2.0]),
                                      jnp.asarray([0.6]), jnp.asarray([1.0]))
        assert float(out[0]) == 1.0

    def test_multiply_screen_add_sub(self):
        a, b = jnp.asarray([0.5]), jnp.asarray([0.4])
        one = jnp.asarray([1.0])
        assert float(channel_fn.blend_multiply(a, b, one, one)[0]) == pytest.approx(0.2)
        assert float(channel_fn.blend_screen(a, b, one, one)[0]) == pytest.approx(0.7)
        assert float(channel_fn.blend_add(a, b, one, one)[0]) == pytest.approx(0.9)
        assert float(channel_fn.blend_sub(a, b, one, one)[0]) == pytest.approx(0.1)

    def test_slerp_unit_output(self):
        n1 = jnp.asarray([[1.0, 0.0, 0.0]])
        n2 = jnp.asarray([[0.0, 1.0, 0.0]])
        out = channel_fn.blend_alpha_slerp(n1, n2, jnp.asarray([[0.5]]),
                                           jnp.asarray([[0.5]]))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out)), 1.0, atol=1e-5)

    def test_normalize_fns(self):
        x = jnp.asarray([0.0, 5.0, 10.0])
        np.testing.assert_allclose(np.asarray(channel_fn.normalize(x)),
                                   [0.0, 0.5, 1.0], atol=1e-6)
        v = jnp.asarray([[0.0, 3.0, 4.0]])
        out = channel_fn.normalize_vector(v)
        assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


class TestMetricsBoard:
    def test_accumulation_and_average(self):
        m = MetricsBoard()
        m.define_metric("loss")
        m.loss += 2.0
        m.loss += 4.0
        assert m.average_metric("loss") == pytest.approx(3.0)
        averages = m.finalize_epoch()
        assert averages["loss"] == pytest.approx(3.0)
        assert m.average_metric("loss") == 0.0  # reset

    def test_finalize_pushes_to_scene_state(self):
        from wisp_tpu.framework.state import WispState
        state = WispState()
        m = MetricsBoard()
        m.define_metric("loss")
        m.loss += 1.0
        m.finalize_epoch(state)
        assert state.optimization.losses["loss"] == [1.0]


class TestImageMetrics:
    def test_psnr_identity_is_inf_like(self):
        img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
        assert psnr(img, img) > 80

    def test_psnr_known_value(self):
        a = np.zeros((8, 8, 3), np.float32)
        b = np.full((8, 8, 3), 0.1, np.float32)
        assert psnr(a, b) == pytest.approx(20.0, abs=0.01)

    def test_ssim_bounds(self):
        rng = np.random.default_rng(0)
        img = rng.random((32, 32, 3)).astype(np.float32)
        assert ssim(img, img) == pytest.approx(1.0, abs=1e-4)
        noise = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
        s = ssim(img, noise)
        assert 0.0 <= s < 0.95


class TestLPIPS:
    """Native-JAX LPIPS (VGG-16 + linear heads). Real pretrained weights aren't in this
    environment; these tests exercise the network with small random weights in the
    documented npz schema (tools/export_lpips_weights.py) and the explicit-drop path."""

    def _fake_weights(self, tmp_path):
        from wisp_tpu.ops.image import metrics as M
        rng = np.random.default_rng(0)
        out, cin = {}, 3
        for i, (cout, _pool) in enumerate(M._VGG_PLAN):
            out[f"conv{i}_w"] = rng.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32)
            out[f"conv{i}_b"] = np.zeros(cout, np.float32)
            cin = cout
        for k, tap in enumerate(M._TAPS):
            out[f"lin{k}_w"] = rng.random(M._VGG_PLAN[tap][0]).astype(np.float32)
        p = tmp_path / "lpips_fake.npz"
        np.savez(p, **out)
        return str(p)

    def test_lpips_runs_with_weights(self, tmp_path, monkeypatch):
        from wisp_tpu.ops.image import metrics as M
        monkeypatch.setenv("WISP_LPIPS_WEIGHTS", self._fake_weights(tmp_path))
        M.reset_lpips_cache()
        try:
            assert M.lpips_available()
            rng = np.random.default_rng(1)
            a = rng.random((64, 64, 3)).astype(np.float32)
            b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
            assert M.lpips(a, a) == pytest.approx(0.0, abs=1e-6)
            assert M.lpips(a, b) > 0.0
        finally:
            M.reset_lpips_cache()

    # frozen on 2026-08-17 (CPU backend, float32): the network under seed-0 synthetic
    # weights on deterministic image pairs. Any refactor of the JAX VGG forward (conv
    # plan, taps, normalization, lin-head clamping) that changes numerics trips this —
    # the drift guard the real-weight golden values would provide (real torch+lpips
    # goldens are not computable in this environment; tools/export_lpips_weights.py
    # prints them wherever torch+lpips exists).
    _GOLDEN = {"grad_vs_checker": 0.987562, "grad_vs_noise": 0.995275,
               "checker_vs_noise": 0.802357, "grad_vs_gradshift": 0.156906}

    def test_lpips_golden_values_frozen(self, tmp_path, monkeypatch):
        from wisp_tpu.ops.image import metrics as M
        monkeypatch.setenv("WISP_LPIPS_WEIGHTS", self._fake_weights(tmp_path))
        M.reset_lpips_cache()
        try:
            yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
            grad = np.stack([xx, yy, 0.5 * (xx + yy)], -1)
            checker = (np.indices((64, 64)).sum(0) % 2
                       ).astype(np.float32)[..., None].repeat(3, -1)
            noise = np.asarray(np.random.default_rng(7).random((64, 64, 3)), np.float32)
            pairs = {"grad_vs_checker": (grad, checker),
                     "grad_vs_noise": (grad, noise),
                     "checker_vs_noise": (checker, noise),
                     "grad_vs_gradshift": (grad, np.clip(grad + 0.1, 0, 1))}
            for name, (a, b) in pairs.items():
                assert M.lpips(a, b) == pytest.approx(self._GOLDEN[name], rel=2e-3), name
        finally:
            M.reset_lpips_cache()

    def test_lpips_unavailable_raises(self, monkeypatch):
        from wisp_tpu.ops.image import metrics as M
        monkeypatch.delenv("WISP_LPIPS_WEIGHTS", raising=False)
        M.reset_lpips_cache()
        try:
            assert not M.lpips_available()
            with pytest.raises(RuntimeError, match="WISP_LPIPS_WEIGHTS"):
                M.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))
        finally:
            M.reset_lpips_cache()


class TestChecks:
    def test_assert_all_finite(self):
        from wisp_tpu.utils.checks import assert_all_finite
        assert_all_finite({"a": jnp.ones(3)})
        with pytest.raises(FloatingPointError):
            assert_all_finite({"a": jnp.asarray([1.0, np.nan])})
