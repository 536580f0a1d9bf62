"""Golden tests for core math vs small numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.utils import graphics, losses, quaternion, schedules, sh


def test_world_to_view_roundtrip():
    rng = np.random.default_rng(0)
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3)
    w2v = graphics.world_to_view(q, t)
    assert w2v.shape == (4, 4)
    # R stored transposed, t in last column.
    np.testing.assert_allclose(w2v[:3, :3], q.T, atol=1e-6)
    np.testing.assert_allclose(w2v[:3, 3], t, atol=1e-6)
    # translate/scale recentres the camera.
    w2v2 = graphics.world_to_view(q, t, translate=np.array([1.0, 0, 0]),
                                  scale=2.0)
    c1 = np.linalg.inv(w2v)[:3, 3]
    c2 = np.linalg.inv(w2v2)[:3, 3]
    np.testing.assert_allclose(c2, (c1 + [1, 0, 0]) * 2.0, atol=1e-5)


def test_projection_matrix_matches_reference_form():
    znear, zfar = 0.01, 100.0
    fovx, fovy = 1.2, 0.9
    P = graphics.projection_matrix(znear, zfar, fovx, fovy)
    assert P[0, 0] == pytest.approx(1.0 / np.tan(fovx / 2))
    assert P[1, 1] == pytest.approx(1.0 / np.tan(fovy / 2))
    assert P[3, 2] == 1.0
    assert P[2, 2] == pytest.approx(zfar / (zfar - znear))
    assert P[2, 3] == pytest.approx(-(zfar * znear) / (zfar - znear))
    # A point at z=znear maps to NDC z=0; z=zfar maps to 1.
    for z, expect in [(znear, 0.0), (zfar, 1.0)]:
        p = P @ np.array([0, 0, z, 1.0])
        assert p[2] / p[3] == pytest.approx(expect, abs=1e-5)


def test_fov_focal_roundtrip():
    assert graphics.focal2fov(graphics.fov2focal(0.8, 640), 640) == \
        pytest.approx(0.8)


def test_sh_degree0_is_dc():
    shs = jnp.ones((5, 3, 1)) * 2.0
    out = sh.eval_sh(0, shs, jnp.zeros((5, 3)))
    np.testing.assert_allclose(out, 2.0 * sh.C0, atol=1e-6)
    # rgb<->sh roundtrip
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb,
                               atol=1e-6)


def test_sh_degree2_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    coeffs = rng.normal(size=(4, 1, 9)).astype(np.float32)
    dirs = rng.normal(size=(4, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = np.asarray(sh.eval_sh(2, jnp.asarray(coeffs), jnp.asarray(dirs)))
    # numpy oracle with the plenoctree constants
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    c = coeffs[:, 0, :]
    expect = (sh.C0 * c[:, 0:1]
              - sh.C1 * y * c[:, 1:2] + sh.C1 * z * c[:, 2:3]
              - sh.C1 * x * c[:, 3:4]
              + sh.C2[0] * x * y * c[:, 4:5]
              + sh.C2[1] * y * z * c[:, 5:6]
              + sh.C2[2] * (2 * z * z - x * x - y * y) * c[:, 6:7]
              + sh.C2[3] * x * z * c[:, 7:8]
              + sh.C2[4] * (x * x - y * y) * c[:, 8:9])
    np.testing.assert_allclose(out[:, 0], expect[:, 0], atol=1e-5)


def test_quat_to_rotmat_identity_and_orthonormal():
    q = jnp.array([[1.0, 0, 0, 0], [0.3, -0.5, 0.7, 0.1]])
    R = np.asarray(quaternion.quat_to_rotmat(q))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1] @ R[1].T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R[1]) == pytest.approx(1.0, abs=1e-5)


def test_covariance_psd():
    scale = jnp.array([[0.1, 0.2, 0.3]])
    q = jnp.array([[0.9, 0.1, -0.2, 0.3]])
    cov = np.asarray(quaternion.covariance_from_scaling_rotation(scale, q))[0]
    np.testing.assert_allclose(cov, cov.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(cov) > 0)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((3, 32, 32)), dtype=jnp.float32)
    assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)
    noisy = img + 0.3 * jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
    assert float(losses.ssim(img, jnp.clip(noisy, 0, 1))) < 0.95


def test_ssim_matches_torch_style_oracle():
    """SSIM vs a direct numpy implementation of the reference formula."""
    rng = np.random.default_rng(3)
    a = rng.random((1, 24, 24)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((1, 24, 24)).astype(np.float32),
                0, 1)
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))

    # numpy oracle: 11x11 separable gaussian, same-padding with zeros
    xs = np.arange(11) - 5
    g = np.exp(-(xs ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    w = np.outer(g, g)

    def blur(img):
        from scipy.signal import convolve2d  # noqa: F401
        raise RuntimeError

    try:
        from scipy.signal import convolve2d
        def blur(img):  # noqa: F811
            return convolve2d(img[0], w, mode="same")[None]
        mu1, mu2 = blur(a), blur(b)
        s1 = blur(a * a) - mu1 ** 2
        s2 = blur(b * b) - mu2 ** 2
        s12 = blur(a * b) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        expect = float(np.mean(((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
                               ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))))
        assert got == pytest.approx(expect, abs=1e-4)
    except ImportError:
        pytest.skip("scipy not available")


def test_expon_lr_schedule():
    # Matches the reference get_expon_lr_func semantics.
    f = lambda s: float(schedules.expon_lr(s, 1e-3, 1e-5, max_steps=100))
    assert f(0) == pytest.approx(1e-3)
    assert f(100) == pytest.approx(1e-5)
    assert f(50) == pytest.approx(np.exp((np.log(1e-3) + np.log(1e-5)) / 2))
    assert f(-1) == 0.0
    # Delay ramp.
    v = float(schedules.expon_lr(5, 1e-3, 1e-5, max_steps=100,
                                 lr_delay_steps=10, lr_delay_mult=0.1))
    assert v < f(5)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(schedules.inverse_sigmoid(x)))), x,
        atol=1e-6)


def test_run_logger_wandb_fallback(tmp_path):
    """backend="wandb" must degrade to JSONL when wandb is absent
    (reference main.py:676-700 gates its WandbLogger the same way:
    logging never blocks training)."""
    from multiview_inpaint_tpu.utils.logging import RunLogger

    lg = RunLogger(str(tmp_path), "t", backend="wandb",
                   wandb_project="x", config={"a": 1})
    lg.log(0, loss=1.5)
    lg.log(-1, event="final", val=2.0)
    lg.close()
    import json as _json
    rows = [_json.loads(l) for l in open(lg.path)]
    assert rows[0]["loss"] == 1.5 and rows[1]["event"] == "final"

    import pytest
    with pytest.raises(ValueError):
        RunLogger(str(tmp_path), "t2", backend="nope")
