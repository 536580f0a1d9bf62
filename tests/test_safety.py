"""Safety filter mechanics (reference DeepFloydDataFiltering parity):
probe scoring, threshold gating, blur-on-trigger, head loading."""

import numpy as np
import pytest

from multiview_inpaint_tpu.diffusion.safety import (SafetyFilter,
                                                    _box_blur, load_heads)


def _embed(img):
    # Deterministic fake CLIP embedding: mean-pooled patches.
    v = img.reshape(-1)[:64].astype(np.float64)
    return v / (np.linalg.norm(v) + 1e-9)


def _heads(nsfw_bias, wm_bias, d=64):
    return {"nsfw": np.concatenate([np.zeros(d), [nsfw_bias]]),
            "watermark": np.concatenate([np.zeros(d), [wm_bias]])}


def test_scores_sigmoid_of_probe_logit():
    f = SafetyFilter(img_embed=_embed, heads=_heads(0.0, 100.0))
    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    s = f.scores(img)
    assert abs(s["nsfw"] - 0.5) < 1e-6          # zero logit
    assert s["watermark"] > 0.999               # huge positive bias


def test_blur_triggers_above_threshold_only():
    rng = np.random.default_rng(1)
    img = rng.random((24, 24, 3)).astype(np.float32)

    clean = SafetyFilter(img_embed=_embed, heads=_heads(-100.0, -100.0))
    np.testing.assert_array_equal(clean(img), img)

    hot = SafetyFilter(img_embed=_embed, heads=_heads(100.0, -100.0))
    out = hot(img)
    assert not np.array_equal(out, img)
    np.testing.assert_allclose(out, _box_blur(img, k=9), rtol=1e-6)
    # blur actually removes high-frequency energy
    assert np.abs(np.diff(out, axis=0)).mean() < \
        0.25 * np.abs(np.diff(img, axis=0)).mean()


def test_no_heads_is_reporting_noop():
    f = SafetyFilter(img_embed=None, heads={})
    img = np.ones((8, 8, 3), np.float32)
    assert f.scores(img) == {"nsfw": 0.0, "watermark": 0.0}
    np.testing.assert_array_equal(f(img), img)


def test_load_heads_roundtrip(tmp_path):
    path = str(tmp_path / "heads.npz")
    h = _heads(1.5, -2.5, d=8)
    np.savez(path, **h)
    got = load_heads(path)
    np.testing.assert_allclose(got["nsfw"], h["nsfw"])
    np.testing.assert_allclose(got["watermark"], h["watermark"])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
