"""SweepModel / PackNet / PWCLite / correlation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.models.packnet import PackNetModel
from depthestimation_tpu.models.pwclite import PWCLite, flow_warp
from depthestimation_tpu.models.sweep import SweepModel
from depthestimation_tpu.ops.correlation import correlation
import pytest


def test_correlation_matches_reference_math():
    """Oracle: the reference's pure-torch shift-and-multiply
    (models/correlation_native.py:13-23)."""
    rng = np.random.default_rng(0)
    c, h, w = 8, 10, 12
    md = 2
    x1 = rng.standard_normal((c, h, w)).astype(np.float32)
    x2 = rng.standard_normal((c, h, w)).astype(np.float32)
    out = np.asarray(correlation(jnp.asarray(x1), jnp.asarray(x2), md))
    assert out.shape == ((2 * md + 1) ** 2, h, w)

    x2p = np.pad(x2, ((0, 0), (md, md), (md, md)))
    k = 0
    for i in range(2 * md + 1):
        for j in range(2 * md + 1):
            expect = (x1 * x2p[:, i:i + h, j:j + w]).mean(0)
            np.testing.assert_allclose(out[k], expect, atol=1e-5)
            k += 1


def test_flow_warp_integer_shift():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 8, 12)).astype(np.float32)
    flow = np.zeros((1, 2, 8, 12), np.float32)
    flow[:, 0] = 2.0  # sample from x+2
    out = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :, :-2], img[0, :, :, 2:], atol=1e-5)


def test_sweep_model_shapes_and_ranges():
    model = SweepModel(feature_dim=32)
    rgb = jnp.asarray(np.random.default_rng(2)
                      .random((1, 2, 3, 64, 96)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), {"rgb": rgb}, train=False)
    out = model.apply(variables, {"rgb": rgb}, train=False)
    small, big = out["output"][0], out["output_refined"][0]
    assert small.shape == (1, 2, 16, 24)
    assert big.shape == (1, 2, 64, 96)
    pp, ps = np.asarray(big[:, 0]), np.asarray(big[:, 1])
    assert pp.min() >= 0 and pp.max() <= 1
    assert ps.min() >= 0.1 and ps.max() <= 4.1


@pytest.mark.slow
def test_packnet_forward():
    from depthestimation_tpu.data import synthetic
    mi, _ = synthetic.make_batch(batch=1, h=64, w=96, ndepth=64, seed=3)
    mi = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in mi.items()}
    model = PackNetModel(feature_dim=64, d=64)
    variables = model.init(jax.random.PRNGKey(0), mi, train=False)
    out = model.apply(variables, mi, train=False)
    assert out["output"][0].shape == (1, 64, 16, 24)
    assert out["output_refined"][0].shape == (1, 64, 64, 96)
    p = np.asarray(jnp.exp(out["output_refined"][0]).sum(1))
    np.testing.assert_allclose(p, 1.0, atol=1e-3)


def test_pwclite_forward():
    model = PWCLite(n_frames=2)
    x = jnp.asarray(np.random.default_rng(4)
                    .random((1, 6, 64, 128)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, with_bk=True)
    assert len(out["flows_fw"]) == 5
    # finest flow upsampled 4x from the 1/4 level -> full res
    assert out["flows_fw"][0].shape == (1, 2, 64, 128)
    assert "flows_bw" in out


def test_ternary_loss_matches_torch_oracle():
    """ternary_loss vs a direct torch implementation of the reference
    census transform (loss_blocks.py:8-44)."""
    import torch
    import torch.nn.functional as F

    from depthestimation_tpu.losses.blocks import ternary_loss

    def oracle(im, im_warp, max_distance=1):
        patch_size = 2 * max_distance + 1

        def gray(image):
            g = (image[:, 0] * 0.2989 + image[:, 1] * 0.5870
                 + image[:, 2] * 0.1140)
            return g.unsqueeze(1)

        def transform(image):
            intens = gray(image) * 255
            oc = patch_size * patch_size
            w = torch.eye(oc).view((oc, 1, patch_size, patch_size))
            patches = F.conv2d(intens, w, padding=max_distance)
            t = patches - intens
            return t / torch.sqrt(0.81 + t.pow(2))

        t1, t2 = transform(im), transform(im_warp)
        dist = (t1 - t2).pow(2)
        dist = (dist / (0.1 + dist)).mean(1, keepdim=True)
        n, _, h, w = im.shape
        inner = torch.ones(n, 1, h - 2 * max_distance, w - 2 * max_distance)
        mask = F.pad(inner, [max_distance] * 4)
        return dist * mask

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 3, 16, 20)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 3, 16, 20)).astype(np.float32)
    want = oracle(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(ternary_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-4)
