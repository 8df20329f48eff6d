"""Primitive-op parity vs torch functional ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from orca_tpu.ops import nn_ops

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def rng(*shape):
    return np.random.RandomState(hash(shape) % 2**31).randn(*shape).astype(
        np.float32
    )


def test_conv1d_matches_torch():
    x = rng(2, 64, 16)  # N, L, C
    w = rng(9, 16, 24)  # K, Cin, Cout
    b = rng(24)
    ours = nn_ops.conv1d(jnp.array(x), jnp.array(w), jnp.array(b))
    theirs = F.conv1d(
        torch.tensor(x).permute(0, 2, 1),
        torch.tensor(w).permute(2, 1, 0),
        torch.tensor(b),
        padding=4,
    ).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


@pytest.mark.parametrize("dilation", [1, 2, 8])
def test_conv2d_matches_torch(dilation):
    x = rng(1, 40, 40, 8)
    w = rng(3, 3, 8, 12)
    b = rng(12)
    ours = nn_ops.conv2d(jnp.array(x), jnp.array(w), jnp.array(b), dilation=dilation)
    theirs = F.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2),
        torch.tensor(w).permute(3, 2, 0, 1),
        torch.tensor(b),
        padding=dilation,
        dilation=dilation,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


@pytest.mark.parametrize("k", [2, 4, 5])
def test_maxpool1d_matches_torch(k):
    x = rng(2, 40, 8)
    ours = nn_ops.maxpool1d(jnp.array(x), k)
    theirs = F.max_pool1d(torch.tensor(x).permute(0, 2, 1), k).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=0)


def test_batchnorm_eval_matches_torch():
    x = rng(2, 20, 16)
    bn = torch.nn.BatchNorm1d(16).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng(16)))
        bn.bias.copy_(torch.tensor(rng(16)))
        bn.running_mean.copy_(torch.tensor(rng(16)))
        bn.running_var.copy_(torch.tensor(np.abs(rng(16)) + 0.5))
    ours = nn_ops.batchnorm(
        jnp.array(x),
        jnp.array(bn.weight.detach().numpy()),
        jnp.array(bn.bias.detach().numpy()),
        jnp.array(bn.running_mean.numpy()),
        jnp.array(bn.running_var.numpy()),
    )
    with torch.no_grad():
        theirs = bn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_batchnorm_train_matches_torch():
    x = rng(4, 20, 16)
    bn = torch.nn.BatchNorm1d(16)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng(16)))
        bn.bias.copy_(torch.tensor(np.abs(rng(16))))
    y, mean, var, var_u = nn_ops.batchnorm_train(
        jnp.array(x),
        jnp.array(bn.weight.detach().numpy()),
        jnp.array(bn.bias.detach().numpy()),
    )
    theirs = bn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), theirs.detach().numpy(), atol=1e-5)
    # running stats use the unbiased variance in torch
    np.testing.assert_allclose(
        np.asarray(0.9 * 0 + 0.1 * var_u + 0.9 * 1 - 0.9),
        bn.running_var.numpy() - 0.9,
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(0.1 * mean), bn.running_mean.numpy(),
                               atol=1e-6)


def test_upsample_nearest_1d():
    x = rng(2, 10, 8)
    ours = nn_ops.upsample1d_nearest(jnp.array(x), 2)
    theirs = F.interpolate(torch.tensor(x).permute(0, 2, 1), scale_factor=2)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 1).numpy(), atol=0
    )


def test_upsample_nearest_2d():
    x = rng(1, 6, 6, 4)
    ours = nn_ops.upsample2d_nearest(jnp.array(x), 2)
    theirs = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=0
    )


def test_upsample_bilinear_2d_matches_torch_align_corners_false():
    x = rng(2, 13, 9, 4)
    ours = nn_ops.upsample2d_bilinear(jnp.array(x), 2)
    theirs = F.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2),
        scale_factor=2,
        mode="bilinear",
        align_corners=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=1e-6
    )


def test_fold_bn_into_conv():
    x = rng(2, 30, 16)
    w = rng(9, 16, 8)
    b = rng(8)
    bn = {
        "scale": jnp.array(rng(8)),
        "bias": jnp.array(rng(8)),
        "mean": jnp.array(rng(8)),
        "var": jnp.array(np.abs(rng(8)) + 0.5),
    }
    raw = nn_ops.batchnorm(
        nn_ops.conv1d(jnp.array(x), jnp.array(w), jnp.array(b)),
        bn["scale"], bn["bias"], bn["mean"], bn["var"],
    )
    wf, bf = nn_ops.fold_bn_into_conv(jnp.array(w), jnp.array(b), bn)
    folded = nn_ops.conv1d(jnp.array(x), wf, bf)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(raw), atol=1e-4)


def test_conv2d_bf16_matmul_path_matches_fp32_conv():
    """The bf16 k=3 fast path (_conv2d_k3_matmul, 9 shifted MXU dots) must
    agree with the fp32 lax conv to bf16 tolerance at every decoder
    dilation (reference Decoder dilations 1..64, orca_modules.py:36-460)."""
    import jax.numpy as jnp

    for d in (1, 2, 64):
        x = rng(2, 40, 40, 6)
        w = rng(3, 3, 6, 5) * 0.2
        b = rng(5)
        ref = nn_ops.conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=d
        )
        fast = nn_ops.conv2d(
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(w, jnp.bfloat16),
            jnp.asarray(b, jnp.bfloat16),
            dilation=d,
        )
        assert fast.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(fast, np.float32), np.asarray(ref), atol=0.15, rtol=0.1
        )
