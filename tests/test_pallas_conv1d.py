"""Parity tests for the fused Pallas encoder kernels (interpret mode).

The fused conv-chain kernel (orca_tpu/ops/pallas/conv1d.py) must be
bit-equivalent (up to float addition order) to the composed lax path
(apply_encoder_stages / apply_encoder_stages_masked), which is itself
parity-tested against the reference torch Encoder in test_module_parity.py
(orca_modules.py:803-980).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orca_tpu.nn import encoders
from orca_tpu.nn.core import fold_params
from orca_tpu.ops import nn_ops
from orca_tpu.ops.pallas.conv1d import (
    fused_conv_chain_packed,
    pack2,
    s2d_conv_weights,
    unpack2,
)


pytestmark = pytest.mark.slow


def _rng(*shape):
    return (
        np.random.RandomState(hash(shape) % 2**31)
        .randn(*shape)
        .astype(np.float32)
        * 0.3
    )


def _inference_tower(seed=0):
    params = encoders.init_encoder_tower(jax.random.PRNGKey(seed))
    return fold_params(params, encoders.encoder_tower_spec())


def test_s2d_weights_match_dense_conv():
    """The f-packed conv with transformed weights equals the dense k=9 conv."""
    x = _rng(2, 64, 16)
    w = _rng(9, 16, 24)
    b = _rng(24)
    dense = nn_ops.conv1d(jnp.array(x), jnp.array(w), jnp.array(b))
    for f in (2, 4, 16):
        wp, bp = s2d_conv_weights(jnp.array(w), jnp.array(b), f=f)
        packed = nn_ops.conv1d(
            jnp.array(x).reshape(2, 64 // f, 16 * f), wp, bp
        ).reshape(2, 64, 24)
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(dense), atol=2e-5
        )


@pytest.mark.parametrize("relus,res_idx", [((False, True), 0), ((True, True), -1)])
def test_fused_chain_matches_lax(relus, res_idx):
    """Fused chain kernel (interpret) == sequential conv/bias/relu/residual."""
    n_convs = len(relus)
    rows = 64  # 128 positions
    x = _rng(1, 2 * rows, 32)
    weights = tuple(
        (jnp.array(_rng(9, 32, 32) + i), jnp.array(_rng(32) * (i + 1)))
        for i in range(n_convs)
    )
    vs = jnp.array([6])
    ve = jnp.array([2 * rows - 10])

    # lax oracle with per-conv masking
    pos = jnp.arange(2 * rows)
    m = ((pos >= vs[0]) & (pos < ve[0]))[None, :, None].astype(jnp.float32)
    ref = jnp.array(x) * m
    lout = None
    for i, ((w, b), relu) in enumerate(zip(weights, relus)):
        ref = nn_ops.conv1d(ref, w, b)
        if relu:
            ref = jnp.maximum(ref, 0.0)
        ref = ref * m
        if i == res_idx:
            lout = ref
    if lout is not None:
        ref = ref + lout

    out = unpack2(
        fused_conv_chain_packed(
            pack2(jnp.array(x)),
            weights,
            vs,
            ve,
            relus=relus,
            residual_idx=res_idx,
            interpret=True,
        )
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


def test_fused_chain_multi_tile():
    """Tiled grid (halo stitched from neighbor blocks) == single tile."""
    rows = 96
    x = _rng(2, 2 * rows, 16)
    weights = tuple(
        (jnp.array(_rng(9, 16, 16)), jnp.array(_rng(16))) for _ in range(4)
    )
    vs = jnp.array([0, 8])
    ve = jnp.array([2 * rows, 2 * rows - 8])
    kw = dict(relus=(False, False, True, True), residual_idx=1, interpret=True)
    one = fused_conv_chain_packed(pack2(jnp.array(x)), weights, vs, ve, **kw)
    tiled = fused_conv_chain_packed(
        pack2(jnp.array(x)), weights, vs, ve, tile=32, **kw
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(one), atol=1e-4, rtol=1e-5
    )


def test_fused_chain_untileable_rows():
    """Row counts with no 16-aligned divisor (e.g. 1250 = stage-2 rows/100 of
    a 1Mb window) must pad to whole power-of-two tiles, not fall back to one
    giant VMEM tile (the pre-fix behavior that hung Mosaic at 125000 rows)."""
    rows = 1250
    x = _rng(1, 2 * rows, 16)
    weights = tuple(
        (jnp.array(_rng(9, 16, 16)), jnp.array(_rng(16))) for _ in range(4)
    )
    vs = jnp.array([0])
    ve = jnp.array([2 * rows])
    kw = dict(relus=(False, False, True, True), residual_idx=1, interpret=True)
    # single padded tile (default plan) vs multi-tile padded (tile=512)
    one = fused_conv_chain_packed(pack2(jnp.array(x)), weights, vs, ve, **kw)
    tiled = fused_conv_chain_packed(
        pack2(jnp.array(x)), weights, vs, ve, tile=512, **kw
    )
    assert one.shape == (1, rows, 32)
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(one), atol=1e-4, rtol=1e-5
    )
    # oracle: lax conv chain
    ref = jnp.array(x)
    lout = None
    for i, ((w, b), relu) in enumerate(zip(weights, kw["relus"])):
        ref = nn_ops.conv1d(ref, w, b)
        if relu:
            ref = jnp.maximum(ref, 0.0)
        if i == 1:
            lout = ref
    ref = ref + lout
    np.testing.assert_allclose(
        np.asarray(unpack2(one)), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


@pytest.mark.parametrize("pool", [2, 4, 5])
def test_fused_chain_out_pool(pool):
    """out_pool fuses the next stage's pre-maxpool into the kernel epilogue:
    fused == (chain without pool) -> XLA maxpool, including masked edges."""
    rows = 80  # 160 positions, divisible by 2*pool for pool in {2,4,5}
    x = _rng(2, 2 * rows, 16)
    weights = tuple(
        (jnp.array(_rng(9, 16, 16)), jnp.array(_rng(16))) for _ in range(4)
    )
    vs = jnp.array([0, 2 * pool])
    ve = jnp.array([2 * rows, 2 * rows - 4 * pool])
    kw = dict(relus=(False, False, True, True), residual_idx=1, interpret=True)
    plain = fused_conv_chain_packed(pack2(jnp.array(x)), weights, vs, ve, **kw)
    ref = pack2(nn_ops.maxpool1d(unpack2(plain), pool))
    fused = fused_conv_chain_packed(
        pack2(jnp.array(x)), weights, vs, ve, out_pool=pool, **kw
    )
    assert fused.shape == (2, rows // pool, 32)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-4, rtol=1e-5
    )
    # multi-tile grid agrees too (tile must be a multiple of 16*pool)
    tiled = fused_conv_chain_packed(
        pack2(jnp.array(x)), weights, vs, ve, out_pool=pool, tile=16 * pool,
        **kw
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(fused), atol=1e-4, rtol=1e-5
    )


@pytest.mark.parametrize("pool", [1, 4])
def test_fused_first_stage(pool):
    """Stage-0 kernel (in-VMEM f=16 first conv -> f=2 reshape -> chain ->
    pool) == XLA first conv + fused chain."""
    from orca_tpu.ops.pallas.conv1d import fused_first_stage_packed

    L = 1280  # rows16=80, f2 rows=640
    x = _rng(2, L, 4)
    w0 = (jnp.array(_rng(9, 4, 64)), jnp.array(_rng(64)))
    chain = tuple(
        (jnp.array(_rng(9, 64, 64) * 0.2), jnp.array(_rng(64)))
        for _ in range(3)
    )
    vs = jnp.array([0, 16])
    ve = jnp.array([L, L - 32])
    kw = dict(relus=(False, True, True), residual_idx=0, interpret=True)

    # oracle: dense conv0 + masked chain via the generic kernel
    a = nn_ops.conv1d(jnp.array(x), w0[0], w0[1])
    pos = jnp.arange(L)
    m = ((pos[None, :] >= vs[:, None]) & (pos[None, :] < ve[:, None]))
    a = a * m[:, :, None].astype(a.dtype)
    want = fused_conv_chain_packed(pack2(a), chain, vs, ve, out_pool=pool,
                                   **kw)
    got = fused_first_stage_packed(
        jnp.array(x).reshape(2, L // 16, 64), w0, chain, vs, ve,
        out_pool=pool, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
    )
    # multi-tile grid (f16 halo blocks) agrees
    tiled = fused_first_stage_packed(
        jnp.array(x).reshape(2, L // 16, 64), w0, chain, vs, ve,
        out_pool=pool, tile=320, **kw
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(got), atol=1e-4, rtol=1e-5
    )


def test_pallas_encoder_stages_match_lax():
    """Full 7-stage Pallas tower (interpret) == apply_encoder_stages."""
    params = _inference_tower()
    L = 32000
    x = _rng(1, L, 4)
    ref = encoders.apply_encoder_stages(params, jnp.array(x))
    out = encoders.apply_encoder_stages_pallas(
        params, jnp.array(x), 0, L, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_tower_pallas_gating_blockwise_parity():
    """apply_encoder_tower with the Pallas path forced on (interpret mode)
    must equal the lax path, both monolithic and blocked+grouped — this
    drives the config gating, f=16 first conv, and block batching together."""
    import dataclasses

    from orca_tpu.utils import config as cfgmod

    params = _inference_tower(2)
    L = 48000
    x = jnp.array(_rng(1, L, 4))
    ref = encoders.apply_encoder_tower(params, x)
    # blocked lax oracle: same block/halo geometry as the pallas run below
    # (halo < receptive field, so this differs from monolithic — the pallas
    # path must reproduce the *same* masked-block semantics bit-for-bit).
    ref_blocked = encoders.apply_encoder_tower(
        params, x, block_bp=16000, halo_bp=8000
    )
    old = cfgmod.get_config()
    try:
        cfgmod.set_config(
            dataclasses.replace(
                old, use_pallas=True, interpret_pallas=True,
                pallas_block_bp=48000,
            )
        )
        mono = encoders.apply_encoder_tower(params, x)
        blocked = encoders.apply_encoder_tower(
            params, x, block_bp=16000, halo_bp=8000, block_group=2
        )
    finally:
        cfgmod.set_config(old)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(ref), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(ref_blocked), atol=1e-3
    )


def test_pallas_encoder_stages_masked_parity():
    """Masked Pallas tower == masked lax tower on interior valid ranges."""
    params = _inference_tower(1)
    L = 32000
    x = _rng(2, L, 4)
    vs = jnp.array([4000, 0])
    ve = jnp.array([L - 8000, L])
    ref = encoders.apply_encoder_stages_masked(params, jnp.array(x), vs, ve)
    out = encoders.apply_encoder_stages_pallas(
        params, jnp.array(x), vs, ve, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
