"""Training subsystem tests: losses, BN state threading, stage steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orca_tpu.models.zoo import _random_normmats
from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import BNUpdates, fold_params, merge_bn_updates
from orca_tpu.predict.multiscale import CascadeGeometry
from orca_tpu.training import losses, optim, swa
from orca_tpu.training.stages import (
    StageAConfig,
    StageBConfig,
    make_stage_a_step,
    make_stage_b_step,
)


pytestmark = pytest.mark.slow


def test_downsample_nanmean():
    t = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    t[0, 0, 0] = np.nan
    out = np.asarray(losses.downsample_nanmean(jnp.array(t), 2, 2))
    assert out.shape == (1, 2, 2)
    np.testing.assert_allclose(out[0, 0, 0], np.nanmean(t[0, :2, :2]))
    np.testing.assert_allclose(out[0, 1, 1], t[0, 2:, 2:].mean())


def test_masked_mse_ignores_nans():
    pred = jnp.ones((2, 4, 4))
    target = jnp.full((2, 4, 4), 2.0).at[0, 0, 0].set(jnp.nan)
    loss = losses.masked_mse(pred, target)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    p = np.random.RandomState(0).rand(4, 8).astype(np.float32)
    t = (np.random.RandomState(1).rand(4, 8) > 0.5).astype(np.float32)
    ours = float(losses.bce(jnp.array(p), jnp.array(t)))
    theirs = float(
        torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t))
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pearson_r():
    rng = np.random.RandomState(2)
    a = rng.randn(100).astype(np.float32)
    b = (0.5 * a + rng.randn(100) * 0.5).astype(np.float32)
    b[::7] = np.nan
    from scipy.stats import pearsonr

    mask = np.isfinite(b)
    want = pearsonr(a[mask], b[mask])[0]
    got = float(losses.pearson_r(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bn_updates_merge_roundtrip():
    key = jax.random.PRNGKey(0)
    params = encoders.init_encoder_tower(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8000, 4))
    bn = BNUpdates()
    encoders.apply_encoder_stages(params, x, train=True,
                                  rng=jax.random.PRNGKey(2), bn_updates=bn)
    assert len(bn.updates) == 7 * 2 * 2  # 7 stages x (lconv+conv) x 2 units
    merged = merge_bn_updates(params, bn)
    # running mean moved away from zero init
    m0 = merged["lconv"][0][0]["bn"]["mean"]
    assert float(jnp.abs(m0).max()) > 0
    # original untouched
    assert float(jnp.abs(params["lconv"][0][0]["bn"]["mean"]).max()) == 0


def test_swa_average():
    p0 = {"w": jnp.zeros(3)}
    s = swa.swa_init(p0)
    s = swa.swa_update(s, {"w": jnp.ones(3) * 2})
    s = swa.swa_update(s, {"w": jnp.ones(3) * 4})
    # avg starts at p0: updates -> (0+2)/... torch AveragedModel averages
    # over update calls: first update avg=(0+2)/2? No: avg_fn averages
    # averaged_model_parameter with model_parameter over n_averaged.
    np.testing.assert_allclose(np.asarray(s["avg"]["w"]), 3.0)


def test_plateau_scheduler():
    sch = optim.ReduceLROnPlateau(lr=1.0, factor=0.5, patience=1)
    assert sch.step(0.5) == 1.0
    assert sch.step(0.4) == 1.0  # bad 1
    assert sch.step(0.4) == 0.5  # bad 2 > patience -> decay
    assert sch.step(0.9) == 0.5  # new best


def test_stage_a_step_decreases_loss():
    cfg = StageAConfig(num_1d=4, crop=10, target_factor=4, seq_len=40_000,
                      remat=False)
    params = decoders.init_net(jax.random.PRNGKey(0), num_1d=4)
    opt, step = make_stage_a_step(cfg)
    opt_state = opt.init(params)
    rng = np.random.RandomState(3)
    seq = jnp.array(rng.rand(2, 40_000, 4).astype(np.float32))
    target = jnp.array(np.abs(rng.rand(2, 40, 40)).astype(np.float32))
    target_1d = jnp.array((rng.rand(2, 10, 4) > 0.5).astype(np.float32))
    normmat_r = jnp.array(np.full((10, 10), 0.1, np.float32))
    eps = 0.1
    metrics_hist = []
    for i in range(4):
        params, opt_state, metrics = step(
            params, opt_state, seq, target, target_1d,
            jax.random.PRNGKey(10), jnp.float32(0.002), normmat_r, eps,
        )
        metrics_hist.append(float(metrics["loss"]))
    assert metrics_hist[-1] < metrics_hist[0]


def test_stage_b_step_runs():
    geom = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)
    # two levels keep the XLA:CPU compile tractable while covering the
    # coarse-pred refinement and the frozen decoder_1pt head (level 1)
    levels = (32, 1)
    cfg = StageBConfig(geometry=geom, encoder_block_bp=None, levels=levels)
    key = jax.random.PRNGKey(0)
    ke, kp, kd = jax.random.split(key, 3)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 5, True),
        "decoders": {
            lv: decoders.init_decoder(k)
            for lv, k in zip(levels, jax.random.split(kd, len(levels)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "decoder_1pt": fold_params(
            decoders.init_decoder1m(jax.random.PRNGKey(9)),
            decoders.decoder1m_spec(1),
        ),
    }
    opt, step = make_stage_b_step(cfg)
    opt_state = opt.init(trainable)
    normmats, epss = _random_normmats(levels=levels, nbins=geom.bins,
                                      crop=geom.crop)
    nm = jnp.stack(
        [jnp.array(normmats[lv], jnp.float32) for lv in levels]
    )
    ep = jnp.array([epss[lv] for lv in levels], jnp.float32)
    rng = np.random.RandomState(4)
    seq = jnp.array(rng.rand(1, geom.window_bp, 4).astype(np.float32))
    target = jnp.array(np.abs(rng.rand(1, geom.bins, geom.bins)).astype(
        np.float32))
    trainable, opt_state, metrics = step(
        trainable, frozen, opt_state, seq, target, jax.random.PRNGKey(5),
        jnp.float32(0.002), nm, ep,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert set(metrics) == {"loss"} | {f"loss_{lv}" for lv in levels}


def test_stage_a_step_multi_head():
    """num_2d>1 (leukemia-style): per-dataset targets/normmats, one output
    head per dataset (orca_leukemia.py model family, trained)."""
    cfg = StageAConfig(num_1d=None, num_2d=2, crop=10, target_factor=4,
                       seq_len=40_000, remat=False)
    params = decoders.init_net(jax.random.PRNGKey(0), num_1d=None, num_2d=2)
    opt, step = make_stage_a_step(cfg)
    opt_state = opt.init(params)
    rng = np.random.RandomState(5)
    seq = jnp.array(rng.rand(2, 40_000, 4).astype(np.float32))
    target = jnp.array(np.abs(rng.rand(2, 2, 40, 40)).astype(np.float32))
    target_1d = jnp.zeros((2, 10, 0), jnp.float32)
    normmat_r = jnp.array(
        np.stack([np.full((10, 10), 0.1), np.full((10, 10), 0.2)]),
        jnp.float32,
    )
    hist = []
    for _ in range(3):
        params, opt_state, metrics = step(
            params, opt_state, seq, target, target_1d,
            jax.random.PRNGKey(11), jnp.float32(0.002), normmat_r, 0.1,
        )
        hist.append(float(metrics["loss"]))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_stage_b_step_multi_head():
    geom = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)
    levels = (32, 1)
    num_2d = 2
    # leukemia pyramid has no upward pass (orca_leukemia.py:1499-1601)
    cfg = StageBConfig(geometry=geom, encoder_block_bp=None, levels=levels,
                       num_2d=num_2d, up_pass=False)
    key = jax.random.PRNGKey(3)
    ke, kp, kd = jax.random.split(key, 3)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 5, False),
        "decoders": {
            lv: decoders.init_decoder(k, num_2d=num_2d)
            for lv, k in zip(levels, jax.random.split(kd, len(levels)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "decoder_1pt": fold_params(
            decoders.init_decoder1m(jax.random.PRNGKey(9), num_2d=num_2d),
            decoders.decoder1m_spec(num_2d),
        ),
    }
    opt, step = make_stage_b_step(cfg)
    opt_state = opt.init(trainable)
    from orca_tpu.models.zoo import multi_normmats_from_expectations

    d = np.arange(geom.bins, dtype=np.float64)
    normmats, epss = multi_normmats_from_expectations(
        [-1.5 * np.log1p(d) - 2.0, -1.4 * np.log1p(d) - 2.1],
        levels=levels, nbins=geom.bins, crop=geom.crop,
    )
    nm = jnp.stack(
        [jnp.array(normmats[lv], jnp.float32) for lv in levels]
    )  # (n_levels, num_2d, crop, crop)
    ep = jnp.array([epss[lv] for lv in levels], jnp.float32)
    rng = np.random.RandomState(6)
    seq = jnp.array(rng.rand(1, geom.window_bp, 4).astype(np.float32))
    target = jnp.array(
        np.abs(rng.rand(1, num_2d, geom.bins, geom.bins)).astype(np.float32)
    )
    trainable, opt_state, metrics = step(
        trainable, frozen, opt_state, seq, target, jax.random.PRNGKey(7),
        jnp.float32(0.002), nm, ep,
    )
    assert np.isfinite(float(metrics["loss"]))


def test_sampler_stacked_contact_matrix():
    from orca_tpu.data import genome as g
    from orca_tpu.data.sampler import RandomWindowSampler
    from orca_tpu.data.targets import DenseContactMatrix, StackedContactMatrix

    rng = np.random.RandomState(0)
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, 100_000).astype(np.uint8),
        "chr2": rng.randint(0, 4, 100_000).astype(np.uint8),
    })
    singles = []
    for i in range(2):
        mats = {c: np.abs(rng.rand(100, 100)).astype(np.float32)
                for c, _ in gen.get_chr_lens()}
        singles.append(DenseContactMatrix(mats, resolution=1000,
                                          shape=(20, 20)))
    stacked = StackedContactMatrix(singles)
    assert stacked.shape == (2, 20, 20)
    sampler = RandomWindowSampler(
        gen, stacked, sequence_length=20_000, position_resolution=1000,
        random_strand=True, cross_chromosome=True,
        validation_holdout=["chr2"], test_holdout=[], seed=3,
    )
    seq, target = sampler.sample(2)[:2]
    assert target.shape == (2, 2, 20, 20)
    # each head slice equals the corresponding single-source retrieval
    coords = sampler.sample(1, coordinate_only=True)[0]
    t = stacked.get_feature_data(
        coords[0].chrom, coords[0].start, coords[0].end
    )
    for i in range(2):
        np.testing.assert_array_equal(
            t[i],
            singles[i].get_feature_data(
                coords[0].chrom, coords[0].start, coords[0].end
            ),
        )
