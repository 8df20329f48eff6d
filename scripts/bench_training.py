"""Training-step benchmark on the real accelerator (VERDICT r4 item 1).

Measures, at PRODUCTION geometry:
  * stage-a: 1Mb windows, batch 16, num_1d=32, fp32, live BN, remat
    (reference train_h1esc_a.py:118-181; 480k steps / 30 days on 4xV100)
  * stage-b: one 32Mb window per step (train_h1esc_b.py; 150k steps /
    20 days on 4xV100)
  * stage-c: one 256Mb cross-chromosome window per step
    (train_h1esc_c.py; 36k steps / 20 days on 4xV100), best-effort
  * the trainable-path encoder characterization: the fused Pallas chains
    require folded BN (inference), so training runs the plain-XLA conv
    path — this measures that gap at the stage-a shape (fwd folded
    Pallas vs fwd folded XLA vs fwd+bwd live-BN XLA).

Prints one JSON object; bench.py inlines the same measurements as
training fields of BENCH_r*.json when ORCA_BENCH_TRAIN=1.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# reference wall-clock baselines (train/README.md:14): steps, days, GPUs
REF_STAGE_A = (480_000, 30.0)
REF_STAGE_B = (150_000, 20.0)
REF_STAGE_C = (36_000, 20.0)


def _timeit(fn, iters):
    t0 = time.time()
    fn()  # compile + warmup (fn must force a host fetch)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters, compile_s


def bench_stage_a(batch=4, iters=6, dtype="float32"):
    """Per-chip batch 4 is the reference's own per-device config (global
    batch 16 over 4x V100, train_h1esc_a.py:102): batch 16 on ONE chip
    needs 40.6G of HBM (the fp32 (N,1Mb,64) stage-0/1 backward activations
    pad 2x to 128 lanes), so the global-16 run is the 4-chip dp mesh the
    dryrun validates, at ~this per-chip rate (38M params all-reduce is
    noise next to a 1.4s step)."""
    import jax
    import jax.numpy as jnp

    from orca_tpu.nn import decoders
    from orca_tpu.training.stages import StageAConfig, make_stage_a_step

    cfg = StageAConfig(num_1d=32)
    opt, step = make_stage_a_step(cfg)
    params = decoders.init_net(jax.random.PRNGKey(0), num_1d=cfg.num_1d,
                               dtype=jnp.dtype(dtype))
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=(batch, cfg.seq_len))
    seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes])
    f = cfg.target_factor
    target = jnp.asarray(
        np.abs(rng.rand(batch, cfg.crop * f, cfg.crop * f)).astype(np.float32)
    )
    target_1d = jnp.asarray(
        (rng.rand(batch, cfg.crop, cfg.num_1d) > 0.5).astype(np.float32)
    )
    normmat = jnp.asarray(np.full((cfg.crop, cfg.crop), 0.1, np.float32))
    key = jax.random.PRNGKey(1)
    state = {"p": params, "o": opt_state}

    def run():
        state["p"], state["o"], m = step(
            state["p"], state["o"], seq, target, target_1d, key,
            jnp.float32(0.002), normmat, jnp.float32(0.1),
        )
        return float(m["loss"])  # host fetch forces completion

    dt, compile_s = _timeit(run, iters)
    steps, days = REF_STAGE_A
    # the reference's 480k steps are GLOBAL batch 16 = 4x this per-chip
    # microbatch; a 4-chip dp mesh runs one global step per measured step
    global_days_4chip = steps * dt / 86400.0
    return {
        "stage_a_steps_per_s": round(1.0 / dt, 3),
        "stage_a_compile_s": round(compile_s, 1),
        "stage_a_batch_per_chip": batch,
        "stage_a_dtype": dtype,
        "stage_a_global16_days_4chip": round(global_days_4chip, 2),
        "stage_a_vs_ref_days": round(days / global_days_4chip, 1),
    }


def bench_stage_b(iters=4):
    import jax
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.nn import decoders, encoders
    from orca_tpu.nn.core import fold_params
    from orca_tpu.training.stages import StageBConfig, make_stage_b_step

    cfg = StageBConfig()
    geom = cfg.geometry
    opt, step = make_stage_b_step(cfg)
    ke, kp, kd, k1 = jax.random.split(jax.random.PRNGKey(2), 4)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 5, True),
        "decoders": {
            lv: decoders.init_decoder(k)
            for lv, k in zip(cfg.levels, jax.random.split(kd, len(cfg.levels)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "decoder_1pt": fold_params(
            decoders.init_decoder1m(k1), decoders.decoder1m_spec(1)
        ),
    }
    opt_state = opt.init(trainable)
    normmats, epss = zoo._random_normmats(nbins=geom.bins, crop=geom.crop)
    nm = jnp.asarray(np.stack(
        [normmats[lv] for lv in cfg.levels]
    ).astype(np.float32))
    ep = jnp.asarray(np.array(
        [epss[lv] for lv in cfg.levels], np.float32
    ))
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 4, size=geom.window_bp)
    seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes][None])
    target = jnp.asarray(
        np.abs(rng.rand(1, geom.bins, geom.bins)).astype(np.float32)
    )
    key = jax.random.PRNGKey(3)
    state = {"t": trainable, "o": opt_state}

    def run():
        state["t"], state["o"], m = step(
            state["t"], frozen, state["o"], seq, target, key,
            jnp.float32(0.002), nm, ep,
        )
        return float(m["loss"])

    dt, compile_s = _timeit(run, iters)
    steps, days = REF_STAGE_B
    return {
        "stage_b_seconds_per_step": round(dt, 3),
        "stage_b_compile_s": round(compile_s, 1),
        "stage_b_run_days_1chip": round(steps * dt / 86400.0, 2),
        "stage_b_vs_ref_days": round(days / (steps * dt / 86400.0), 1),
    }


def bench_stage_c(iters=3):
    import jax
    import jax.numpy as jnp

    from orca_tpu.nn import decoders, encoders
    from orca_tpu.nn.core import fold_params
    from orca_tpu.training.stages import StageCConfig, make_stage_c_step

    cfg = StageCConfig()
    geom = cfg.geometry
    opt, step = make_stage_c_step(cfg)
    ke, kp1, kp, kd = jax.random.split(jax.random.PRNGKey(4), 4)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 3, True),
        "decoders": {
            lv: decoders.init_decoder(k)
            for lv, k in zip(cfg.levels, jax.random.split(kd, len(cfg.levels)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "pyramid1": fold_params(
            encoders.init_pyramid(kp1, 5, True), encoders.pyramid_spec(5, True)
        ),
    }
    opt_state = opt.init(trainable)
    rng = np.random.RandomState(2)
    codes = rng.randint(0, 4, size=geom.window_bp)
    seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes][None])
    target = jnp.asarray(
        np.abs(rng.rand(1, geom.bins, geom.bins)).astype(np.float32)
    )
    d = np.abs(np.arange(geom.bins)[None, :] - np.arange(geom.bins)[:, None])
    normmat = jnp.asarray(
        np.exp(-1.2 * np.log1p(d) - 3.0).astype(np.float32)[None]
    )
    key = jax.random.PRNGKey(5)
    state = {"t": trainable, "o": opt_state}

    def run():
        state["t"], state["o"], m = step(
            state["t"], frozen, state["o"], seq, target, normmat, key,
            jnp.float32(0.002),
        )
        return float(m["loss"])

    dt, compile_s = _timeit(run, iters)
    steps, days = REF_STAGE_C
    return {
        "stage_c_seconds_per_step": round(dt, 3),
        "stage_c_compile_s": round(compile_s, 1),
        "stage_c_run_days_1chip": round(steps * dt / 86400.0, 2),
        "stage_c_vs_ref_days": round(days / (steps * dt / 86400.0), 1),
    }


def bench_encoder_paths(batch=16, seq_len=1_000_000, iters=6):
    """The trainable-path encoder gap at the stage-a shape: the fused
    Pallas chains are inference-only (folded BN, nn/encoders.py:342-346),
    so training pays the plain-XLA conv path. Three measurements:
    fwd folded+Pallas (serving), fwd folded+XLA, fwd+bwd live-BN XLA
    (what stage-a actually differentiates)."""
    import jax
    import jax.numpy as jnp

    from orca_tpu.nn import encoders
    from orca_tpu.nn.core import BNUpdates, fold_params

    params = encoders.init_encoder_tower(jax.random.PRNGKey(6))
    folded = fold_params(params, encoders.encoder_tower_spec())
    rng = np.random.RandomState(3)
    codes = rng.randint(0, 4, size=(batch, seq_len))
    seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes])

    @jax.jit
    def fwd(p, s):
        return encoders.apply_encoder_tower(p, s)

    @jax.jit
    def fwd_xla(p, s):
        # length % BIN_BP == 0 but force the XLA path via unfolded check:
        # the masked/plain stages run whenever "bn" is present; for the
        # folded-XLA measurement we route through apply_encoder_stages
        return encoders.apply_encoder_stages(p, s.astype(jnp.float32) * 0.25)

    @jax.jit
    def train_step(p, s):
        def loss(p):
            bn = BNUpdates()
            out = encoders.apply_encoder_stages(
                p, s.astype(jnp.float32) * 0.25, train=True,
                rng=jax.random.PRNGKey(0), bn_updates=bn, path="encoder",
            )
            return jnp.mean(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return l, jax.tree.map(lambda a: jnp.sum(a), g)

    out = {}
    dt, _ = _timeit(lambda: float(jnp.sum(fwd(folded, seq))), iters)
    out["enc_fwd_pallas_s"] = round(dt, 3)
    dt, _ = _timeit(lambda: float(jnp.sum(fwd_xla(folded, seq))), iters)
    out["enc_fwd_xla_s"] = round(dt, 3)
    dt, _ = _timeit(lambda: float(train_step(params, seq)[0]), max(2, iters // 2))
    out["enc_train_step_xla_s"] = round(dt, 3)
    out["enc_pallas_vs_xla_fwd"] = round(
        out["enc_fwd_xla_s"] / out["enc_fwd_pallas_s"], 2
    )
    return out


def main():
    import jax

    which = set((sys.argv[1] if len(sys.argv) > 1 else "a,b,c,enc").split(","))
    result = {"device": str(jax.devices()[0])}
    if "a" in which:
        result.update(bench_stage_a())
        print(json.dumps(result), flush=True)
    if "b" in which:
        result.update(bench_stage_b())
        print(json.dumps(result), flush=True)
    if "c" in which:
        try:
            result.update(bench_stage_c())
        except Exception as e:
            result["stage_c_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(result), flush=True)
    if "enc" in which:
        result.update(bench_encoder_paths())
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    main()
