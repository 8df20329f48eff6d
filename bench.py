"""Benchmark: 32Mb multiscale forward throughput (Mb of sequence/s/chip).

Runs the flagship pipeline — full zoom cascade (fwd + reverse-complement
passes over a 32Mb window, 6 decoded levels) with an H1-ESC-architecture
bundle — on the available accelerator and prints ONE JSON line. The
headline is the bf16 serving config; an fp32 parity-mode measurement is
included as secondary fields (both numbers in one artifact, per the
BASELINE targets).

Baseline context: the reference has no published inference benchmark
(SURVEY.md §6). vs_baseline divides by a reference-design A100 estimate of
~2.0 Mb/s for the same cascade (fwd+RC, fp32 torch); the measured basis is
BASELINE_TORCH.json (scripts/baseline_torch.py: the reference's own torch
modules through the faithful zoom loop on this host's CPU), surfaced in
the output so the multiple is auditable.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compile cache (the full cascade is a large program).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# bfloat16 is the production serving config (2.3x fp32 on v5e); the fp32
# reference-parity mode is measured as secondary fields in the same run
# (ORCA_BENCH_SKIP_FP32=1 disables it; ORCA_BENCH_DTYPE overrides the
# headline dtype).
DTYPE = os.environ.get("ORCA_BENCH_DTYPE", "bfloat16")
A100_BASELINE_MB_PER_S = 2.0  # design estimate; see BASELINE_TORCH.json


def _load_torch_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_TORCH.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def _bundles(dtype: str, seeds):
    from orca_tpu.certify import _cast_bundle
    from orca_tpu.models import zoo

    return [
        _cast_bundle(zoo.fold_bundle(zoo.random_32m_bundle(seed=s)), dtype)
        for s in seeds
    ]


def _measure(dtype: str, seq, mpos, wpos, iters: int, n_models: int = 1):
    import jax.numpy as jnp

    from orca_tpu.predict.multiscale import (
        GEOM_32M,
        _cascade_32mb,
        warmup_cascade_32m,
    )

    bundles = _bundles(dtype, range(n_models))
    log_normmats = jnp.asarray(bundles[0].log_normmats())

    def run():
        # the standard predict loops models sequentially (measured optimal:
        # the chip is saturated by one cascade; docs/ARCHITECTURE.md)
        s = 0.0
        for bundle in bundles:
            preds, starts = _cascade_32mb(
                bundle, GEOM_32M, seq, mpos, wpos, log_normmats
            )
            # Force a device->host fetch: on tunneled/remote backends
            # block_until_ready alone may not cover execution completion.
            s += float(jnp.sum(preds[-1]))
        return s

    t0 = time.time()
    # concurrent program compilation (wall ~= the largest program, not the
    # sum) + first full prediction: compile_s is time-to-first-prediction
    warmup_cascade_32m(bundles[0], GEOM_32M, n=1)
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    return dt, compile_s


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=32_000_000)
    # packed quarter-scale uint8 one-hot — the production transfer format
    # (predict.multiscale._device_sequence), so bench shares the compiled
    # programs with the real predict pipelines
    seq_np = (np.eye(4, dtype=np.uint8) * 4)[codes][None]
    seq = jnp.asarray(seq_np)
    mpos = jnp.float32(16_000_000.0)
    wpos = jnp.float32(16_000_000.0)

    # One-time transfer-channel setup: on tunneled backends (axon) the
    # FIRST device->host fetch of a process pays the tunnel's data-plane
    # initialization (measured 60-730s on v5e-lite via axon; subsequent
    # multi-MB fetches are ~0.1s). Time it separately so compile_s below
    # measures compilation, not infrastructure warm-up.
    t0 = time.time()
    np.asarray(jnp.zeros((1,), jnp.float32))
    channel_setup_s = time.time() - t0

    iters = int(os.environ.get("ORCA_BENCH_ITERS", "3"))
    dt, compile_s = _measure(DTYPE, seq, mpos, wpos, iters)
    mb_per_s = 32.0 / dt

    result = {
        "metric": "Mb_sequence_per_s_per_chip_32Mb_multiscale",
        "value": round(mb_per_s, 3),
        "unit": "Mb/s/chip",
        "vs_baseline": round(mb_per_s / A100_BASELINE_MB_PER_S, 3),
        "baseline_basis": "A100 design estimate 2.0 Mb/s (fp32 torch)",
        "seconds_per_32Mb_window": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "channel_setup_s": round(channel_setup_s, 1),
        "device": str(jax.devices()[0]),
        "dtype": DTYPE,
    }

    torch_baseline = _load_torch_baseline()
    if torch_baseline:
        result["torch_cpu_mb_per_s"] = torch_baseline["mb_per_s"]
        result["vs_torch_cpu"] = round(
            mb_per_s / torch_baseline["mb_per_s"], 1
        )

    # Standard 2-model (H1-ESC + HFF) region predict, MEASURED sequential —
    # the device is already saturated by one cascade, so param-stacked
    # batching loses (probe on v5e-lite: encoder batch-4 = 1.88x batch-2,
    # vmapped 2-model decoders = 2.23x single; scripts/probe_two_model.py
    # + docs/ARCHITECTURE.md). This is the number users of the default
    # 2-model predict actually see. The second bundle reuses the compiled
    # programs, so this costs ~2 windows of extra runtime, no compile.
    dt2, _ = _measure(DTYPE, seq, mpos, wpos, max(1, iters - 1), n_models=2)
    result["two_model_mb_per_s"] = round(32.0 / dt2, 3)
    result["two_model_seconds_per_window"] = round(dt2, 3)

    # fp32 reference-parity mode as secondary fields of the same artifact
    if DTYPE != "float32" and not os.environ.get("ORCA_BENCH_SKIP_FP32"):
        fp32_iters = max(1, iters - 1)
        dt32, compile32 = _measure("float32", seq, mpos, wpos, fp32_iters)
        result["fp32_mb_per_s"] = round(32.0 / dt32, 3)
        result["fp32_seconds_per_window"] = round(dt32, 3)
        result["fp32_compile_s"] = round(compile32, 1)
        # the standard 2-model (H1-ESC + HFF) predict at parity precision
        # (BASELINE row 2 read strictly); reuses the fp32 programs
        dt32_2, _ = _measure("float32", seq, mpos, wpos, 1, n_models=2)
        result["fp32_two_model_mb_per_s"] = round(32.0 / dt32_2, 3)

    # 256Mb whole-chromosome cascade (BASELINE row 3) as secondary fields,
    # so the artifact records that configuration every round.
    if not os.environ.get("ORCA_BENCH_SKIP_256M"):
        try:
            dt256, compile256 = _measure_256m(DTYPE, max(1, iters - 1))
            result["mb_per_s_256m"] = round(256.0 / dt256, 3)
            result["seconds_per_256Mb_window"] = round(dt256, 3)
            result["compile_s_256m"] = round(compile256, 1)
            if DTYPE != "float32" and not os.environ.get(
                "ORCA_BENCH_SKIP_FP32"
            ):
                dt256_32, _ = _measure_256m("float32", 1)
                result["fp32_mb_per_s_256m"] = round(256.0 / dt256_32, 3)
        except Exception as e:  # never lose the headline to a secondary
            result["bench_256m_error"] = f"{type(e).__name__}: {e}"

    # training-step measurements at production geometry (BASELINE config 5
    # is a training config; reference: 30+20 days on 4x V100,
    # train/README.md:14) — scripts/bench_training.py inlined
    if not os.environ.get("ORCA_BENCH_SKIP_TRAIN"):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"
        ))
        try:
            from bench_training import bench_stage_a, bench_stage_b

            result.update(bench_stage_a(iters=3))
            result.update(bench_stage_b(iters=2))
        except Exception as e:
            result["bench_train_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))


def _measure_256m(dtype: str, iters: int):
    """One 256Mb whole-chromosome cascade (chr8-like 145.1Mb + padding
    chromosome, per-region background normmats, fwd+RC, 4 levels) — the
    same measurement as scripts/bench_256m.py, inlined so BENCH_r*.json
    captures BASELINE row 3 each round."""
    import jax.numpy as jnp

    from orca_tpu.certify import _cast_bundle
    from orca_tpu.models import zoo
    from orca_tpu.predict import retrieval
    from orca_tpu.predict.multiscale import (
        GEOM_256M,
        _cascade_256mb,
        warmup_cascade_256m,
    )

    bundle = _cast_bundle(
        zoo.fold_256m_bundle(zoo.random_256m_bundle(seed=0)), dtype
    )

    chrlen = 145_100_000 - 145_100_000 % 32000
    regions = [["chrM", 0, chrlen, "+"],
               ["chrP", 0, 256_000_000 - chrlen, "+"]]
    normmat = retrieval.assemble_normmat(
        regions, bundle.background_cis, bundle.background_trans,
        binsize=32000,
    ).astype(np.float32)
    mask = np.isnan(normmat)
    if mask.any():
        normmat[mask] = np.nanmin(normmat[~mask])

    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=256_000_000)
    seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes][None])
    nm = jnp.asarray(normmat)

    def run():
        preds, _starts, _norms = _cascade_256mb(
            bundle, GEOM_256M, seq, jnp.float32(64_000_000.0),
            jnp.float32(128_000_000.0), jnp.float32(chrlen), nm,
        )
        return float(jnp.sum(preds[-1].astype(jnp.float32)))

    t0 = time.time()
    warmup_cascade_256m(bundle, GEOM_256M, n=1)
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        run()
    return (time.time() - t0) / iters, compile_s


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
