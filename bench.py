"""Benchmark: 32Mb multiscale forward throughput (Mb of sequence/s/chip).

Runs the flagship pipeline — full zoom cascade (fwd + reverse-complement
passes over a 32Mb window, 6 decoded levels) with an H1-ESC-architecture
bundle — on the available accelerator and prints ONE JSON line.

Baseline context: the reference has no published inference benchmark
(SURVEY.md §6); vs_baseline is computed against a reference-design A100
estimate of ~2.0 Mb/s for the same cascade (fwd+RC, fp32 torch; see
BASELINE.md targets: >=5x per-chip speedup over A100 means >=10 Mb/s).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compile cache (the full cascade is a large program).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# bfloat16 is the production serving config (2.3x fp32 on v5e); set
# ORCA_BENCH_DTYPE=float32 for the reference-parity precision mode.
DTYPE = os.environ.get("ORCA_BENCH_DTYPE", "bfloat16")
A100_BASELINE_MB_PER_S = 2.0


def main():
    import jax
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.predict.multiscale import GEOM_32M, _cascade_32mb

    bundle = zoo.fold_bundle(zoo.random_32m_bundle(seed=0))
    if DTYPE == "bfloat16":
        bundle = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            bundle,
        )
    log_normmats = jnp.asarray(bundle.log_normmats())

    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=32_000_000)
    # packed quarter-scale uint8 one-hot — the production transfer format
    # (predict.multiscale._device_sequence), so bench shares the compiled
    # programs with the real predict pipelines
    seq_np = (np.eye(4, dtype=np.uint8) * 4)[codes][None]
    seq = jnp.asarray(seq_np)
    mpos = jnp.float32(16_000_000.0)
    wpos = jnp.float32(16_000_000.0)

    def run():
        preds, starts = _cascade_32mb(
            bundle, GEOM_32M, seq, mpos, wpos, log_normmats
        )
        # Force a device->host fetch: on tunneled/remote backends
        # block_until_ready alone may not cover execution completion.
        return float(jnp.sum(preds[-1]))

    # One-time transfer-channel setup: on tunneled backends (axon) the
    # FIRST device->host fetch of a process pays the tunnel's data-plane
    # initialization (measured 60-730s on v5e-lite via axon; subsequent
    # multi-MB fetches are ~0.1s). Time it separately so compile_s below
    # measures compilation, not infrastructure warm-up.
    t0 = time.time()
    np.asarray(jnp.zeros((1,), jnp.float32))
    channel_setup_s = time.time() - t0

    # compile + warmup
    t0 = time.time()
    run()
    compile_s = time.time() - t0

    iters = int(os.environ.get("ORCA_BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters

    mb_per_s = 32.0 / dt
    result = {
        "metric": "Mb_sequence_per_s_per_chip_32Mb_multiscale",
        "value": round(mb_per_s, 3),
        "unit": "Mb/s/chip",
        "vs_baseline": round(mb_per_s / A100_BASELINE_MB_PER_S, 3),
        "seconds_per_32Mb_window": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "channel_setup_s": round(channel_setup_s, 1),
        "device": str(jax.devices()[0]),
        "dtype": DTYPE,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
