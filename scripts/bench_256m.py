"""256Mb whole-chromosome cascade throughput (BASELINE row 3).

Measures the full 4-level 256Mb multiscale prediction — fwd+RC, per-region
background normmats, three-tower encoder stack — on the available
accelerator, and prints one JSON line. Complements bench.py (the 32Mb
headline): this is the configuration that tiles a whole chromosome plus a
padding chromosome through one forward.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DTYPE = os.environ.get("ORCA_BENCH_DTYPE", "bfloat16")


def main():
    import jax
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.predict import retrieval
    from orca_tpu.predict.multiscale import GEOM_256M, _cascade_256mb

    bundle = zoo.random_256m_bundle(seed=0)
    from orca_tpu.nn import encoders as E
    from orca_tpu.nn.core import fold_params
    import dataclasses

    from orca_tpu.nn import decoders as D

    bundle = dataclasses.replace(
        bundle,
        encoder=fold_params(bundle.encoder, E.encoder_tower_spec()),
        pyramid1=fold_params(bundle.pyramid1, E.pyramid_spec(5, True)),
        pyramid=fold_params(bundle.pyramid, E.pyramid_spec(3, True)),
        decoders={
            lv: fold_params(p, D.decoder_spec(1))
            for lv, p in bundle.decoders.items()
        },
    )
    from orca_tpu.certify import _cast_bundle

    bundle = _cast_bundle(bundle, DTYPE)

    # chr8-like: 145.1Mb chromosome + padding to 256Mb
    chrlen = 145_100_000 - 145_100_000 % 32000
    regions = [
        ["chrM", 0, chrlen, "+"],
        ["chrP", 0, 256_000_000 - chrlen, "+"],
    ]
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
    mpos = jnp.float32(64_000_000.0)
    wpos = jnp.float32(128_000_000.0)

    np.asarray(jnp.zeros((1,)))  # channel warmup

    def run():
        preds, starts, norms = _cascade_256mb(
            bundle, GEOM_256M, seq, mpos, wpos, jnp.float32(chrlen), nm
        )
        return float(jnp.sum(preds[-1].astype(jnp.float32)))

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    iters = int(os.environ.get("ORCA_BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters

    print(json.dumps({
        "metric": "Mb_sequence_per_s_per_chip_256Mb_multiscale",
        "value": round(256.0 / dt, 3),
        "unit": "Mb/s/chip",
        "seconds_per_256Mb_window": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "dtype": DTYPE,
    }))


if __name__ == "__main__":
    main()
