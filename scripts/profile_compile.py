"""Measure where the 32Mb-cascade cold compile time goes, program by program.

Times jit lower+compile of each shared program the cascade uses
(no persistent cache). Run on the target accelerator:

    python scripts/profile_compile.py
"""

import os
import sys
import time

os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args):
    # NOTE: fn must not close over device arrays — embedding them as MLIR
    # constants forces device->host fetches during lower() (and the first
    # such fetch of a process pays the tunnel's ~60-730s data-plane setup,
    # see bench.py channel_setup_s). Pass all arrays via *args.
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{name:34s} trace+lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)


def main():
    from orca_tpu.models import zoo
    from orca_tpu.predict import multiscale as ms
    from orca_tpu.predict.multiscale import GEOM_32M

    # ORCA_PROFILE_DTYPE=float32 profiles the parity-precision programs
    dtype = jnp.dtype(os.environ.get("ORCA_PROFILE_DTYPE", "bfloat16"))
    bundle = zoo.fold_bundle(zoo.random_32m_bundle(seed=0))
    log_nm = jnp.asarray(bundle.log_normmats())
    bundle = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        bundle,
    )
    seq = jnp.zeros((1, 32_000_000, 4), jnp.int8)
    geom = GEOM_32M

    # warm the tunnel's device->host channel so the first constant fetch /
    # result fetch doesn't masquerade as trace or compile time
    t0 = time.time()
    np.asarray(jnp.zeros((1,), jnp.float32))
    print(f"channel setup: {time.time()-t0:.1f}s", flush=True)

    timeit(
        "encode_32mb (blocked+pyramid)",
        lambda b, s: ms._encode_32mb_jit(b, geom, s), bundle, seq,
    )

    enc_crop = jnp.zeros((2, 250, 128), dtype)
    start_bins = jnp.zeros((2,), jnp.int32)
    coarse = jnp.zeros((2, 125, 125, 1), dtype)
    args = (jnp.int32(32), log_nm[0], start_bins, jnp.float32(0.0),
            jnp.float32(0.0))

    timeit(
        "decode level (no coarse)",
        lambda d, e, *a: ms._decode_level_jit(
            d, None, e, geom, bundle.upsample_mode, 1, *a, None),
        bundle.decoders[32], enc_crop, *args,
    )
    timeit(
        "decode level (coarse)",
        lambda d, e, c, *a: ms._decode_level_jit(
            d, None, e, geom, bundle.upsample_mode, 1, *a, c),
        bundle.decoders[16], enc_crop, coarse, *args,
    )
    timeit(
        "decode level (coarse+1pt)",
        lambda d, d1, e, c, *a: ms._decode_level_jit(
            d, d1, e, geom, bundle.upsample_mode, 1, *a, c),
        bundle.decoders[1], bundle.decoder_1pt, enc_crop, coarse, *args,
    )
    timeit(
        "crop rows",
        lambda e, s: ms._crop_rows_jit(e, s, 250),
        jnp.zeros((2, 8000, 128), dtype), start_bins,
    )


if __name__ == "__main__":
    main()
