import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from orca_tpu.models import zoo
from orca_tpu.predict.multiscale import (
    GEOM_32M, _cascade_32mb, _encode_32mb_jit, _crop_rows_jit,
    _decode_level_jit,
)
from orca_tpu.nn import encoders

bundle = zoo.fold_bundle(zoo.random_32m_bundle(seed=0))
# normmats from full-precision host data, before the bf16 param cast
log_normmats = jnp.asarray(bundle.log_normmats())
bundle = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16)
    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, bundle)

# One-time tunnel data-plane setup (see bench.py channel_setup_s): warm it
# before any bulk transfer so the first fetch doesn't pollute a measurement.
_t0 = time.perf_counter()
np.asarray(jnp.zeros((1,), jnp.float32))
print(f"channel setup: {time.perf_counter()-_t0:.1f} s", flush=True)

rng = np.random.RandomState(0)
codes = rng.randint(0, 4, size=32_000_000)
_t0 = time.perf_counter()
seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes][None])
seq.block_until_ready()
print(f"seq H2D (128MB packed): {time.perf_counter()-_t0:.1f} s", flush=True)


def _fetch(out):
    """Force execution completion via a host fetch: on the axon tunnel
    block_until_ready alone may return before device execution finishes."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    return float(jnp.sum(jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in leaves])))


def timeit(name, f, n=3):
    _fetch(f())  # warm (compile + first-shape caches)
    rtt0 = time.perf_counter()
    _fetch(f())
    single = time.perf_counter() - rtt0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()  # async dispatches queue on-device back to back
    _fetch(out)  # one sync at the end: amortizes the tunnel RTT
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.1f} ms  (single incl. fetch: {single*1000:.1f})",
          flush=True)
    return dt

# full cascade
timeit("full cascade", lambda: _cascade_32mb(bundle, GEOM_32M, seq,
       jnp.float32(16e6), jnp.float32(16e6), log_normmats))

# encoder+pyramid (fwd+RC batched)
encs = None
def enc():
    global encs
    encs = _encode_32mb_jit(bundle, GEOM_32M, seq)
    return encs
timeit("encode_32mb_jit (tower+pyramid, fwd+RC)", enc)

# tower only (fwd+RC)
seq2 = jnp.concatenate([seq, jnp.flip(seq, axis=(1, 2))], axis=0)
from orca_tpu.utils.config import get_config
cfg = get_config()
tower = jax.jit(lambda s: encoders.apply_encoder_tower(
    bundle.encoder, s, halo_bp=cfg.encoder_halo_bp))
timeit("tower only (fwd+RC)", lambda: tower(seq2))

feats = tower(seq2)
pyr = jax.jit(lambda f: encoders.apply_pyramid(
    bundle.pyramid, f, levels=5, up_pass=bundle.pyramid_up_pass))
timeit("pyramid only", lambda: pyr(feats))

# one decoder level (with coarse). Production level 1 also adds the
# decoder_1pt head — time both variants so the level-1 number matches the
# program the cascade actually runs.
encs = enc()
enc1 = _crop_rows_jit(encs[0], jnp.zeros((2,), jnp.int32), 250)
coarse = jnp.zeros((2, 125, 125, 1), jnp.bfloat16)
for name, d1pt in (("no 1pt", None), ("with 1pt", bundle.decoder_1pt)):
    dec = lambda: _decode_level_jit(
        bundle.decoders[1], d1pt, enc1, GEOM_32M, bundle.upsample_mode,
        bundle.num_2d, jnp.int32(1), log_normmats[5],
        jnp.zeros((2,), jnp.int32), jnp.float32(16e6), jnp.float32(16e6),
        coarse)
    timeit(f"one decoder level (B=2, coarse, {name})", dec)
