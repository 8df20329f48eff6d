"""Per-stage timing of the fused Pallas encoder kernels at production
block shapes (one 4.224Mb blocked-scan segment, batch 2 = fwd+RC), plus
the XLA first conv and the pyramid — locates the remaining gap to the
~160-200ms speed-of-light estimate for the 32Mb tower."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orca_tpu.nn import encoders
from orca_tpu.nn.core import fold_params
from orca_tpu.ops import nn_ops
from orca_tpu.ops.pallas.conv1d import (
    fused_conv_chain_packed, pack2, s2d_conv_weights,
)

DTYPE = jnp.bfloat16
SEG = 4_224_000  # block_bp 4Mb + 2x112kb halo
N = 2  # fwd + RC

params = fold_params(
    encoders.init_encoder_tower(jax.random.PRNGKey(0)),
    encoders.encoder_tower_spec(),
)
params = jax.tree.map(lambda x: x.astype(DTYPE), params)
np.asarray(jnp.zeros((1,)))  # channel warmup


def timeit(name, f, n=5):
    out = f()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.1f} ms", flush=True)
    return dt


rng = np.random.RandomState(0)
codes = rng.randint(0, 4, size=SEG * N)
seq = jnp.asarray(
    (np.eye(4, dtype=np.uint8) * 4)[codes].reshape(N, SEG, 4)
)

# whole 7-stage fused tower on the segment
full = jax.jit(lambda s: encoders.apply_encoder_stages_pallas(
    params, encoders.to_compute_dtype(s, DTYPE), 0, SEG))
t_full = timeit("7-stage pallas tower (4.224Mb seg, N=2)",
                lambda: full(seq))

# stage-by-stage
spec = encoders.encoder_tower_spec()
pools = [s[2] for s in encoders.STAGES]
x = encoders.to_compute_dtype(seq, DTYPE)

# first conv (XLA f=16)
lp0 = params["lconv"][0]
w16, b16 = s2d_conv_weights(lp0[0]["w"], lp0[0]["b"], f=16)


def first_conv(s):
    a = nn_ops.conv1d(s.reshape(N, SEG // 16, 64), w16, b16)
    return a.reshape(N, SEG, 64)


fc = jax.jit(first_conv)
timeit("  stage0 first conv (XLA f=16)", lambda: fc(x))

a0 = fc(x)
vs = jnp.zeros((N,), jnp.int32)

res = 1
inp = pack2(a0)
for i in range(7):
    lp, cp = params["lconv"][i], params["conv"][i]
    if i == 0:
        chain = ((lp[1]["w"], lp[1]["b"]), (cp[0]["w"], cp[0]["b"]),
                 (cp[1]["w"], cp[1]["b"]))
        relus = (False, True, True)
        res_idx = 0
    else:
        chain = ((lp[0]["w"], lp[0]["b"]), (lp[1]["w"], lp[1]["b"]),
                 (cp[0]["w"], cp[0]["b"]), (cp[1]["w"], cp[1]["b"]))
        relus = (False, False, True, True)
        res_idx = 1
    if i == 6:
        res_idx = -1
    out_pool = pools[i + 1] if i + 1 < 7 else 1
    ve = jnp.full((N,), SEG // res, jnp.int32)
    rows = inp.shape[1]
    gb = 2 * rows * inp.shape[2] * (rows and 1)
    f = jax.jit(lambda q, ch=chain, r=relus, ri=res_idx, op=out_pool,
                v=ve: fused_conv_chain_packed(
                    q, ch, vs, v, relus=r, residual_idx=ri, out_pool=op))
    dt = timeit(f"  stage{i} chain rows={rows} cin2={inp.shape[2]} "
                f"pool={out_pool}", lambda: f(inp))
    inp = f(inp)
    res *= out_pool if out_pool > 1 else 1
    if out_pool == 1 and i + 1 < 7 and pools[i + 1] > 1:
        from orca_tpu.ops.pallas.conv1d import unpack2
        inp = pack2(nn_ops.maxpool1d(unpack2(inp), pools[i + 1]))
        res *= pools[i + 1]

# pyramid at 32Mb shape
feats = jnp.zeros((N, 8000, 128), DTYPE)
pyr_params = jax.tree.map(
    lambda x: x.astype(DTYPE),
    fold_params(encoders.init_pyramid(jax.random.PRNGKey(1), 5, True),
                encoders.pyramid_spec(5, True)),
)
pyr = jax.jit(lambda f: encoders.apply_pyramid(
    pyr_params, f, levels=5, up_pass=True))
timeit("pyramid (8000 bins, N=2)", lambda: pyr(feats))
