"""Decoder-level timing at production shape (250x250, B=2 fwd+RC, bf16):
whole level, the 28 dilated residual blocks alone, and one residual block
per dilation — sizes the packed-W (f=2 space-to-depth on W) win before
building it."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orca_tpu.nn import decoders
from orca_tpu.nn.core import fold_params
from orca_tpu.ops import nn_ops

DTYPE = jnp.bfloat16
B, S = 2, 250

params = fold_params(
    decoders.init_decoder(jax.random.PRNGKey(0)), decoders.decoder_spec(1)
)
params = jax.tree.map(lambda x: x.astype(DTYPE), params)
np.asarray(jnp.zeros((1,)))


def timeit(name, f, n=10):
    out = f()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)


rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, S, 128).astype(np.float32)).astype(DTYPE)
distenc = jnp.asarray(rng.rand(2, S, S, 1).astype(np.float32)).astype(DTYPE)
coarse = jnp.asarray(
    rng.rand(B, S // 2, S // 2, 1).astype(np.float32)
).astype(DTYPE)

dec = jax.jit(lambda x, d, y: decoders.apply_decoder(
    params, x, d, y, num_2d=1, upsample_mode="bilinear"))
timeit("full decoder level (combiners + 28 blocks + final)",
       lambda: dec(x, distenc, coarse))

# 28 dilated residual blocks alone
spec = decoders.decoder_spec(1)
cur0 = jnp.asarray(rng.rand(B, S, S, 64).astype(np.float32)).astype(DTYPE)
from orca_tpu.nn.core import apply_block


def blocks(cur):
    lb, cb = spec["lconvtwos"], spec["convtwos"]
    lp, cp = params["lconvtwos"], params["convtwos"]
    cur = apply_block(lp[0], lb[0], cur) + cur
    cur = apply_block(cp[0], cb[0], cur) + cur
    cur = decoders._scan_repeated_groups(
        cur, lp[1:], cp[1:], lb[1:], cb[1:], group_len=9
    )
    return cur


blocks_j = jax.jit(blocks)
timeit("28 dilated residual blocks", lambda: blocks_j(cur0))

# single k=3 conv per dilation (the shifted-matmul path)
w = jnp.asarray(rng.rand(3, 3, 64, 64).astype(np.float32) * 0.1).astype(DTYPE)
b = jnp.asarray(rng.rand(64).astype(np.float32)).astype(DTYPE)
for d in (1, 2, 16, 64):
    f = jax.jit(lambda c, dd=d: nn_ops.conv2d(c, w, b, dilation=dd))
    timeit(f"  one k=3 conv dilation={d}", lambda: f(cur0))

# pure dot ceiling: same contraction as one conv's 9 taps
xf = cur0.reshape(B * S * S, 64)
wf = jnp.asarray(rng.rand(64, 64).astype(np.float32)).astype(DTYPE)
dot = jax.jit(lambda a: a @ wf)
timeit("  one (125000,64)@(64,64) dot (tap unit)", lambda: dot(xf))
# packed-lane ceiling: (62500,128)@(128,128)
xp = cur0.reshape(B * S * S // 2, 128)
wp = jnp.asarray(rng.rand(128, 128).astype(np.float32)).astype(DTYPE)
dotp = jax.jit(lambda a: a @ wp)
timeit("  one (62500,128)@(128,128) dot (packed tap)", lambda: dotp(xp))
