"""Time lower/compile of individual fused Pallas chain kernels (one per
encoder stage shape) to locate the cold-compile cost inside encode_32mb."""

import os
import sys
import time

os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from orca_tpu.ops.pallas.conv1d import fused_conv_chain_packed, pack2

BLOCK = 4_000_000 + 224_000  # pallas block + halos
# per-stage (length_divisor, cin, cout, n_convs)
STAGES = [
    (1, 64, 64, 3),     # stage 0 chain (after XLA first conv)
    (4, 64, 96, 4),
    (16, 96, 128, 4),
    (80, 128, 128, 4),
    (400, 128, 128, 4),
    (2000, 128, 128, 4),
]


def main():
    rows = 2
    for div, cin, cout, n_convs in STAGES:
        length = BLOCK // div // 2 * 2
        x = jnp.zeros((rows, length, cin), jnp.bfloat16)
        ws = []
        relus = []
        c = cin
        for i in range(n_convs):
            co = cout
            ws.append((jnp.zeros((9, c, co), jnp.bfloat16),
                       jnp.zeros((co,), jnp.bfloat16)))
            relus.append(i >= n_convs - 2)
            c = co
        vs = jnp.zeros((rows,), jnp.int32)
        ve = jnp.full((rows,), length, jnp.int32)

        def f(xp, vs, ve, ws=tuple(ws), relus=tuple(relus)):
            return fused_conv_chain_packed(
                xp, ws, vs, ve, relus=relus, residual_idx=1
            )

        t0 = time.time()
        lowered = jax.jit(f).lower(pack2(x), vs, ve)
        t1 = time.time()
        lowered.compile()
        t2 = time.time()
        print(f"len={length:9d} cin={cin:3d} cout={cout:3d} "
              f"lower {t1-t0:6.1f}s compile {t2-t1:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
