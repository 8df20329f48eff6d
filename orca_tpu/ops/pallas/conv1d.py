"""Fused Pallas TPU kernels for the Orca bp-resolution encoder stages.

The reference `Encoder` (orca_modules.py:803-980) is 7 stages of
``out = conv(lconv(x)) + lconv(x)`` where lconv/conv are two k=9
Conv1d(+folded BN)(+ReLU) units each. XLA lowers these small-channel k=9 NWC
convs at ~8% MXU utilization, HBM-bound between the convs. Here each stage's
conv chain runs as ONE Pallas kernel in VMEM per length tile.

Layout: TPU minor dims tile to 128 lanes, so 64/96-channel position-major
activations would waste up to half their HBM footprint and bandwidth as
kernel operands. All kernel I/O therefore uses **f=2 space-to-depth
packing**: ``(R, L, C) -> (R, L/2, 2C)`` (a pure row-major reshape), giving
128/192/256-lane operands. Each k=9 conv becomes a 5-tap packed conv:

    out[row j, q*Cout+co] = sum_t packed[j+t-2] @ W'[t],
    W'[t, p*Cin+ci, q*Cout+co] = W[2t+p-q+? , ci, co]   (i = 2t+p-q, 0<=i<=9)

with 90% weight density (10/9 FLOP inflation) and full MXU lanes. Shifted
sublane reads (5 taps) measure at >=95% of v5e bf16 peak for 128-lane
operands.

Halo handling: each conv consumes 2 packed rows per side (4 convs -> 8
rows). Instead of materializing overlapping windows (which would double the
footprint of 8GB stage-1 activations), the kernel reads three BlockSpec'd
views of the same array — its main tile plus clamped neighbor tiles — and
stitches the halo in VMEM; Mosaic double-buffers all streams automatically.

Masking: positions outside [vs, ve) are re-zeroed position-exactly after
every conv unit (lane-half aware), reproducing the reference's per-layer
zero padding at true sequence boundaries (see
encoders.apply_encoder_stages_masked) so any blocked/padded execution is
bit-equivalent to the monolithic conv.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO_ROWS = 8  # 4 convs x 2 packed rows (k'=5) per side
_HB = 16  # halo BlockSpec rows (sublane-tile aligned; last/first 8 used)
# Default tile rows. Swept 2048..16384 on v5e: throughput is flat (76-79ms
# per 4Mb block), so keep the smallest — least VMEM, fastest Mosaic compile.
_MAX_TILE = int(os.environ.get("ORCA_TPU_PALLAS_TILE", "2048"))


def s2d_conv_weights(w: jax.Array, b: jax.Array, f: int = 2):
    """Space-to-depth transform of a k=9 'same' conv at packing factor f.

    (9, Cin, Cout), (Cout,) -> ((ntaps, f*Cin, f*Cout), (f*Cout,)) where row
    j of an f-packed array holds positions (f*j .. f*j+f-1) and the packed
    conv contracts input row j+t-T against W'[t]:
      W'[t, p*Cin+ci, q*Cout+co] = W[i, ci, co],  i = f*(t-T) + p - q + 4
    (zero where i is outside [0, 8]). ntaps = 2*((3+f)//f) + 1: 9 taps at
    f=1, 5 at f=2 (the chain kernels), 3 at f>=4 (the XLA first-conv path).
    """
    k, cin, cout = w.shape
    assert k == 9, k
    big_t = (3 + f) // f
    ntaps = 2 * big_t + 1
    idx = np.full((ntaps, f, f), k, np.int32)  # k indexes the zero row
    for t in range(ntaps):
        for p in range(f):
            for q in range(f):
                i = f * (t - big_t) + p - q + 4
                if 0 <= i <= 8:
                    idx[t, p, q] = i
    w_ext = jnp.concatenate([w, jnp.zeros((1, cin, cout), w.dtype)])
    wp = w_ext[jnp.asarray(idx)]  # (ntaps, f, f, cin, cout)
    wp = wp.transpose(0, 1, 3, 2, 4).reshape(ntaps, f * cin, f * cout)
    bp = jnp.tile(b, f)
    return wp, bp


def _packed_maxpool_halves(buf, p):
    """Max-pool an f=2 packed (rows, 2C) buffer by p positions, staying
    packed: returns (even, odd), each (rows/p, C). Output row j holds
    pooled positions 2j (even) and 2j+1 (odd) = max over fine positions
    [2pj, 2pj+p) / [2pj+p, 2pj+2p); fine position 2k sits in row k lanes
    [:C], 2k+1 in lanes [C:]. The caller stores the halves into the output
    ref's lane ranges (a lane-concat of the two differently-laid-out
    vectors is not lowerable by Mosaic)."""
    rows, c2 = buf.shape
    c = c2 // 2
    m = rows // p
    a = buf.reshape(m, p, c2)
    if p % 2 == 0:
        # rowwise half-max first: position pair {2k, 2k+1} -> one row
        mh = jnp.maximum(a[..., :c], a[..., c:])  # (m, p, c)
        even = mh[:, 0, :]
        for k in range(1, p // 2):
            even = jnp.maximum(even, mh[:, k, :])
        odd = mh[:, p // 2, :]
        for k in range(p // 2 + 1, p):
            odd = jnp.maximum(odd, mh[:, k, :])
    else:
        h0, h1 = a[..., :c], a[..., c:]
        ce, fl = (p + 1) // 2, p // 2
        even = h0[:, 0, :]
        for k in range(1, ce):
            even = jnp.maximum(even, h0[:, k, :])
        for k in range(fl):
            even = jnp.maximum(even, h1[:, k, :])
        odd = h1[:, fl, :]
        for k in range(fl + 1, p):
            odd = jnp.maximum(odd, h1[:, k, :])
        for k in range(ce, p):
            odd = jnp.maximum(odd, h0[:, k, :])
    return even, odd


def _chain_kernel(
    vs_ref,
    ve_ref,
    xm_ref,
    xl_ref,
    xr_ref,
    *rest,
    tile: int,
    n_convs: int,
    relus: tuple,
    residual_idx: int,
    couts: tuple,
    out_dtype,
    out_pool: int = 1,
):
    wrefs = rest[: 2 * n_convs]
    out_ref = rest[2 * n_convs]
    r = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    vs = vs_ref[r]  # valid position range [vs, ve) at this stage's resolution
    ve = ve_ref[r]
    base_row = j * tile - HALO_ROWS  # global packed row of xfull[0]

    prec = (
        jax.lax.Precision.HIGHEST
        if out_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    cin2 = xm_ref.shape[-1]
    full = tile + 2 * HALO_ROWS

    # Hoisted positional-validity masks: one boolean map per distinct
    # lane width over the full xfull row extent, computed once per tile;
    # each conv then pays a single select (the per-conv iota/compare chain
    # was ~half the kernel's VPU time).
    valid = {}
    for c in sorted({cin2 // 2, *couts}):  # couts are per-position widths
        rows = jax.lax.broadcasted_iota(jnp.int32, (full, 2 * c), 0) + base_row
        half = jax.lax.broadcasted_iota(jnp.int32, (full, 2 * c), 1) // c
        pos = 2 * rows + half
        valid[c] = (pos >= vs) & (pos < ve)

    def mask(arr, off, c):
        """Zero lanes whose position (2*row + lane//c) is outside [vs, ve).
        `off` is arr's first row relative to xfull[0] (static)."""
        return jnp.where(valid[c][off : off + arr.shape[0]], arr, 0)

    # Stitch main tile + 8-row halos from the clamped neighbor blocks; at the
    # array edges the clamped blocks alias wrong rows, but those rows lie
    # outside [vs, ve) only when vs/ve coincide with the array bounds — the
    # input mask below zeroes them either way because the wrapper guarantees
    # vs >= 16 positions past row 0 only at true array edges (j==0/last).
    lh = xl_ref[0, _HB - HALO_ROWS :, :]
    rh = xr_ref[0, :HALO_ROWS, :]
    lh = jnp.where(j > 0, lh, 0)
    rh = jnp.where(j < nt - 1, rh, 0)
    xfull = jnp.concatenate([lh, xm_ref[0], rh], axis=0)
    xfull = mask(xfull, 0, cin2 // 2)

    def conv5(buf, w_ref, b_ref, relu, off, c_out):
        """One packed conv: five accumulating shifted dots. (A single
        tap-concatenated K=5*cin2 matmul costs identical MXU cycles — K
        streams in 128-chunks either way — and Mosaic cannot lane-concat
        slices at different sublane offsets.)"""
        n = buf.shape[0] - 4
        cin2 = buf.shape[-1]
        acc = b_ref[0].astype(jnp.float32)
        for t in range(5):
            acc = acc + jnp.dot(
                buf[t : t + n], w_ref[t * cin2 : (t + 1) * cin2],
                preferred_element_type=jnp.float32, precision=prec,
            )
        if relu:
            acc = jnp.maximum(acc, 0.0)
        return mask(acc, off, c_out).astype(out_dtype)

    buf = xfull
    lout = None
    for i in range(n_convs):
        off = 2 * (i + 1)  # buf's first row relative to xfull[0]
        buf = conv5(
            buf, wrefs[2 * i], wrefs[2 * i + 1], relus[i], off,
            wrefs[2 * i].shape[-1] // 2,
        )
        if i == residual_idx:
            # align to the output tile: buf rows start at xfull row 2*(i+1)
            tr = HALO_ROWS - 2 * (i + 1)
            lout = buf[tr : tr + tile] if tr else buf
    # chains shorter than 4 convs leave unconsumed halo rows
    extra = HALO_ROWS - 2 * n_convs
    if extra:
        buf = buf[extra : extra + tile]
    out = (buf + lout) if lout is not None else buf
    if out_pool > 1:
        # Fuse the NEXT stage's pre-maxpool into this kernel's epilogue:
        # the stage output hits HBM already pooled (p x smaller write) and
        # the inter-stage XLA pool round trip disappears. Pool windows
        # never straddle the [vs, ve) boundary (both are multiples of the
        # pool at every stage resolution), so pooling the masked output
        # keeps the invalid region exactly zero.
        even, odd = _packed_maxpool_halves(out, out_pool)
        c = even.shape[-1]
        out_ref[0, :, :c] = even
        out_ref[0, :, c:] = odd
    else:
        out_ref[0] = out


def _plan_tiles(rows: int, tile: int = 0, max_tile: int = 0, align: int = _HB):
    """(tile_rows, padded_rows): fixed power-of-two tiles with the array
    padded up to a whole number of them. Production stage lengths (e.g.
    125000 packed rows at stage 2 of a 1 Mb window) often have no
    sublane-aligned divisor <= a VMEM-sized tile, so tiling by divisors
    would fall back to one enormous tile; padding costs <2% rows and the
    boundary masking already zeroes pad rows (position >= ve).
    `align`: tile-row alignment (sublane tile x fused out-pool)."""
    if not tile:
        tile = min(max_tile or _MAX_TILE, rows)
    tile = max(align, (tile + align - 1) // align * align)
    padded = (rows + tile - 1) // tile * tile
    return tile, padded


@functools.partial(
    jax.jit,
    static_argnames=("relus", "residual_idx", "tile", "out_pool", "interpret"),
)
def fused_conv_chain_packed(
    xpk: jax.Array,  # (R, rows, 2*Cin) f=2 packed activation
    weights,  # tuple of (w (9,Cin,Cout), b (Cout,)) per conv, in chain order
    vs: jax.Array,  # (R,) valid position start at this stage's resolution
    ve: jax.Array,  # (R,) valid position end
    *,
    relus: tuple,  # per conv
    residual_idx: int = -1,  # chain output += output of this conv (or -1)
    tile: int = 0,
    out_pool: int = 1,  # fused epilogue maxpool (the NEXT stage's pre-pool)
    interpret: bool = False,
):
    """Run a chain of k=9 convs (+bias+ReLU+masking, optional residual) as
    one fused kernel over f=2 packed tiles. Returns the packed chain output
    (R, rows/out_pool, 2*Cout_last) — pooled in VMEM when out_pool > 1, so
    the stage boundary costs one pooled-size HBM write instead of a full
    write + XLA-maxpool round trip."""
    r, rows, _ = xpk.shape
    n_convs = len(weights)
    assert len(relus) == n_convs
    assert rows % out_pool == 0, (rows, out_pool)
    dtype = xpk.dtype
    packed = [s2d_conv_weights(w, b) for w, b in weights]
    cout2 = packed[-1][0].shape[-1]
    orig_rows = rows
    # fp32 live buffers are 2x bf16; halve the tile to stay inside the
    # 100MB scoped-VMEM budget at 256-lane stages.
    tile, padded = _plan_tiles(
        rows, tile, max_tile=_MAX_TILE // (2 if dtype == jnp.float32 else 1),
        align=_HB * out_pool,
    )
    if padded != rows:  # masking keeps pad rows zero (position >= ve)
        xpk = jnp.pad(xpk, ((0, 0), (0, padded - rows), (0, 0)))
        rows = padded
    ntiles = rows // tile
    assert rows % tile == 0 and tile % _HB == 0, (rows, tile)
    # with a single tile both halos are zeroed in-kernel; index maps just
    # need any in-bounds block
    hstep = tile // _HB if ntiles > 1 else 0
    nblk16 = rows // _HB

    in_specs = [
        pl.BlockSpec(
            (1, tile, xpk.shape[-1]),
            lambda i, j, *_: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, _HB, xpk.shape[-1]),
            lambda i, j, *_: (
                i, jnp.clip(j * hstep - 1, 0, nblk16 - 1), 0
            ),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, _HB, xpk.shape[-1]),
            lambda i, j, *_: (
                i, jnp.clip(j * hstep + hstep, 0, nblk16 - 1), 0
            ),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = []
    for wp, bp in packed:
        wp2 = wp.reshape(-1, wp.shape[-1])  # (5*cin2, cout2) tap-concat form
        in_specs.append(
            pl.BlockSpec(wp2.shape, lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, bp.shape[0]), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands += [wp2, bp.reshape(1, -1)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r, ntiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile // out_pool, cout2), lambda i, j, *_: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _chain_kernel,
        tile=tile,
        n_convs=n_convs,
        relus=tuple(relus),
        residual_idx=residual_idx,
        couts=tuple(p[0].shape[-1] // 2 for p in packed),
        out_dtype=dtype,
        out_pool=out_pool,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, rows // out_pool, cout2), dtype),
        # ~23MB scoped VMEM at fp32/192-lane stages with 2048-row tiles —
        # above Mosaic's conservative 16MB default, well under the 128MB
        # physical VMEM; output blocks are disjoint per grid step.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(vs.astype(jnp.int32), ve.astype(jnp.int32), xpk, xpk, xpk, *operands)
    out_rows = orig_rows // out_pool
    return out[:, :out_rows] if out_rows != rows // out_pool else out


def pack2(x: jax.Array) -> jax.Array:
    """(R, L, C) -> (R, L/2, 2C) f=2 space-to-depth view (pure reshape)."""
    r, l, c = x.shape
    return x.reshape(r, l // 2, 2 * c)


def unpack2(x: jax.Array) -> jax.Array:
    """(R, rows, 2C) -> (R, 2*rows, C)."""
    r, rows, c2 = x.shape
    return x.reshape(r, rows * 2, c2 // 2)
