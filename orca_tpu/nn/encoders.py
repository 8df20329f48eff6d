"""Orca encoder towers, TPU-native.

Three encoder sections mirror the reference capability surface:
  * EncoderTower: one-hot bp sequence -> 128ch features at 4kb bins
    (reference `Encoder`, orca_modules.py:803-980).
  * PyramidEncoder(levels=5, up_pass=True): 4kb -> 128kb U-Net style
    (reference `Encoder2`, orca_modules.py:984-1169; up_pass=False gives
    `Encoder2b`, :1173-1276).
  * PyramidEncoder(levels=3, up_pass=True): 128kb -> 1024kb
    (reference `Encoder3`, orca_modules.py:1279-1406).

The bp-resolution tower supports *blocked* execution: the input is split
into fixed-size chunks with a halo that covers the encoder's entire
receptive field (~104 kb < 112 kb halo), so blocked and monolithic execution
are mathematically identical. The reference runs these blocks in a
sequential Python loop (orca_modules.py:955-979); here they are a
`lax.map`/scan over a stacked block axis (one compiled program, bounded
memory) or sharded across devices (orca_tpu.parallel.sequence).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from orca_tpu.nn.core import (
    Block,
    BNUpdates,
    apply_block,
    conv_pair_1d,
    init_block,
)

# (cin, cout) and pre-pool for the 7 stages of the bp-resolution tower;
# pool product = 4*4*5*5*5*2 = 4000 bp/bin (orca_modules.py:811-927).
STAGES = (
    (4, 64, 0),
    (64, 96, 4),
    (96, 128, 4),
    (128, 128, 5),
    (128, 128, 5),
    (128, 128, 5),
    (128, 128, 2),
)
BIN_BP = 4000
# Radius of the tower's receptive field in bp: sum over stages of
# 16 * cumulative_pool (4 convs of k=9 per stage -> radius 16 bins).
RECEPTIVE_FIELD_BP = 104016


def encoder_tower_spec() -> dict:
    return {
        "lconv": [
            conv_pair_1d(ci, co, relu=False, pool=p) for ci, co, p in STAGES
        ],
        "conv": [conv_pair_1d(co, co, relu=True) for _, co, _ in STAGES],
    }


def init_encoder_tower(rng: jax.Array, dtype=jnp.float32) -> dict:
    spec = encoder_tower_spec()
    kl, kc = jax.random.split(rng)
    return {
        "lconv": [
            init_block(r, b, dtype)
            for r, b in zip(jax.random.split(kl, len(spec["lconv"])), spec["lconv"])
        ],
        "conv": [
            init_block(r, b, dtype)
            for r, b in zip(jax.random.split(kc, len(spec["conv"])), spec["conv"])
        ],
    }


def apply_encoder_stages(
    params: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> jax.Array:
    """Run the 7 residual stages on (N, L, 4); returns (N, L/4000, 128).

    Stage i+1 consumes ``conv_i(lconv_i(x)) + lconv_i(x)``, but the tower's
    return value is the final stage's conv output *without* the residual
    (orca_modules.py:948-950: ``out7 = self.conv7(lout7); return out7``).
    """
    spec = encoder_tower_spec()
    pre = f"{path}/" if path else ""
    out = x
    cout = x
    for i, (lb, lp, cb, cp) in enumerate(zip(
        spec["lconv"], params["lconv"], spec["conv"], params["conv"]
    )):
        lout = apply_block(lp, lb, out, train=train, rng=rng,
                           bn_updates=bn_updates, path=f"{pre}lconv/{i}")
        cout = apply_block(cp, cb, lout, train=train, rng=rng,
                           bn_updates=bn_updates, path=f"{pre}conv/{i}")
        out = cout + lout
    return cout


def to_compute_dtype(x: jax.Array, dtype) -> jax.Array:
    """Convert an input block to the compute dtype.

    uint8 inputs are *packed quarter-scale one-hot* (one-hot * 4, so the
    0.25-valued unknown-base rows stay exact): 16x less host->device
    traffic than float32 for 32-256Mb windows. The inverse scale is applied
    here, after the cheap device-side cast.
    """
    if x.dtype == jnp.uint8:
        return x.astype(dtype) * jnp.asarray(0.25, dtype)
    return x.astype(dtype)


def pack_onehot(sequence) -> "jnp.ndarray":
    """Host-side packing: float one-hot (values in {0, 0.25, 1}) -> uint8
    quarter-scale (values in {0, 1, 4}). Exact round trip."""
    import numpy as np

    return (np.asarray(sequence) * 4).astype(np.uint8)


def apply_encoder_stages_masked(
    params: dict,
    x: jax.Array,
    valid_start_bp,
    valid_end_bp,
) -> jax.Array:
    """apply_encoder_stages over an extended array whose positions outside
    [valid_start_bp, valid_end_bp) are out-of-sequence.

    Zeroing the invalid region after *every* conv unit makes the extended
    computation bit-equivalent to the monolithic tower's per-layer zero
    padding at the true sequence boundary (a plain zero-padded input is NOT:
    conv biases propagate non-zeros into the pad region from layer 2 on).
    Both bounds must be multiples of 4000 (bin alignment guarantees pool
    windows never straddle the boundary) and may be scalars or (N,) arrays
    (per-batch-row validity, used for batched block execution).
    Inference-mode only.
    """
    from orca_tpu.ops import nn_ops
    from orca_tpu.nn.core import apply_unit

    spec = encoder_tower_spec()
    vs = jnp.atleast_1d(jnp.asarray(valid_start_bp))
    ve = jnp.atleast_1d(jnp.asarray(valid_end_bp))

    def mask(arr, res):
        idx = jnp.arange(arr.shape[1])
        m = (idx[None, :] >= vs[:, None] // res) & (
            idx[None, :] < ve[:, None] // res
        )
        return arr * m[:, :, None].astype(arr.dtype)

    def run_block(block_params, block, arr, res):
        if block.pool:
            arr = nn_ops.maxpool1d(arr, block.pool)
            res *= block.pool
        for p, u in zip(block_params, block.units):
            arr = mask(apply_unit(p, u, arr), res)
        return arr, res

    out = x
    cout = x
    res = 1
    for lb, lp, cb, cp in zip(
        spec["lconv"], params["lconv"], spec["conv"], params["conv"]
    ):
        lout, res = run_block(lp, lb, out, res)
        cout, _ = run_block(cp, cb, lout, res)
        out = cout + lout
    return cout


def apply_encoder_stages_pallas(
    params: dict,
    x: jax.Array,
    valid_start_bp,
    valid_end_bp,
    *,
    interpret: bool = False,
) -> jax.Array:
    """apply_encoder_stages_masked with each stage's conv chain fused into
    one Pallas TPU kernel (orca_tpu.ops.pallas.conv1d): convs, biases,
    ReLUs, residual add, position-exact boundary masking AND the next
    stage's pre-maxpool run in VMEM per f=2 space-to-depth packed tile.
    Activations stay packed across all 7 stages — each stage boundary is a
    single pooled-size HBM write, with no XLA pool / pack / unpack glue in
    between (the glue measured ~4x the matmul time; docs/ARCHITECTURE.md).
    Same semantics (per-layer zero padding at [valid_start_bp,
    valid_end_bp)). The tiny first conv (4ch contract) stays in XLA.
    Inference-mode only."""
    from orca_tpu.ops import nn_ops
    from orca_tpu.ops.pallas.conv1d import (
        fused_conv_chain_packed,
        pack2,
        unpack2,
    )

    spec = encoder_tower_spec()
    n, length, _ = x.shape
    vs_bp = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(valid_start_bp)), (n,))
    ve_bp = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(valid_end_bp)), (n,))

    pools = [s[2] for s in STAGES]  # per-stage PRE-pool (0,4,4,5,5,5,2)
    out = x
    pk = None  # f=2 packed activation between stages
    res = 1
    fused_pool = False  # this stage's pre-pool already fused upstream
    nstages = len(spec["lconv"])
    for i, (lb, lp, cp) in enumerate(
        zip(spec["lconv"], params["lconv"], params["conv"])
    ):
        if lb.pool:
            res *= lb.pool
            if not fused_pool:
                pk = pack2(nn_ops.maxpool1d(unpack2(pk), lb.pool))
        vs = vs_bp // res
        ve = ve_bp // res
        # Fuse the next stage's pre-pool into this kernel's epilogue when
        # the pooled row count stays whole (positions divisible by 2*pool
        # — true for every production geometry; fall back to an XLA pool
        # between stages otherwise).
        next_pool = pools[i + 1] if i + 1 < nstages else 0
        positions = length // res
        out_pool = (
            next_pool
            if next_pool > 1 and positions % (2 * next_pool) == 0
            else 1
        )
        if i == 0:
            # one-hot 4ch -> 64ch conv: fused INTO the stage-0 chain
            # kernel as a 3-tap f=16 packed conv whose output reshapes
            # in-VMEM to the f=2 chain layout — the 64ch stage-0 input
            # activation never exists in HBM (as an XLA conv + mask it
            # was 41% of the tower's wall-clock). The (L, 4) operand is
            # read f=16-packed (64 lanes): a position-major layout would
            # be lane-padded 32x.
            from orca_tpu.ops.pallas.conv1d import fused_first_stage_packed

            chain = (
                (lp[1]["w"], lp[1]["b"]),
                (cp[0]["w"], cp[0]["b"]),
                (cp[1]["w"], cp[1]["b"]),
            )
            pk = fused_first_stage_packed(
                out.reshape(n, out.shape[1] // 16, 64),
                (lp[0]["w"], lp[0]["b"]),
                chain, vs, ve,
                relus=(False, True, True), residual_idx=0,
                out_pool=out_pool, interpret=interpret,
            )
            fused_pool = out_pool > 1
            continue
        else:
            pk_in = pk
            chain = (
                (lp[0]["w"], lp[0]["b"]),
                (lp[1]["w"], lp[1]["b"]),
                (cp[0]["w"], cp[0]["b"]),
                (cp[1]["w"], cp[1]["b"]),
            )
            relus = (False, False, True, True)
            res_idx = 1
        if i == nstages - 1:
            res_idx = -1  # final stage returns the conv-pair output alone
        pk = fused_conv_chain_packed(
            pk_in, chain, vs, ve,
            relus=relus, residual_idx=res_idx, out_pool=out_pool,
            interpret=interpret,
        )
        fused_pool = out_pool > 1
    return unpack2(pk)


def pallas_encoder_enabled() -> bool:
    """Pallas encoder path: config override, else auto (on for TPU backends).

    Requires inference params (BN folded); training towers keep the lax path
    (autodiff through the composed primitives)."""
    from orca_tpu.utils.config import get_config

    cfg = get_config()
    if cfg.use_pallas is not None:
        return bool(cfg.use_pallas)
    return jax.default_backend() == "tpu"


def apply_encoder_tower(
    params: dict,
    x: jax.Array,
    *,
    block_bp: Optional[int] = None,
    halo_bp: int = 112000,
    block_group: Optional[int] = None,
    checkpoint_blocks: bool = False,
    valid_start_bp=None,
    valid_end_bp=None,
) -> jax.Array:
    """bp -> 4kb encoder forward with optional blocked execution.

    x: (N, L, 4) one-hot (uint8 packed quarter-scale supported, see
        to_compute_dtype; a 256Mb window stays 1GB instead of 4GB on device).
    block_bp: if set, split the sequence into chunks with a `halo_bp` halo
        each side (all multiples of 4000; halo >= RECEPTIVE_FIELD_BP makes
        blocked execution exactly equal to the monolithic conv). Unlike the
        reference's *sequential* block loop (orca_modules.py:955-979),
        blocks here become a **batch dimension** — one wide conv program
        that keeps the MXU busy — processed `block_group` blocks at a time
        (default: a whole 32Mb window at once; grouping bounds peak
        activation memory for 256Mb inputs). The true-sequence boundary is
        handled by masked execution (apply_encoder_stages_masked), so any
        window length reuses one compilation per shape.
    valid_start_bp / valid_end_bp: optional (possibly traced) scalar bounds
        of the *real* sequence inside x; positions outside are treated as
        beyond the sequence boundary (per-layer zero padding semantics).
        Used by the sequence-sharded tower, whose shards carry neighbor
        halos / ppermute zeros at the mesh ends
        (orca_tpu.parallel.sequence). Must be multiples of 4000.
    """
    # match the parameter dtype (bf16 params select the fast MXU path)
    param_dtype = params["lconv"][0][0]["w"].dtype
    if param_dtype == jnp.bfloat16:
        compute_dtype = jnp.bfloat16
    elif x.dtype in (jnp.float32, jnp.bfloat16):
        compute_dtype = x.dtype
    else:
        compute_dtype = jnp.float32
    n, length, _ = x.shape
    from orca_tpu.utils.config import get_config

    cfg = get_config()
    bounded = valid_start_bp is not None or valid_end_bp is not None
    vs0 = valid_start_bp if valid_start_bp is not None else 0
    ve0 = valid_end_bp if valid_end_bp is not None else length
    use_pallas = (
        pallas_encoder_enabled() and "bn" not in params["lconv"][0][0]
    )
    use_pallas = use_pallas and length % BIN_BP == 0
    if block_bp is None and use_pallas:
        # Larger blocks than the XLA path: the fused kernels stream tiles
        # from HBM, so block size is bounded only by live activation memory
        # (conv-a output: block x 64ch per row) — 4Mb blocks cut the 112kb
        # halo redundancy to ~5% (vs 28% at the XLA path's 800kb). An
        # explicit block_bp argument wins over the config default.
        block_bp = cfg.pallas_block_bp
        if n * length <= 2 * block_bp:
            return apply_encoder_stages_pallas(
                params,
                to_compute_dtype(x, compute_dtype),
                vs0,
                ve0,
                interpret=cfg.interpret_pallas,
            )
        block_group = block_group or max(1, 8_000_000 // block_bp)
    elif block_bp is None and length > cfg.encoder_block_bp:
        # No explicit blocking requested: bound activation memory with the
        # XLA-path config default rather than compiling a monolithic conv
        # over an arbitrarily long sequence.
        block_bp = cfg.encoder_block_bp

    if block_bp is None or length <= block_bp:
        xd = to_compute_dtype(x, compute_dtype)
        if use_pallas:
            return apply_encoder_stages_pallas(
                params, xd, vs0, ve0, interpret=cfg.interpret_pallas
            )
        if bounded:
            return apply_encoder_stages_masked(params, xd, vs0, ve0)
        return apply_encoder_stages(params, xd)

    if block_bp % BIN_BP or halo_bp % BIN_BP or length % BIN_BP:
        raise ValueError(
            "block_bp, halo_bp and the sequence length must be multiples of "
            f"4000; got {block_bp=} {halo_bp=} {length=}"
        )
    nblocks = -(-length // block_bp)  # ceil: last block zero-padded + masked
    halo_bins = halo_bp // BIN_BP
    block_bins = block_bp // BIN_BP
    seg_bp = block_bp + 2 * halo_bp

    # Pad with the left halo and enough tail for the last (partial) block.
    # Concatenate-with-zeros rather than jnp.pad: XLA fuses a concat
    # consuming a jit parameter into the downstream slice reads, while a
    # pad-of-parameter materializes a tiled copy of the operand whose
    # 4-wide minor dim lane-pads 32x (a 256Mb uint8 window = 32GB, OOM;
    # measured both ways on v5e).
    pad_tail = nblocks * block_bp - length + halo_bp
    zl = jnp.zeros((n, halo_bp, x.shape[2]), x.dtype)
    zr = jnp.zeros((n, pad_tail, x.shape[2]), x.dtype)
    xp = jnp.concatenate([zl, x, zr], axis=1)

    # Work-per-scan-step: `block_group`/_default_block_group cap the
    # in-flight extent in ROWS of sequence (nblocks*n (block, batch-row)
    # pairs total). Each step batches bpg blocks x rchunk batch rows; when
    # the batch alone exceeds the cap (large-batch screening/training), the
    # batch axis is chunked too so peak activation memory stays bounded.
    rows_cap = block_group or _default_block_group(block_bp, nblocks * n)
    if n > rows_cap:
        rchunk = max(d for d in range(1, rows_cap + 1) if n % d == 0)
    else:
        rchunk = n
    bpg = max(1, min(nblocks, rows_cap // rchunk or 1))
    while nblocks % bpg:
        bpg -= 1
    nrgroups = n // rchunk

    def run_group(carry, idx):
        """One step: blocks [b0, b0+bpg) of batch rows [r0, r0+rchunk),
        stacked on the batch axis. Blocks are cut with `dynamic_slice` here
        rather than a pre-gathered overlapping-window tensor: an
        (nblocks, seg_bp) gather index blows XLA's compile time up ~30x
        (306s -> 6s measured for the 32Mb tower) for identical runtime."""
        b0, r0 = idx
        xr = (
            lax.dynamic_slice_in_dim(xp, r0, rchunk, axis=0)
            if rchunk < n else xp
        )
        # ONE wide dynamic-slice per group, then static overlapping cuts:
        # concatenating multiple dynamic-slices of the big padded array
        # makes XLA materialize the operand in its tiled layout — whose
        # 4-wide minor dim lane-pads 32x (a 256Mb uint8 window becomes a
        # 32GB copy, instant OOM; measured — the single-slice form fuses
        # pad+slice into the read and the input stays linear).
        wide = lax.dynamic_slice_in_dim(
            xr, b0 * block_bp, bpg * block_bp + 2 * halo_bp, axis=1
        )
        segs = [
            lax.slice_in_dim(wide, j * block_bp, j * block_bp + seg_bp,
                             axis=1)
            for j in range(bpg)
        ]
        seg = jnp.concatenate(segs, axis=0) if bpg > 1 else segs[0]
        seg = to_compute_dtype(seg, compute_dtype)
        # Per-row valid bp range (sequence/validity bounds + tail padding).
        seg_start = (b0 + jnp.arange(bpg)) * block_bp - halo_bp
        gvs = jnp.repeat(jnp.clip(vs0 - seg_start, 0, seg_bp), rchunk)
        gve = jnp.repeat(jnp.clip(ve0 - seg_start, 0, seg_bp), rchunk)
        if use_pallas:
            out = apply_encoder_stages_pallas(
                params, seg, gvs, gve, interpret=cfg.interpret_pallas
            )
        else:
            out = apply_encoder_stages_masked(params, seg, gvs, gve)
        out = lax.slice_in_dim(out, halo_bins, halo_bins + block_bins, axis=1)
        return carry, out

    if checkpoint_blocks:
        run_group = jax.checkpoint(run_group)

    ngroups = nblocks // bpg
    if ngroups == 1 and nrgroups == 1:
        _, outs = run_group(None, (jnp.int32(0), jnp.int32(0)))
        outs = outs[None]
    else:
        # row-group major, block-group minor
        b0s = jnp.tile(jnp.arange(ngroups, dtype=jnp.int32) * bpg, nrgroups)
        r0s = jnp.repeat(
            jnp.arange(nrgroups, dtype=jnp.int32) * rchunk, ngroups
        )
        _, outs = lax.scan(run_group, None, (b0s, r0s))

    # (nrgroups*ngroups, bpg*rchunk, block_bins, C)
    #   -> (N, nblocks*block_bins, C), crop pad
    outs = outs.reshape(nrgroups, ngroups, bpg, rchunk, block_bins, -1)
    outs = jnp.transpose(outs, (0, 3, 1, 2, 4, 5)).reshape(
        n, nblocks * block_bins, -1
    )
    return outs[:, : length // BIN_BP, :]


def _default_block_group(block_bp: int, rows: int) -> int:
    """Cap, in rows of sequence in flight per scan step (each row is one
    (block, batch-row) pair of extent block_bp), keeping total extent
    around 16Mb of sequence (fits v5e-lite HBM: stage-1 activations ~2GB
    bf16 with a few live buffers; 32Mb-at-once compiles to ~30GB and OOMs
    on 16GB chips)."""
    cap = max(1, 16_000_000 // block_bp)
    return min(rows, cap)


# --------------------------------------------------------------------------
# Pyramid encoders (4kb->128kb and 128kb->1024kb)
# --------------------------------------------------------------------------


def pyramid_spec(levels: int, up_pass: bool) -> dict:
    spec = {
        "lblocks": [conv_pair_1d(128, 128, relu=False, pool=2) for _ in range(levels)],
        "blocks": [conv_pair_1d(128, 128, relu=True) for _ in range(levels)],
    }
    if up_pass:
        spec["downl"] = [
            conv_pair_1d(128, 128, relu=False, upsample=2) for _ in range(levels)
        ]
        # Up-pass active blocks lack BatchNorm on their second conv
        # (orca_modules.py:1114-1120) — load-bearing for checkpoint parity.
        spec["down"] = [
            conv_pair_1d(128, 128, relu=True, second_bn=False)
            for _ in range(levels)
        ]
    return spec


def init_pyramid(rng: jax.Array, levels: int, up_pass: bool, dtype=jnp.float32):
    spec = pyramid_spec(levels, up_pass)
    out = {}
    keys = jax.random.split(rng, len(spec))
    for key, (name, blocks) in zip(keys, spec.items()):
        out[name] = [
            init_block(r, b, dtype)
            for r, b in zip(jax.random.split(key, len(blocks)), blocks)
        ]
    return out


def apply_pyramid(
    params: dict,
    x: jax.Array,
    *,
    levels: int,
    up_pass: bool,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> list:
    """Returns `levels+1` encodings, finest-first.

    With up_pass (Encoder2/3): U-Net — down pass halves resolution per level,
    up pass doubles it back, skip-adding the matching down encoding
    (orca_modules.py:1151-1169). Without (Encoder2b): raw down-pass encodings.
    """
    spec = pyramid_spec(levels, up_pass)
    pre = f"{path}/" if path else ""
    kw = dict(train=train, rng=rng, bn_updates=bn_updates)
    out = x
    encodings = [out]
    for i, (lb, lp, cb, cp) in enumerate(zip(
        spec["lblocks"], params["lblocks"], spec["blocks"], params["blocks"]
    )):
        lout = apply_block(lp, lb, out, path=f"{pre}lblocks/{i}", **kw)
        out = apply_block(cp, cb, lout, path=f"{pre}blocks/{i}", **kw) + lout
        encodings.append(out)
    if not up_pass:
        return encodings

    encodings2 = [out]
    for i, (enc, lb, lp, cb, cp) in enumerate(zip(
        reversed(encodings[:-1]),
        spec["downl"],
        params["downl"],
        spec["down"],
        params["down"],
    )):
        lout = apply_block(lp, lb, out, path=f"{pre}downl/{i}", **kw)
        out = apply_block(cp, cb, lout, path=f"{pre}down/{i}", **kw) + lout
        out = enc + out
        encodings2.append(out)
    encodings2.reverse()
    return encodings2
