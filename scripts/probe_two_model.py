"""Probe: 2-model cascade strategies on the real accelerator.

Measures (bf16, 32Mb window, fwd+RC):
  1. encoder-only time (where do the FLOPs go?)
  2. one-model full cascade
  3. two-model sequential (today's genomepredict loop)
  4. two-model with stacked params + vmapped decoders (shared encoder run
     per model, decode levels vmapped over the model axis)

Decides whether model-axis batching is worth wiring into genomepredict.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from orca_tpu.models import zoo
    from orca_tpu.predict.multiscale import (
        GEOM_32M,
        _cascade_32mb,
        _encode_32mb_jit,
    )

    from orca_tpu.certify import _cast_bundle

    b0 = _cast_bundle(zoo.fold_bundle(zoo.random_32m_bundle(seed=0)),
                      "bfloat16")
    b1 = _cast_bundle(zoo.fold_bundle(zoo.random_32m_bundle(seed=1)),
                      "bfloat16")
    log_nm = jnp.asarray(b0.log_normmats())

    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=32_000_000)
    seq = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes][None])
    mpos = wpos = jnp.float32(16_000_000.0)

    np.asarray(jnp.zeros((1,)))  # channel warmup

    def timeit(label, fn, iters=3):
        fn()  # compile+warm
        t0 = time.time()
        for _ in range(iters):
            fn()
        dt = (time.time() - t0) / iters
        print(f"{label}: {dt*1000:.1f} ms", flush=True)
        return dt

    # 1. encoder only
    def enc_only():
        out = _encode_32mb_jit(b0, GEOM_32M, seq)
        return float(jnp.sum(out[0][:, :8].astype(jnp.float32)))

    t_enc = timeit("encoder+pyramid (fwd+RC)", enc_only)

    # 2. one model full cascade
    def one_model():
        preds, _ = _cascade_32mb(b0, GEOM_32M, seq, mpos, wpos, log_nm)
        return float(jnp.sum(preds[-1].astype(jnp.float32)))

    t_one = timeit("one-model cascade", one_model)

    # 3. two models sequential
    def two_seq():
        s = 0.0
        for b in (b0, b1):
            preds, _ = _cascade_32mb(b, GEOM_32M, seq, mpos, wpos, log_nm)
            s += float(jnp.sum(preds[-1].astype(jnp.float32)))
        return s

    t_two = timeit("two-model sequential", two_seq)

    # 4. encoder at batch 4 (both models' fwd+RC as one conv program using
    # one model's weights — an upper bound for "batch the encoders")
    seq2 = jnp.concatenate([seq, seq], axis=0)

    def enc_b4():
        out = _encode_32mb_jit(b0, GEOM_32M, seq2)
        return float(jnp.sum(out[0][:, :8].astype(jnp.float32)))

    t_enc4 = timeit("encoder+pyramid batch-4 (one weight set)", enc_b4)

    # 5. vmapped two-model decode over stacked decoder params
    from orca_tpu.predict import multiscale as M

    stacked_dec = {
        lv: jax.tree.map(
            lambda a, b: jnp.stack([a, b]), b0.decoders[lv], b1.decoders[lv]
        )
        for lv in b0.decoders
    }
    stacked_1pt = jax.tree.map(
        lambda a, b: jnp.stack([a, b]), b0.decoder_1pt, b1.decoder_1pt
    )

    from orca_tpu.nn import decoders as D

    @jax.jit
    def decode_vmapped(dec, d1pt, enc_crop, log_nm_j, coarse):
        # enc_crop: (M, B, crop, 128); vmap over the model axis
        def run(p, p1, ec, co):
            distenc = jnp.broadcast_to(
                log_nm_j[None, :, :, None],
                (ec.shape[0], GEOM_32M.crop, GEOM_32M.crop, 1),
            )
            out = D.apply_decoder(p, ec, distenc, co,
                                  upsample_mode="bilinear")
            return out + D.apply_decoder1m(p1, ec)

        return jax.vmap(run)(dec, d1pt, enc_crop, coarse)

    enc_crop = jnp.zeros((2, 2, 250, 128), jnp.bfloat16)
    coarse = jnp.zeros((2, 2, 125, 125, 1), jnp.bfloat16)

    def dec_vm():
        out = decode_vmapped(stacked_dec[1], stacked_1pt, enc_crop,
                             log_nm[-1], coarse)
        return float(jnp.sum(out.astype(jnp.float32)))

    t_decvm = timeit("vmapped 2-model decode, one level", dec_vm, iters=5)

    # single-model decode for comparison
    @jax.jit
    def decode_single(dec, d1pt, ec, log_nm_j, co):
        distenc = jnp.broadcast_to(
            log_nm_j[None, :, :, None],
            (ec.shape[0], GEOM_32M.crop, GEOM_32M.crop, 1),
        )
        out = D.apply_decoder(dec, ec, distenc, co, upsample_mode="bilinear")
        return out + D.apply_decoder1m(d1pt, ec)

    def dec_one():
        out = decode_single(b0.decoders[1], b0.decoder_1pt, enc_crop[0],
                            log_nm[-1], coarse[0])
        return float(jnp.sum(out.astype(jnp.float32)))

    t_decone = timeit("single-model decode, one level", dec_one, iters=5)

    print(f"\nencoder share of one-model cascade: {t_enc/t_one:.2f}")
    print(f"two-seq / one-model: {t_two/t_one:.2f}")
    print(f"encoder batch-4 / batch-2: {t_enc4/t_enc:.2f} "
          "(<2 => batching the encoder wins)")
    print(f"vmapped decode / single decode: {t_decvm/t_decone:.2f} "
          "(<2 => vmapping decoders wins)")


if __name__ == "__main__":
    main()
