"""Standalone 1Mb-model prediction (reference H1esc_1M / Hff_1M,
orca_models.py:449-542) and batched variant screening.

The reference exposes the 1Mb models as bare `net.forward` calls returning
the 250x250 map (the 1D chromatin-track head is computed and discarded,
orca_models.py:491-494). Here:
  * `predict_1m` — jitted forward over a batch of 1Mb windows, optionally
    returning the 1D tracks and/or averaging with the reverse complement.
  * `screen_windows` — throughput-oriented batched screening: many windows
    (e.g. a variant's ref/alt pairs across loci) in one program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orca_tpu.models.zoo import Model1MBundle
from orca_tpu.nn import decoders


@partial(jax.jit, static_argnums=(2, 3))
def _net_forward(bundle: Model1MBundle, seq, with_1d: bool, rc_average: bool):
    from orca_tpu.nn.encoders import to_compute_dtype

    param_dtype = bundle.net["encoder"]["lconv"][0][0]["w"].dtype
    dtype = jnp.bfloat16 if param_dtype == jnp.bfloat16 else jnp.float32
    x = to_compute_dtype(seq, dtype)
    if rc_average:
        x = jnp.concatenate([x, jnp.flip(x, axis=(1, 2))], axis=0)
    out = decoders.apply_net(bundle.net, x, num_1d=bundle.num_1d)
    pred, out1d = out if bundle.num_1d else (out, None)
    if rc_average:
        n = seq.shape[0]
        pred = 0.5 * pred[:n] + 0.5 * jnp.flip(pred[n:], axis=(1, 2))
        if out1d is not None:
            out1d = 0.5 * out1d[:n] + 0.5 * jnp.flip(out1d[n:], axis=(1,))
    pred = pred.astype(jnp.float32)
    if with_1d and out1d is not None:
        return pred, out1d.astype(jnp.float32)
    return pred


def predict_1m(bundle: Model1MBundle, sequence, with_1d: bool = False,
               rc_average: bool = False):
    """(N, 1e6, 4) one-hot -> (N, 250, 250, 1) map [+ (N, 250, num_1d)
    tracks]. Mirrors H1esc_1M.forward (map only) by default."""
    from orca_tpu.predict.multiscale import _device_sequence

    out = _net_forward(bundle, _device_sequence(sequence), with_1d, rc_average)
    if with_1d and isinstance(out, tuple):
        return np.asarray(out[0]), np.asarray(out[1])
    return np.asarray(out)


def log_fold_map(bundle: Model1MBundle, pred: np.ndarray) -> np.ndarray:
    """Predicted map is already log fold over background; helper returns the
    background-added unscaled map log(exp(pred)*normmat) for display."""
    return pred[..., 0] + np.log(bundle.normmats[1])


def screen_windows(bundle, sequences, batch_size: int = 4,
                   predict_fn=None) -> np.ndarray:
    """Batched screening over many 1Mb windows: (W, 1e6, 4) -> (W, 250, 250).

    Used for in-silico mutagenesis sweeps where throughput matters; windows
    are chunked to `batch_size` and run through one compiled program.
    """
    fn = predict_fn or (lambda b, s: predict_1m(b, s))
    outs = []
    w = len(sequences)
    for i in range(0, w, batch_size):
        chunk = np.asarray(sequences[i : i + batch_size])
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            outs.append(fn(bundle, chunk)[: w - i])
        else:
            outs.append(fn(bundle, chunk))
    return np.concatenate(outs, axis=0)
