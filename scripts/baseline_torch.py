"""Measure the reference-design torch cascade throughput on this host.

Grounds bench.py's `vs_baseline`: runs the reference's own modules
(orca_modules.Encoder/Encoder2/Decoder/Decoder_1m, random weights — FLOPs
and memory traffic identical to the released checkpoints) through the
faithful genomepredict zoom-loop oracle (orca_tpu.certify.torch_cascade_32m)
on a full 32Mb window, fwd+RC, fp32, and writes BASELINE_TORCH.json.

The reference publishes no inference benchmark (SURVEY.md §6); this is the
same workload bench.py measures, on the torch stack the reference actually
ships, on whatever hardware runs this script. Scaling to other hardware is
the reader's explicit step (the JSON records host info).
"""

import json
import multiprocessing
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = os.environ.get("ORCA_REFERENCE", "/root/reference")


def main():
    import numpy as np
    import torch

    sys.path.insert(0, REFERENCE)
    import orca_modules as ref

    from orca_tpu.certify import torch_cascade_32m
    from orca_tpu.predict.multiscale import GEOM_32M

    torch.manual_seed(0)
    net0 = ref.Encoder().eval()
    net = ref.Encoder2().eval()
    denets = {
        lv: ref.Decoder(upsample_mode="bilinear").eval()
        for lv in (1, 2, 4, 8, 16, 32)
    }
    denet_1pt = ref.Decoder_1m().eval()
    d = np.arange(GEOM_32M.bins, dtype=np.float64)
    idx = np.abs(np.arange(GEOM_32M.bins)[None] - np.arange(GEOM_32M.bins)[:, None])
    nm = np.exp((-1.5 * np.log1p(d) - 2.0))[idx]
    normmats = {}
    for lv in (1, 2, 4, 8, 16, 32):
        n = 250 * lv
        normmats[lv] = (
            nm[:n, :n].reshape(250, lv, 250, lv).mean(axis=(1, 3))
        )

    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=GEOM_32M.window_bp)
    seq = np.eye(4, dtype=np.float32)[codes][None]

    iters = int(os.environ.get("ORCA_BASELINE_ITERS", "1"))
    t0 = time.time()
    for _ in range(iters):
        outs, starts = torch_cascade_32m(
            (net0, net, denets, denet_1pt, normmats),
            seq, GEOM_32M.window_bp // 2, GEOM_32M.window_bp // 2, GEOM_32M,
        )
    dt = (time.time() - t0) / iters

    result = {
        "metric": "torch_reference_cascade_32Mb",
        "seconds_per_32Mb_window": round(dt, 2),
        "mb_per_s": round(32.0 / dt, 4),
        "dtype": "float32",
        "iters": iters,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": multiprocessing.cpu_count(),
        "host": platform.platform(),
        "note": (
            "reference torch modules (random weights, identical FLOPs), "
            "faithful genomepredict zoom loop, fwd+RC, CPU. The A100 "
            "design estimate in bench.py (2.0 Mb/s) assumes ~an order of "
            "magnitude over few-core CPU torch for this conv-heavy, "
            "small-channel workload."
        ),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_TORCH.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
