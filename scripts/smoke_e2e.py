"""End-to-end product-path smoke on the available accelerator: synthetic
genome -> 32Mb region predict + duplication screen -> PDFs.

Drives the REAL pipelines (genome encoding, zoom cascade with the fused
Pallas kernels, SV algebra, genomeplot PDF rendering) at full geometry —
the fastest whole-product verification that exists (bench.py only times
the cascade). Expected: pred.pdf + dup.{alt,ref.l,ref.r}.pdf written,
first call pays the compile (~100s on v5e via axon), the dup screen
reuses the compiled programs (~20s for 3 cascade passes).

Usage: python scripts/smoke_e2e.py [outdir] [--json SMOKE_r05.json]
With --json, writes/merges the pdf list + timings into the given JSON
artifact so L3/L5 regressions are caught on the round record
(reference product surface being smoked: orca_predict.py:3168-3391).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def merge_json(path, fields):
    out = {}
    if path and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out.update(fields)
    if path:
        with open(path, "w") as f:
            f.write(json.dumps(out, indent=2))
    return out


def main(outdir="/tmp/orca_tpu_smoke", json_path=None):
    import jax

    from orca_tpu.data.genome import CodeGenome
    from orca_tpu.models import zoo
    from orca_tpu.predict import pipelines

    rng = np.random.RandomState(0)
    gen = CodeGenome({
        "chrT": rng.randint(0, 4, 40_000_000).astype(np.uint8),
        "chr1": rng.randint(0, 4, 40_000_000).astype(np.uint8),
    })
    bundle = zoo.cast_bundle(
        zoo.fold_bundle(zoo.random_32m_bundle(seed=0)), "bfloat16"
    )
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()
    pipelines.process_region("chrT", 19_000_000, 21_000_000, genome=gen,
                             models=[bundle], file=outdir + "/pred",
                             show_genes=False)
    region_s = time.time() - t0
    print(f"process_region: {region_s:.1f}s (incl. compile)")
    t0 = time.time()
    pipelines.process_dup("chrT", 19_500_000, 20_500_000, genome=gen,
                          models=[bundle], file=outdir + "/dup",
                          show_genes=False)
    dup_s = time.time() - t0
    print(f"process_dup: {dup_s:.1f}s (compiled programs reused)")
    import glob

    outs = sorted(os.path.basename(p) for p in glob.glob(outdir + "/*.pdf"))
    assert outs == ["dup.alt.pdf", "dup.ref.l.pdf", "dup.ref.r.pdf",
                    "pred.pdf"], outs
    record = merge_json(json_path, {
        "smoke_pdfs": outs,
        "smoke_region_s_incl_compile": round(region_s, 1),
        "smoke_dup_screen_s": round(dup_s, 1),
        "smoke_device": str(jax.devices()[0]),
    })
    print("ok:", json.dumps(record))


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main(*argv, json_path=json_path)
