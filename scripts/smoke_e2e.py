"""End-to-end product-path smoke on the available accelerator: synthetic
genome -> 32Mb region predict + duplication screen -> PDFs.

Drives the REAL pipelines (genome encoding, zoom cascade with the fused
Pallas kernels, SV algebra, genomeplot PDF rendering) at full geometry —
the fastest whole-product verification that exists (bench.py only times
the cascade). Expected: pred.pdf + dup.{alt,ref.l,ref.r}.pdf written,
first call pays the compile (~100s on v5e via axon), the dup screen
reuses the compiled programs (~20s for 3 cascade passes)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(outdir="/tmp/orca_tpu_smoke"):
    import jax
    import jax.numpy as jnp

    from orca_tpu.data.genome import CodeGenome
    from orca_tpu.models import zoo
    from orca_tpu.predict import pipelines

    rng = np.random.RandomState(0)
    gen = CodeGenome({
        "chrT": rng.randint(0, 4, 40_000_000).astype(np.uint8),
        "chr1": rng.randint(0, 4, 40_000_000).astype(np.uint8),
    })
    bundle = zoo.fold_bundle(zoo.random_32m_bundle(seed=0))
    bundle = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        bundle,
    )
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()
    pipelines.process_region("chrT", 19_000_000, 21_000_000, genome=gen,
                             models=[bundle], file=outdir + "/pred",
                             show_genes=False)
    print(f"process_region: {time.time() - t0:.1f}s (incl. compile)")
    t0 = time.time()
    pipelines.process_dup("chrT", 19_500_000, 20_500_000, genome=gen,
                          models=[bundle], file=outdir + "/dup",
                          show_genes=False)
    print(f"process_dup: {time.time() - t0:.1f}s (compiled programs reused)")
    import glob

    outs = sorted(os.path.basename(p) for p in glob.glob(outdir + "/*.pdf"))
    assert outs == ["dup.alt.pdf", "dup.ref.l.pdf", "dup.ref.r.pdf",
                    "pred.pdf"], outs
    print("ok:", outs)


if __name__ == "__main__":
    main(*sys.argv[1:])
