"""Sustained variant-screen benchmark through the warm server.

The reference's stated scale-out use case is "more than a couple dozen
variants" (reference README.md:236); the number an operator plans
capacity with is the amortized per-variant time once the process is warm.
This launches ONE `orca-tpu serve` process (compiled cascades reused),
runs a warmup region + N dup/del screens in the production configuration
(both H1-ESC + HFF models per command, bf16 serving precision, full
PDF + pkl outputs), and reports seconds/variant.

Self-contained: synthesizes the model dir (random folded bundles via
zoo.save_bundle — the `orca-tpu convert` output format) and a code-memmap
genome; the parent process pins itself to CPU so the server subprocess
owns the chip.

Usage: python scripts/bench_serve_screen.py [N] [--json SMOKE_r05.json]
"""

import atexit
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fixture(root):
    """Model dir (2 bundle pickles) + resource dir (codes memmap)."""
    model_dir = os.path.join(root, "models")
    resource_dir = os.path.join(root, "resources")
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(resource_dir, exist_ok=True)

    from orca_tpu.models import zoo

    for seed, name in ((0, "h1esc"), (1, "hff")):
        bundle = zoo.fold_bundle(zoo.random_32m_bundle(seed=seed))
        zoo.save_bundle(bundle, os.path.join(model_dir, f"orca_{name}.bundle"))

    rng = np.random.RandomState(0)
    stem = "Homo_sapiens.GRCh38.dna.primary_assembly"
    mm_path = os.path.join(resource_dir, f"{stem}.codes.mmap")
    n8, n9 = 34_000_000, 34_000_000
    mm = np.memmap(mm_path, dtype=np.uint8, mode="w+", shape=(n8 + n9,))
    mm[:n8] = rng.randint(0, 4, n8).astype(np.uint8)
    mm[n8:] = rng.randint(0, 4, n9).astype(np.uint8)
    mm.flush()
    with open(mm_path + ".json", "w") as f:
        json.dump({"chroms": [["chr8", 0, n8], ["chr9", n8, n8 + n9]]}, f)
    return model_dir, resource_dir


def main(n_variants=10, json_path=None):
    import jax

    # pin the parent to CPU: only ONE process may hold the 16GB chip, and
    # it must be the server (conftest pattern — env vars are too late once
    # sitecustomize registered the axon plugin)
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()

    root = "/tmp/orca_tpu_serve_bench"
    out = os.path.join(root, "out")
    os.makedirs(out, exist_ok=True)
    model_dir, resource_dir = build_fixture(root)

    env = dict(os.environ)
    env["ORCA_TPU_PARAM_DTYPE"] = "bfloat16"  # production serving config
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.Popen(
        [sys.executable, "-m", "orca_tpu.cli", "serve",
         "--model-dir", model_dir, "--resource-dir", resource_dir,
         "--prewarm", "32M"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )

    # A surviving server holds the whole 16GB chip and starves the next
    # run (observed: two servers sharing the chip halve throughput), so
    # tear it down on ANY parent exit — including `timeout`'s SIGTERM.
    def _cleanup(*_a):
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
        if _a:  # invoked as a signal handler
            sys.exit(143)

    atexit.register(_cleanup)
    signal.signal(signal.SIGTERM, _cleanup)

    def send(line):
        proc.stdin.write(line + "\n")
        proc.stdin.flush()

    warm_lines = []

    def wait_for(tokens=("OK", "ERR", "READY")):
        while True:
            line = proc.stdout.readline()
            if not line:
                raise RuntimeError("server exited early")
            line = line.strip()
            if line.startswith("WARM"):
                warm_lines.append(line)
            if any(line.startswith(t) for t in tokens):
                return line

    # --prewarm compiles the cascade programs concurrently BEFORE READY,
    # so ready_s is the full time-to-service (load + parallel compile)
    t0 = time.time()
    assert wait_for(("READY",)) == "READY"
    ready_s = time.time() - t0

    # first command: everything already compiled, so this is ~steady-state
    t0 = time.time()
    send(f"region chr8:16900000-17100000 {out} --no-target")
    line = wait_for()
    assert line == "OK", line
    warmup_s = time.time() - t0

    # the sustained screen: alternating dup/del at shifting coordinates —
    # every command re-runs full cascades (fwd+RC, 2 models) on new
    # sequence through the already-compiled programs
    cmds = []
    for i in range(n_variants):
        mode = "dup" if i % 2 == 0 else "del"
        chrom = "chr8" if i % 4 < 2 else "chr9"
        start = 16_500_000 + i * 50_000
        end = start + 500_000
        cmds.append(f"{mode} {chrom}:{start}-{end} {out} --no-target")
    t0 = time.time()
    for c in cmds:
        send(c)
        line = wait_for()
        assert line == "OK", line
    screen_s = time.time() - t0
    send("quit")
    proc.wait(timeout=60)

    prewarm_s = None
    if warm_lines:  # "WARM 32M 61.2s"
        try:
            prewarm_s = float(warm_lines[0].split()[-1].rstrip("s"))
        except ValueError:
            pass
    fields = {
        "serve_ready_s": round(ready_s, 1),
        "serve_prewarm_s": prewarm_s,
        "serve_first_command_s": round(warmup_s, 1),
        "serve_n_variants": n_variants,
        "serve_seconds_per_variant": round(screen_s / n_variants, 2),
        "serve_dtype": "bfloat16",
        "serve_models_per_command": 2,
    }
    print(json.dumps(fields))
    if json_path:
        from smoke_e2e import merge_json

        merge_json(json_path, fields)


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main(int(argv[0]) if argv else 10, json_path=json_path)
