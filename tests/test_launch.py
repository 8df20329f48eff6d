"""Operator-facing training launch layer: config-driven CLI smoke test.

Chains the three reference training stages through `orca-tpu train` on
synthetic resources, exactly as an operator would with the real 34GB
micro-C data (round-2 VERDICT missing #1): stage a trains the 1Mb Net,
stage b freezes its tower/Decoder_1m, stage c freezes the stage-b pyramid
— the reference's cross-stage transfer (train_h1esc_b.py:90-104,
train_h1esc_c.py:84-98) driven end-to-end from TrainJob JSON configs.
"""

import json
import os

import numpy as np
import pytest

from orca_tpu import cli
from orca_tpu.training.launch import TrainJob, build_mesh

CHRLEN = 2_048_000


def test_trainjob_from_json_overrides_and_validation(tmp_path):
    path = tmp_path / "job.json"
    path.write_text(json.dumps({
        "stage": "a", "workdir": "/tmp/x", "levels": [32, 1],
        "validation_holdout": ["chr2"],
    }))
    job = TrainJob.from_json(str(path), max_steps=7, workdir=None)
    assert job.max_steps == 7  # CLI override wins
    assert job.workdir == "/tmp/x"  # None override ignored
    assert job.levels == (32, 1)
    assert job.validation_holdout == ("chr2",)

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"stage": "a", "workdir": "x", "nope": 1}))
    with pytest.raises(ValueError, match="nope"):
        TrainJob.from_json(str(bad))


def test_build_mesh_spec():
    mesh = build_mesh(TrainJob(stage="a", workdir="x", mesh="data=2,seq=4"))
    assert mesh.shape == {"data": 2, "seq": 4}
    assert build_mesh(TrainJob(stage="a", workdir="x")) is None
    # a typo'd axis must raise, not silently shrink the mesh
    with pytest.raises(ValueError, match="date"):
        build_mesh(TrainJob(stage="a", workdir="x", mesh="date=4,seq=2"))


def _write_genome_fasta(path, chroms, rng):
    bases = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "w") as f:
        for name in chroms:
            f.write(f">{name}\n")
            f.write(bases[rng.randint(0, 4, CHRLEN)].tobytes().decode())
            f.write("\n")


def _write_dense_store(path, chroms, res, rng):
    nb = CHRLEN // res
    np.savez(path, **{
        c: np.abs(rng.rand(nb, nb)).astype(np.float32) for c in chroms
    })


def _write_expectation(path, nbins):
    d = np.arange(nbins, dtype=np.float64)
    np.save(path, -1.5 * np.log1p(d) - 2.0)


@pytest.mark.slow
def test_cli_train_all_stages(tmp_path):
    rng = np.random.RandomState(0)
    chroms = ["chr1", "chr2", "chr3"]
    fasta = str(tmp_path / "genome.fa")
    _write_genome_fasta(fasta, chroms, rng)

    # -- stage a ---------------------------------------------------------
    # 40kb windows at 1kb target resolution (production: 1Mb/1kb)
    _write_dense_store(tmp_path / "microc_1000.npz", chroms, 1000, rng)
    _write_expectation(tmp_path / "expected.res1000.npy", 2048)
    bed = tmp_path / "tracks.bed"
    bed.write_text("".join(
        f"chr{c}\t{s}\t{s + 30000}\ttrack{i}\n"
        for c in (1, 2, 3) for i, s in ((0, 10000), (1, 200000))
    ))
    (tmp_path / "tracks.features").write_text("track0\ntrack1\n")
    workdir_a = str(tmp_path / "run_a")
    cfg_a = tmp_path / "job_a.json"
    cfg_a.write_text(json.dumps({
        "workdir": workdir_a,
        "genome_fasta": fasta,
        "dense_store": str(tmp_path / "microc_1000.npz"),
        "bed_path": str(bed),
        "bed_features": str(tmp_path / "tracks.features"),
        "expectation_npy": str(tmp_path / "expected.res1000.npy"),
        "validation_holdout": ["chr3"], "test_holdout": [],
        "window_bp": 40_000, "batch_size": 2, "checkpoint_every": 2,
        "validate_every": 100, "max_steps": 2,
    }))
    rc = cli.main(["train", "a", "--config", str(cfg_a)])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir_a, "ckpt_2"))

    # resume: two more steps continue from step 2
    rc = cli.main(["train", "a", "--config", str(cfg_a), "--max-steps", "4"])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir_a, "ckpt_4"))

    # -- stage b ---------------------------------------------------------
    # 1.024Mb windows at 4kb; frozen tower + Decoder_1m from stage a
    _write_dense_store(tmp_path / "microc_4000.npz", chroms, 4000, rng)
    _write_expectation(tmp_path / "expected.res4000.npy", 256)
    workdir_b = str(tmp_path / "run_b")
    cfg_b = tmp_path / "job_b.json"
    cfg_b.write_text(json.dumps({
        "workdir": workdir_b,
        "genome_fasta": fasta,
        "dense_store": str(tmp_path / "microc_4000.npz"),
        "expectation_npy": str(tmp_path / "expected.res4000.npy"),
        "validation_holdout": ["chr3"], "test_holdout": [],
        "init_workdir_a": workdir_a,
        "window_bp": 1_024_000, "levels": [32, 1], "accumulate": 1,
        "checkpoint_every": 1, "validate_every": 100, "max_steps": 1,
    }))
    rc = cli.main(["train", "b", "--config", str(cfg_b)])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir_b, "ckpt_1"))

    # -- stage c ---------------------------------------------------------
    # 2.048Mb cross-chromosome windows at 32kb with per-sample backgrounds;
    # frozen tower from stage a, frozen pyramid from stage b
    _write_dense_store(tmp_path / "microc_32000.npz", chroms, 32000, rng)
    d = np.arange(64, dtype=np.float64)
    np.save(tmp_path / "expected.res32000.mono.npy",
            -1.2 * np.log1p(d) - 3.0)
    np.save(tmp_path / "expected.res32000.trans.npy", np.float64(-9.0))
    workdir_c = str(tmp_path / "run_c")
    cfg_c = tmp_path / "job_c.json"
    cfg_c.write_text(json.dumps({
        "workdir": workdir_c,
        "genome_fasta": fasta,
        "dense_store": str(tmp_path / "microc_32000.npz"),
        "background_cis_npy": str(tmp_path / "expected.res32000.mono.npy"),
        "background_trans_npy": str(tmp_path / "expected.res32000.trans.npy"),
        "validation_holdout": ["chr3"], "test_holdout": [],
        "init_workdir_a": workdir_a, "init_workdir_b": workdir_b,
        "window_bp": 2_048_000, "accumulate": 1,
        "checkpoint_every": 1, "validate_every": 100, "max_steps": 1,
    }))
    rc = cli.main(["train", "c", "--config", str(cfg_c)])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir_c, "ckpt_1"))


def test_serve_loop_dispatch(monkeypatch, capsys):
    """The warm server parses stdin commands, caches resources per family,
    dispatches predictions, and survives bad input."""
    import io
    import sys as _sys

    from orca_tpu import cli
    import orca_tpu.predict.resources as resources_mod

    calls = []
    loads = []

    monkeypatch.setattr(
        cli, "_run_prediction",
        lambda args, parser, res=None: calls.append(
            (args.command, args.coordinate, res)
        ),
    )
    monkeypatch.setattr(
        resources_mod, "load_resources",
        lambda **kw: loads.append(kw) or f"RES{len(loads)}",
    )
    monkeypatch.setattr(_sys, "stdin", io.StringIO(
        "# comment\n"
        "region chr1:1000-2000 /tmp/o1 --no-target\n"
        "dup chr1:1000-2000 /tmp/o2\n"
        "region chr1:1000-2000 /tmp/o3 --model-dir /other/models\n"
        "frobnicate chr1:1-2 /tmp/o4\n"
        "quit\n"
    ))
    rc = cli.main(["serve"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("READY")
    assert out.count("OK") == 3
    assert "ERR" in out  # the frobnicate line
    # resources loaded ONCE per (family, dirs): first two commands share,
    # the per-line --model-dir forces a second load (review finding: the
    # cache must not serve the wrong checkpoints)
    assert len(loads) == 2
    assert loads[1]["model_dir"] == "/other/models"
    assert [c[0] for c in calls] == ["region", "dup", "region"]
    assert calls[0][2] == calls[1][2] == "RES1"
    assert calls[2][2] == "RES2"


@pytest.mark.slow
def test_cli_train_stage_a_multi_head(tmp_path):
    """Leukemia-style stage-a job: two dense 2D target sources -> a
    two-head Net with per-dataset backgrounds (orca_leukemia training)."""
    rng = np.random.RandomState(1)
    chroms = ["chr1", "chr2"]
    fasta = str(tmp_path / "genome.fa")
    _write_genome_fasta(fasta, chroms, rng)
    _write_dense_store(tmp_path / "ds_a.npz", chroms, 1000, rng)
    _write_dense_store(tmp_path / "ds_b.npz", chroms, 1000, rng)
    _write_expectation(tmp_path / "exp_a.npy", 2048)
    _write_expectation(tmp_path / "exp_b.npy", 2048)
    workdir = str(tmp_path / "run_mh")
    cfg = tmp_path / "job_mh.json"
    cfg.write_text(json.dumps({
        "workdir": workdir,
        "genome_fasta": fasta,
        "dense_store": [str(tmp_path / "ds_a.npz"), str(tmp_path / "ds_b.npz")],
        "expectation_npy": [str(tmp_path / "exp_a.npy"),
                            str(tmp_path / "exp_b.npy")],
        "validation_holdout": ["chr2"], "test_holdout": [],
        "window_bp": 40_000, "batch_size": 2, "checkpoint_every": 2,
        "validate_every": 100, "max_steps": 2,
    }))
    rc = cli.main(["train", "a", "--config", str(cfg)])
    assert rc == 0
    assert os.path.isdir(os.path.join(workdir, "ckpt_2"))


def test_load_resources_bundle_pickles_and_dtype(tmp_path):
    """Pre-converted bundle pickles (the `orca-tpu convert` output) load
    without torch statedicts, and dtype='bfloat16' casts the serving
    params (the production config; the default comes from
    ORCA_TPU_PARAM_DTYPE via OrcaConfig.param_dtype)."""
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.predict.resources import load_resources

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    for seed, name in ((0, "h1esc"), (1, "hff")):
        zoo.save_bundle(
            zoo.fold_bundle(zoo.random_32m_bundle(
                seed=seed, nbins=256, crop=8)),
            str(model_dir / f"orca_{name}.bundle"),
        )
    res = load_resources(models=["32M"], model_dir=str(model_dir),
                         resource_dir=str(tmp_path), dtype="bfloat16")
    assert set(res.models) == {"h1esc", "hff"}
    w = res.models["h1esc"].encoder["lconv"][0][0]["w"]
    assert w.dtype == jnp.bfloat16
    # normmats stay float64/float32 host arrays usable by the pipelines
    assert res.models["hff"].normmats[1].shape == (8, 8)

    res32 = load_resources(models=["32M"], model_dir=str(model_dir),
                           resource_dir=str(tmp_path), dtype="float32")
    assert res32.models["h1esc"].encoder["lconv"][0][0]["w"].dtype == (
        jnp.float32
    )


def test_load_resources_leukemia_missing_raises(tmp_path):
    """Explicitly requesting leukemia models without the statedicts fails
    with a clear error (not a silent empty model dict)."""
    from orca_tpu.predict.resources import load_resources

    with pytest.raises(FileNotFoundError, match="leukemia"):
        load_resources(models=["leukemia"], model_dir=str(tmp_path),
                       resource_dir=str(tmp_path))


def test_build_mesh_multihost(monkeypatch):
    """multihost=True initializes jax.distributed and builds a host-major
    mesh with seq-per-host from the mesh spec (single-process degenerate:
    all devices on 'data' except the intra-host 'seq' axis)."""
    from orca_tpu.parallel import multihost

    inits = []
    monkeypatch.setattr(multihost, "initialize",
                        lambda *a, **k: inits.append(1))
    mesh = build_mesh(TrainJob(stage="b", workdir="x", multihost=True,
                               mesh="seq=2"))
    assert inits == [1]
    assert mesh.axis_names == ("data", "seq")
    assert mesh.shape["seq"] == 2


def test_per_process_division(monkeypatch):
    from orca_tpu.training import launch

    job = TrainJob(stage="a", workdir="x", multihost=True, batch_size=16)
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    # batch counts stay GLOBAL (every process samples the same global
    # batch; shard_batch keeps the local slice) — only divisibility is
    # validated here
    assert launch._per_process(job, 16) == 16
    with pytest.raises(ValueError, match="divide"):
        launch._per_process(job, 6)
    job2 = TrainJob(stage="a", workdir="x")  # single-host: untouched
    assert launch._per_process(job2, 16) == 16
