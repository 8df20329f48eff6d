"""Training loop drivers for the three stages.

The reference's training scripts are infinite while-loops with periodic
torch.save and print (train/README.md; train_h1esc_a.py:134-247). Here each
stage has a Trainer with:
  * a sampler-backed input pipeline (orca_tpu.data.sampler),
  * the jitted stage step (orca_tpu.training.stages),
  * orbax checkpointing with full state (params/opt/swa/step/scheduler),
  * validation with per-window Pearson r driving ReduceLROnPlateau,
  * SWA support (stage a),
  * structured JSONL metrics.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orca_tpu.nn import decoders
from orca_tpu.training import losses, optim, swa as swa_lib
from orca_tpu.training.stages import (
    StageAConfig,
    StageBConfig,
    StageCConfig,
    make_stage_a_step,
    make_stage_b_eval,
    make_stage_b_step,
    make_stage_c_eval,
    make_stage_c_step,
    stage_a_eval_metrics,
)
from orca_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class LoopConfig:
    workdir: str
    lr: float = 0.002
    batch_size: int = 16
    checkpoint_every: int = 500
    validate_every: int = 2000
    val_batches: int = 8
    max_steps: Optional[int] = None
    use_swa: bool = False
    seed: int = 314
    # parallel input pipeline (reference SamplerDataLoader num_workers,
    # train_h1esc_a.py:133); 0 = sample synchronously in the step loop
    num_workers: int = 0
    loader_backend: str = "process"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(workdir: str, step: int, state: dict) -> None:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(workdir), f"ckpt_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def latest_checkpoint(workdir: str) -> Optional[str]:
    if not os.path.isdir(workdir):
        return None
    steps = []
    for d in os.listdir(workdir):
        if d.startswith("ckpt_") and d[5:].isdigit():
            steps.append(int(d[5:]))
    if not steps:
        return None
    return os.path.join(os.path.abspath(workdir), f"ckpt_{max(steps)}")


def restore_state(workdir: str, template: dict) -> Optional[dict]:
    import orbax.checkpoint as ocp

    path = latest_checkpoint(workdir)
    if path is None:
        return None
    with ocp.StandardCheckpointer() as ckptr:
        t = template
        if "rng" in t:
            # legacy checkpoints predate the "rng" entry: decide from the
            # checkpoint's own metadata rather than by catching restore
            # failures (which would also swallow corrupt-step errors).
            try:
                saved = ckptr.metadata(path)
            except Exception:
                saved = None
            keys = getattr(saved, "keys", lambda: None)()
            if keys is not None and "rng" not in keys:
                t = {k: v for k, v in t.items() if k != "rng"}
        return ckptr.restore(path, t)


def _host_state_path(workdir: str, step: int) -> str:
    # per-process file on multi-host runs for write-safety (no two
    # processes race on one file); under global-batch semantics the
    # sampler state is identical across hosts (launch._per_process), so
    # the sidecars hold equal payloads and any one restores the run
    suffix = "" if jax.process_count() == 1 else f".p{jax.process_index()}"
    return os.path.join(
        os.path.abspath(workdir), f"ckpt_{step}.host{suffix}.json"
    )


def save_host_state(workdir: str, step: int, payload: dict) -> None:
    """JSON sidecar next to the orbax step dir for host-side state that is
    not a pytree of arrays: plateau-scheduler counters and the sampler's
    bit-generator state (arbitrary-precision ints — JSON handles them,
    numpy does not). Written atomically."""
    import json

    path = _host_state_path(workdir, step)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_host_state(workdir: str, step: int) -> Optional[dict]:
    import json

    path = _host_state_path(workdir, step)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _sampler_rng_state(sampler) -> Optional[dict]:
    bg = getattr(getattr(sampler, "rng", None), "bit_generator", None)
    return bg.state if bg is not None else None


def _restore_sampler_rng(sampler, state: Optional[dict]) -> None:
    if state is None:
        return
    bg = getattr(getattr(sampler, "rng", None), "bit_generator", None)
    if bg is not None and state.get("bit_generator") == type(bg).__name__:
        bg.state = state


def _mesh_encoder_fn(mesh, block_bp):
    """Encoder override for a mesh with a non-trivial 'seq' axis: the
    frozen bp tower runs sequence-sharded with ppermute halo exchange
    (its activations are >=95% of the cascade FLOPs). Returns None (use
    the default single-device tower) otherwise."""
    if mesh is None or "seq" not in mesh.axis_names or mesh.shape["seq"] <= 1:
        return None
    from orca_tpu.parallel.sequence import sharded_encoder_tower

    def encoder_fn(p, s):
        return sharded_encoder_tower(p, s, mesh, block_bp=block_bp)

    return encoder_fn


class StageATrainer:
    """1Mb-model training (reference train_h1esc_a.py)."""

    def __init__(self, cfg: StageAConfig, loop: LoopConfig, sampler,
                 normmat_r: np.ndarray, eps: float,
                 params: Optional[dict] = None, mesh=None):
        """mesh: optional jax Mesh with a 'data' axis — batches are placed
        data-parallel across it (and across hosts via
        parallel.multihost.shard_batch when running multi-process); params
        and optimizer state are replicated."""
        self.cfg = cfg
        self.loop = loop
        self.sampler = sampler
        self.mesh = mesh
        self.normmat_r = jnp.asarray(normmat_r, jnp.float32)
        self.eps = float(eps)
        self.opt, self.step_fn = make_stage_a_step(cfg)
        key = jax.random.PRNGKey(loop.seed)
        self.params = params or decoders.init_net(
            key, num_1d=cfg.num_1d, num_2d=getattr(cfg, "num_2d", 1)
        )
        self.opt_state = self.opt.init(self.params)
        self.swa_state = (
            swa_lib.swa_init(self.params) if loop.use_swa else None
        )
        self.bn_refresh = (
            swa_lib.make_swa_bn_refresh(cfg) if loop.use_swa else None
        )
        self.scheduler = optim.ReduceLROnPlateau(lr=loop.lr)
        self.step = 0
        self.logger = MetricsLogger(loop.workdir, "stage_a")
        self.rng = jax.random.PRNGKey(loop.seed + 1)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            if self.swa_state is not None:
                self.swa_state = jax.device_put(self.swa_state, repl)

    def _place(self, *arrays):
        """Device placement for a batch: data-parallel over the mesh when
        configured (multi-host safe), plain asarray otherwise."""
        if self.mesh is None:
            out = tuple(jnp.asarray(a) for a in arrays)
            return out if len(out) > 1 else out[0]
        from orca_tpu.parallel.multihost import shard_batch

        return shard_batch(self.mesh, *arrays)

    # -- checkpoint ------------------------------------------------------

    def _state(self):
        s = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
            "lr": self.scheduler.lr,
            # numpy, not jax: a single-device jax array is host-local and
            # unserializable by orbax on multi-process runs
            "rng": np.asarray(self.rng),
        }
        if self.swa_state is not None:
            s["swa"] = self.swa_state
        return s

    def save(self):
        save_state(self.loop.workdir, self.step, self._state())
        save_host_state(self.loop.workdir, self.step, {
            "sched": self.scheduler.state_dict(),
            "sampler_rng": _sampler_rng_state(self.sampler),
        })

    def try_restore(self) -> bool:
        """Step-identical resume: params/opt/step + the jax rng stream, the
        plateau scheduler's counters and the sampler's bit-generator state
        are all restored, so a killed-and-resumed run replays the exact
        losses of an unkilled one (synchronous sampling; prefetch-worker
        draw order is not replayed). Beats the reference, which reloads
        only model+optimizer (train_h1esc_a.py:106-124)."""
        restored = restore_state(self.loop.workdir, self._state())
        if restored is None:
            return False
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])
        self.scheduler.lr = float(restored["lr"])
        if "rng" in restored:
            self.rng = jnp.asarray(restored["rng"])
        if self.swa_state is not None and "swa" in restored:
            self.swa_state = restored["swa"]
        host = load_host_state(self.loop.workdir, self.step)
        if host:
            self.scheduler.load_state_dict(host["sched"])
            _restore_sampler_rng(self.sampler, host.get("sampler_rng"))
        return True

    # -- training --------------------------------------------------------

    def train_batches(self) -> Iterator[tuple]:
        if self.loop.num_workers > 0:
            from orca_tpu.data.pipeline import PrefetchLoader

            with PrefetchLoader(
                self.sampler, self.loop.batch_size, mode="train",
                num_workers=self.loop.num_workers,
                backend=self.loop.loader_backend, seed=self.loop.seed,
            ) as loader:
                yield from loader
        else:
            while True:
                yield self.sampler.sample(self.loop.batch_size, mode="train")

    def run(self, max_steps: Optional[int] = None):
        max_steps = max_steps or self.loop.max_steps
        for batch in self.train_batches():
            seq, target = batch[0], batch[1]
            target_1d = batch[-1] if self.cfg.num_1d else np.zeros(
                (seq.shape[0], self.cfg.crop, 0), np.float32
            )
            self.rng, sub = jax.random.split(self.rng)
            seq_d, target_d, target_1d_d = self._place(seq, target, target_1d)
            self.params, self.opt_state, metrics = self.step_fn(
                self.params, self.opt_state, seq_d, target_d, target_1d_d,
                sub, jnp.float32(self.scheduler.lr), self.normmat_r, self.eps,
            )
            if self.swa_state is not None:
                self.swa_state = swa_lib.swa_update(self.swa_state, self.params)
                # BN-stat refresh: train-mode forward of the averaged params
                # on this batch (train_h1esc_a.py:162-165)
                self.rng, sub_bn = jax.random.split(self.rng)
                self.swa_state = self.bn_refresh(
                    self.swa_state, seq_d, sub_bn
                )
            self.step += 1
            if self.step % self.loop.checkpoint_every == 0:
                self.logger.log(self.step, lr=self.scheduler.lr, **metrics)
                self.save()
            if self.step % self.loop.validate_every == 0:
                corr = self.validate()
                self.scheduler.step(corr)
                self.logger.log(self.step, val_pearson=corr,
                                lr=self.scheduler.lr)
            if max_steps is not None and self.step >= max_steps:
                return metrics

    def validate(self) -> float:
        params = (
            self.swa_state["avg"] if self.swa_state is not None else self.params
        )
        corrs = []
        for _ in range(self.loop.val_batches):
            batch = self.sampler.sample(self.loop.batch_size, mode="validate")
            seq, target = batch[0], batch[1]
            target_1d = batch[-1] if self.cfg.num_1d else np.zeros(
                (seq.shape[0], self.cfg.crop, 0), np.float32
            )
            # same mesh placement as the train step: on multi-host runs
            # every process must see the same global validation batch (a
            # per-host corr would step the LR scheduler divergently)
            seq_d, target_d, target_1d_d = self._place(seq, target, target_1d)
            corr, _mse, _bce = stage_a_eval_metrics(
                params, self.cfg, seq_d, target_d, target_1d_d,
                self.normmat_r, self.eps,
            )
            # per-sample corr is data-sharded: on multi-process runs a
            # plain np.asarray would touch non-addressable shards
            from orca_tpu.parallel.multihost import fetch_global

            corrs.append(fetch_global(corr))
        return float(np.nanmean(np.concatenate(corrs)))


class StageBTrainer:
    """1-32Mb stage training (reference train_h1esc_b.py): accumulates
    windows, skips >50%-NaN targets, random zoom cascade."""

    def __init__(self, cfg: StageBConfig, loop: LoopConfig, sampler,
                 trainable: dict, frozen: dict, normmats: np.ndarray,
                 epss: np.ndarray, nan_skip: float = 0.5,
                 accumulate: int = 4, mesh=None):
        """mesh: optional jax Mesh — batches are placed data-parallel over
        its 'data' axis (multi-host safe via multihost.shard_batch), and
        when the mesh has a 'seq' axis of size > 1 the frozen bp encoder
        runs sequence-sharded with ppermute halo exchange
        (parallel.sequence.sharded_encoder_tower). The reference trains
        every stage on 4 GPUs via DataParallel (train_h1esc_b.py:170-187);
        here both batch and sequence axes scale across the mesh."""
        self.normmats = jnp.asarray(normmats, jnp.float32)
        self.epss = jnp.asarray(epss, jnp.float32)
        encoder_fn = _mesh_encoder_fn(mesh, cfg.encoder_block_bp)
        opt, step_fn = make_stage_b_step(cfg, encoder_fn=encoder_fn)
        eval_fn = make_stage_b_eval(cfg, encoder_fn=encoder_fn)
        self._base_init(cfg, loop, sampler, trainable, frozen, nan_skip,
                        accumulate, mesh, opt, step_fn, eval_fn, "stage_b")

    def _base_init(self, cfg, loop, sampler, trainable, frozen, nan_skip,
                   accumulate, mesh, opt, step_fn, eval_fn, stage_name):
        """State shared by the cascade-stage trainers (B and C)."""
        self.cfg = cfg
        self.loop = loop
        self.sampler = sampler
        self.trainable = trainable
        self.frozen = frozen
        self.mesh = mesh
        self.nan_skip = nan_skip
        self.accumulate = accumulate
        self.opt, self.step_fn, self.eval_fn = opt, step_fn, eval_fn
        self.opt_state = self.opt.init(trainable)
        self.scheduler = optim.ReduceLROnPlateau(lr=loop.lr)
        self.step = 0
        self.logger = MetricsLogger(loop.workdir, stage_name)
        self.rng = jax.random.PRNGKey(loop.seed)
        self._loader = None
        if mesh is not None:
            self._replicate_state()

    def _replicate_state(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        self.trainable = jax.device_put(self.trainable, repl)
        self.frozen = jax.device_put(self.frozen, repl)
        self.opt_state = jax.device_put(self.opt_state, repl)

    def _place(self, *arrays):
        """Batch placement: data-parallel over the mesh when configured
        (multi-host safe), plain asarray otherwise."""
        if self.mesh is None:
            out = tuple(jnp.asarray(a) for a in arrays)
            return out if len(out) > 1 else out[0]
        from orca_tpu.parallel.multihost import shard_batch

        return shard_batch(self.mesh, *arrays)

    def _sample(self, mode: str):
        """One sampler draw; training draws come from the prefetch workers
        when num_workers > 0 (overlaps cooler fetches/coarse-graining with
        the device step)."""
        if mode == "train" and self.loop.num_workers > 0:
            if self._loader is None:
                from orca_tpu.data.pipeline import PrefetchLoader

                self._loader = PrefetchLoader(
                    self.sampler, 1, mode="train",
                    num_workers=self.loop.num_workers,
                    backend=self.loop.loader_backend, seed=self.loop.seed,
                )
            return self._loader.get()
        return self.sampler.sample(1, mode=mode)

    def close(self):
        if self._loader is not None:
            self._loader.close()
            self._loader = None

    def _accumulate_batch(self, mode: str = "train"):
        seqs, targets = [], []
        while len(seqs) < self.accumulate:
            seq, target = self._sample(mode)[:2]
            if np.isnan(target).mean() > self.nan_skip:
                continue
            seqs.append(seq[0])
            targets.append(target[0])
        return np.stack(seqs), np.stack(targets)

    # -- checkpoint ------------------------------------------------------

    def _state(self):
        return {
            "trainable": self.trainable,
            "opt_state": self.opt_state,
            "step": self.step,
            "lr": self.scheduler.lr,
            "rng": np.asarray(self.rng),  # see StageATrainer._state
        }

    def save(self):
        save_state(self.loop.workdir, self.step, self._state())
        save_host_state(self.loop.workdir, self.step, {
            "sched": self.scheduler.state_dict(),
            "sampler_rng": _sampler_rng_state(self.sampler),
        })

    def try_restore(self) -> bool:
        """Step-identical resume from the latest orbax checkpoint in
        workdir (the reference's equivalent is the try/except reload at
        script start, train_h1esc_b.py:106-130): restores the jax rng,
        plateau-scheduler counters and sampler bit-generator state too —
        see StageATrainer.try_restore."""
        restored = restore_state(self.loop.workdir, self._state())
        if restored is None:
            return False
        self.trainable = restored["trainable"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])
        self.scheduler.lr = float(restored["lr"])
        if "rng" in restored:
            self.rng = jnp.asarray(restored["rng"])
        host = load_host_state(self.loop.workdir, self.step)
        if host:
            self.scheduler.load_state_dict(host["sched"])
            _restore_sampler_rng(self.sampler, host.get("sampler_rng"))
        return True

    # -- validation ------------------------------------------------------

    def validate(self) -> float:
        """Fixed-offset validation cascade (train_h1esc_b.py:296-506):
        per-level masked MSE + per-sample Pearson r on holdout windows.
        Returns the mean-over-levels Pearson r (the plateau metric)."""
        level_corrs = {lv: [] for lv in self.cfg.levels}
        level_mses = {lv: [] for lv in self.cfg.levels}
        for _ in range(self.loop.val_batches):
            seq, target = self._accumulate_batch(mode="validate")
            seq_d, target_d = self._place(seq, target)
            mses, corrs = self.eval_fn(
                self.trainable, self.frozen, seq_d, target_d,
                self.normmats, self.epss,
            )
            from orca_tpu.parallel.multihost import fetch_global

            for lv in self.cfg.levels:
                level_corrs[lv].append(fetch_global(corrs[lv]))
                level_mses[lv].append(float(fetch_global(mses[lv])))
        metrics = {}
        for lv in self.cfg.levels:
            metrics[f"val_pearson_{lv}"] = float(
                np.nanmean(np.concatenate(level_corrs[lv]))
            )
            metrics[f"val_mse_{lv}"] = float(np.mean(level_mses[lv]))
        corr = float(np.nanmean(
            [metrics[f"val_pearson_{lv}"] for lv in self.cfg.levels]
        ))
        self.logger.log(self.step, val_pearson=corr, **metrics)
        return corr

    def run(self, max_steps: Optional[int] = None):
        try:
            return self._run(max_steps)
        finally:
            self.close()

    def _run(self, max_steps: Optional[int] = None):
        max_steps = max_steps or self.loop.max_steps
        metrics = {}
        while max_steps is None or self.step < max_steps:
            seq, target = self._accumulate_batch()
            self.rng, sub = jax.random.split(self.rng)
            seq_d, target_d = self._place(seq, target)
            self.trainable, self.opt_state, metrics = self.step_fn(
                self.trainable, self.frozen, self.opt_state,
                seq_d, target_d, sub,
                jnp.float32(self.scheduler.lr), self.normmats, self.epss,
            )
            self.step += 1
            if self.step % self.loop.checkpoint_every == 0:
                self.logger.log(self.step, lr=self.scheduler.lr, **metrics)
                self.save()
            if self.step % self.loop.validate_every == 0:
                corr = self.validate()
                self.scheduler.step(corr)
        return metrics


class StageCTrainer(StageBTrainer):
    """32-256Mb stage training (reference train_h1esc_c.py): cross-chromosome
    samples with per-sample background normmats."""

    def __init__(self, cfg: StageCConfig, loop: LoopConfig, sampler,
                 trainable: dict, frozen: dict, nan_skip: float = 0.5,
                 accumulate: int = 1, mesh=None):
        """mesh: see StageBTrainer — dp batch placement over 'data', plus a
        sequence-sharded frozen encoder when 'seq' > 1 (the 256Mb windows
        are where sequence sharding matters most)."""
        encoder_fn = _mesh_encoder_fn(mesh, cfg.encoder_block_bp)
        opt, step_fn = make_stage_c_step(cfg, encoder_fn=encoder_fn)
        eval_fn = make_stage_c_eval(cfg, encoder_fn=encoder_fn)
        self._base_init(cfg, loop, sampler, trainable, frozen, nan_skip,
                        accumulate, mesh, opt, step_fn, eval_fn, "stage_c")

    def _accumulate_batch(self, mode: str = "train"):
        seqs, targets, normmats = [], [], []
        while len(seqs) < self.accumulate:
            seq, target, normmat = self._sample(mode)[:3]
            if np.isnan(target).mean() > self.nan_skip:
                continue
            nm = normmat[0]
            mask = np.isnan(nm)
            if mask.any():
                nm = np.where(mask, np.nanmin(nm), nm)
            seqs.append(seq[0])
            targets.append(target[0])
            normmats.append(nm)
        return np.stack(seqs), np.stack(targets), np.stack(normmats)

    def validate(self) -> float:
        """Stage-c fixed-offset validation (train_h1esc_c.py:257-420) with
        per-sample backgrounds; returns mean-over-levels Pearson r."""
        level_corrs = {lv: [] for lv in self.cfg.levels}
        level_mses = {lv: [] for lv in self.cfg.levels}
        for _ in range(self.loop.val_batches):
            seq, target, normmat = self._accumulate_batch(mode="validate")
            seq_d, target_d, normmat_d = self._place(seq, target, normmat)
            mses, corrs = self.eval_fn(
                self.trainable, self.frozen, seq_d, target_d, normmat_d,
            )
            from orca_tpu.parallel.multihost import fetch_global

            for lv in self.cfg.levels:
                level_corrs[lv].append(fetch_global(corrs[lv]))
                level_mses[lv].append(float(fetch_global(mses[lv])))
        metrics = {}
        for lv in self.cfg.levels:
            metrics[f"val_pearson_{lv}"] = float(
                np.nanmean(np.concatenate(level_corrs[lv]))
            )
            metrics[f"val_mse_{lv}"] = float(np.mean(level_mses[lv]))
        corr = float(np.nanmean(
            [metrics[f"val_pearson_{lv}"] for lv in self.cfg.levels]
        ))
        self.logger.log(self.step, val_pearson=corr, **metrics)
        return corr

    def _run(self, max_steps: Optional[int] = None):
        max_steps = max_steps or self.loop.max_steps
        metrics = {}
        while max_steps is None or self.step < max_steps:
            seq, target, normmat = self._accumulate_batch()
            self.rng, sub = jax.random.split(self.rng)
            seq_d, target_d, normmat_d = self._place(seq, target, normmat)
            self.trainable, self.opt_state, metrics = self.step_fn(
                self.trainable, self.frozen, self.opt_state,
                seq_d, target_d, normmat_d,
                sub, jnp.float32(self.scheduler.lr),
            )
            self.step += 1
            if self.step % self.loop.checkpoint_every == 0:
                self.logger.log(self.step, lr=self.scheduler.lr, **metrics)
                self.save()
            if self.step % self.loop.validate_every == 0:
                corr = self.validate()
                self.scheduler.step(corr)
        return metrics
