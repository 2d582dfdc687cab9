"""End-to-end training loop: data -> sharded step -> ckpt/metrics.

Wires the host pipeline (decoded cache + prefetch), the device mesh, the
jitted train step, orbax checkpointing with resume, and JSONL metrics —
the rebuild of the reference's fit_generator loop (SURVEY.md §3.1), with
the host<->device boundary crossed exactly once per step.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors.priors import anchors_for_model
from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.data.pipeline import (
    DecodedCache,
    DevicePrefetcher,
    epoch_batches,
)
from object_detector_tpu.data.types import Dataset
from object_detector_tpu.models.retinanet import build_model
from object_detector_tpu.parallel import mesh as mesh_lib
from object_detector_tpu.train.checkpoint import CheckpointManager
from object_detector_tpu.train.state import TrainState, create_train_state
from object_detector_tpu.train.step import make_train_step
from object_detector_tpu.utils.logging import MetricsLogger, setup_logging


def init_model_state(cfg: DetectorConfig, rng: jax.Array) -> tuple[Any, TrainState]:
    model = build_model(cfg)
    dummy = jnp.zeros((1, cfg.model.image_size, cfg.model.image_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=True)
    return model, create_train_state(cfg.train, variables)


def train(
    cfg: DetectorConfig,
    dataset: Dataset,
    num_steps: Optional[int] = None,
    metrics_path: Optional[str] = None,
    resume: bool = False,
    checkpoint_dir: Optional[str] = None,
    profile_dir: Optional[str] = None,
) -> TrainState:
    log = setup_logging()
    num_steps = num_steps or cfg.train.num_steps
    mesh = mesh_lib.make_mesh(cfg.mesh.data_parallel, cfg.mesh.data_axis)
    n_dev = mesh.devices.size
    if cfg.train.batch_size % n_dev:
        raise ValueError(
            f"global batch {cfg.train.batch_size} not divisible by {n_dev} devices"
        )
    log.info(
        "training %s: %d devices, global batch %d, %d steps",
        cfg.name, n_dev, cfg.train.batch_size, num_steps,
    )

    rng = jax.random.key(cfg.train.seed)
    rng, init_rng = jax.random.split(rng)
    model, state = init_model_state(cfg, init_rng)
    anchors = anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
    step_fn = make_train_step(cfg, model, anchors, mesh)

    ckpt_mgr: Optional[CheckpointManager] = None
    data_step = 0
    ckpt_dir = checkpoint_dir or cfg.train.checkpoint_dir
    if ckpt_dir:
        ckpt_mgr = CheckpointManager(
            ckpt_dir, cfg.train.keep_checkpoints, cfg.train.checkpoint_every
        )
        if resume:
            restored = ckpt_mgr.restore(state, rng)
            if restored is not None:
                state, rng, data_step = restored
                log.info("resumed from step %d", int(state.step))
        elif ckpt_mgr.latest_step() is not None:
            # Without this, orbax silently refuses every save at steps <=
            # the existing latest step: the run "trains" but the directory
            # keeps serving the OLD (possibly different-model) checkpoint
            # to evaluate/predict. Found by a verify drive against a stale
            # /tmp checkpoint dir.
            raise ValueError(
                f"checkpoint dir {ckpt_dir} already has a checkpoint at "
                f"step {ckpt_mgr.latest_step()}; pass --resume to continue "
                "it or point --checkpoint at a fresh directory"
            )

    cache = DecodedCache(
        dataset, cfg.model.image_size, cfg.data.max_boxes, cfg.data.num_workers,
        max_ram_bytes=int(cfg.data.max_cache_ram_gb * 2**30),
        spill_dir=cfg.data.cache_spill_dir or None,
    )
    batches = epoch_batches(
        cache, cfg.train.batch_size, cfg.train.seed, start_step=data_step
    )
    place = lambda b: mesh_lib.shard_batch(mesh, b, cfg.mesh.data_axis)  # noqa: E731
    prefetcher = DevicePrefetcher(batches, place, depth=cfg.data.prefetch)

    metrics_log = MetricsLogger(metrics_path)
    t_last = time.perf_counter()
    start_step = int(jax.device_get(state.step))
    last_logged_step = start_step

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        for step_i in range(start_step, num_steps):
            batch = next(prefetcher)
            state, metrics = step_fn(state, batch, rng)
            data_step += 1
            if ckpt_mgr is not None:
                # step passed from the host counter — no device fetch on
                # the hot path (the retention check is host-side).
                ckpt_mgr.save(state, rng, data_step, step=step_i + 1)
            if (step_i + 1) % cfg.train.log_every == 0 or step_i + 1 == num_steps:
                metrics = jax.device_get(metrics)
                now = time.perf_counter()
                # Actual steps since the last log — correct after resume at
                # step N and for the final partial window (ADVICE r1).
                steps_done = step_i + 1 - last_logged_step
                imgs_per_sec = cfg.train.batch_size * steps_done / max(now - t_last, 1e-9)
                t_last = now
                last_logged_step = step_i + 1
                metrics_log.log(
                    "train",
                    step=step_i + 1,
                    imgs_per_sec=imgs_per_sec,
                    imgs_per_sec_chip=imgs_per_sec / n_dev,
                    **{k: float(v) for k, v in metrics.items()},
                )
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
        if ckpt_mgr is not None:
            ckpt_mgr.save(state, rng, data_step, force=True)
            ckpt_mgr.close()
        metrics_log.close()
    return state
