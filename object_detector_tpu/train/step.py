"""The jitted train step — ONE XLA program per step (SURVEY.md §3.1).

On-device augmentation -> anchor matching (vmap) -> forward -> focal +
smooth-L1 -> grad -> SPMD all-reduce -> optimizer update. Data parallelism
is expressed through jit in_shardings (batch sharded over the 'data' mesh
axis, params replicated); XLA GSPMD inserts the gradient all-reduce over
ICI/DCN — no hand-written collectives (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.losses.detection import detection_loss
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops import matching
from object_detector_tpu.train.state import TrainState, make_optimizer


def encode_batch_targets(
    boxes: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    anchors_center: jnp.ndarray,
    cfg: DetectorConfig,
) -> matching.MatchTargets:
    return jax.vmap(
        lambda b, l, v: matching.match(
            b, l, v, anchors_center, cfg.matcher,
            cfg.anchors.center_variance, cfg.anchors.size_variance,
        )
    )(boxes, labels, valid)


def make_train_step(
    cfg: DetectorConfig,
    model: Any,
    anchors_center: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    augment: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jnp.ndarray], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    batch: image (B,S,S,3) uint8, boxes (B,M,4), labels (B,M), valid (B,M).
    """
    optimizer = make_optimizer(cfg.train)
    anchors_const = jnp.asarray(anchors_center)
    has_batch_stats = cfg.model.backbone == "resnet50" or cfg.model.family == "retinanet"

    def loss_fn(params, batch_stats, batch, rng):
        if augment:
            ex = aug_ops.augment_batch(
                batch["image"], batch["boxes"], batch["labels"], batch["valid"],
                rng, cfg.data.augment, cfg.model.image_size,
            )
            images, boxes, labels, valid = ex.image, ex.boxes, ex.labels, ex.valid
        else:
            images = aug_ops.normalize(batch["image"].astype(jnp.float32) / 255.0)
            boxes, labels, valid = batch["boxes"], batch["labels"], batch["valid"]

        targets = encode_batch_targets(boxes, labels, valid, anchors_const, cfg)

        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            (cls_logits, box_preds), updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            cls_logits, box_preds = model.apply(variables, images, train=True)
            new_stats = batch_stats

        total, metrics = detection_loss(
            cls_logits, box_preds, targets.cls, targets.box,
            use_focal=cfg.train.use_focal,
            focal_alpha=cfg.train.focal_alpha,
            focal_gamma=cfg.train.focal_gamma,
            smooth_l1_beta=cfg.train.smooth_l1_beta,
            box_loss_weight=cfg.train.box_loss_weight,
            negatives_per_positive=cfg.train.negatives_per_positive,
        )
        return total, (metrics, new_stats)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if state.ema_params is not None:
            d = cfg.train.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), state.ema_params, new_params
            )
        else:
            new_ema = None
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.mesh.data_axis))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
