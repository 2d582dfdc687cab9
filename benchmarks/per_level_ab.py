"""Same-session A/B: concatenated (B, A, C) postprocess vs per-level head
consumption (EvalConfig.per_level_heads) on the full uint8->detections
pipeline.

The concat path assembles the (B, A, C) logits (251 MB bf16 at
SSD-512/COCO bs=64) through per-level retiles + a dynamic-update-slice
concat and reads it twice (class-max prefilter, candidate gather) — ~2.8 ms
of HBM traffic in the r3 HLO profile. The per-level path
(postprocess_levels) prefilters each head's native (B, H, W, a*C) output
and gathers candidates with local indices; the concat never exists.
Interleaved ABAB per preset so tunnel drift cancels; detection-set parity
asserted first (the two-stage prefilter is exact — see
pallas_decode_nms_levels).

Usage: python benchmarks/per_level_ab.py [preset[,preset...]] [rounds]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timed
from object_detector_tpu.anchors.priors import anchors_for_model
from object_detector_tpu.core.config import get_config
from object_detector_tpu.models.retinanet import build_model
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess, postprocess_levels
from object_detector_tpu.quant import engine as qengine

DEFAULT_BS = {"ssd300_infer_bs64": 64, "ssd512_resnet50_coco": 64,
              "retinanet_fpn_coco": 32}


def bench_preset(preset: str, rounds: int) -> None:
    cfg = get_config(preset)
    bs = DEFAULT_BS.get(preset, cfg.eval.batch_size)
    s = cfg.model.image_size
    on_tpu = jax.default_backend() == "tpu"
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    if cfg.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg, variables, [calib])
        forward = qengine.retinanet_int8_forward
    else:
        qp, spec = qengine.quantize_ssd(
            cfg, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"),
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    @jax.jit
    def infer_a(q, x_u8):  # concat path
        imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
        cls, box = forward(q, spec, cfg, imgs)
        det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
        return det.boxes, det.scores, det.classes, det.valid

    @jax.jit
    def infer_b(q, x_u8):  # per-level path
        imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
        lvl_cls, lvl_box = forward(q, spec, cfg, imgs, concat_heads=False)
        det = postprocess_levels(lvl_cls, lvl_box, anchors, cfg)
        return det.boxes, det.scores, det.classes, det.valid

    ba, sa, ca, va = (np.asarray(t) for t in infer_a(qp, images[:8]))
    bb, sb, cb, vb = (np.asarray(t) for t in infer_b(qp, images[:8]))
    if cfg.eval.nms_exact_prefilter:
        # Exact prefilter on both arms: detection sets must match.
        match = 0
        for i in range(8):
            set_a = {(int(c), round(float(x), 4), tuple(np.round(b, 4)))
                     for c, x, b in zip(ca[i][va[i]], sa[i][va[i]], ba[i][va[i]])}
            set_b = {(int(c), round(float(x), 4), tuple(np.round(b, 4)))
                     for c, x, b in zip(cb[i][vb[i]], sb[i][vb[i]], bb[i][vb[i]])}
            match += len(set_a & set_b)
            denom = max(len(set_a | set_b), 1)
            assert len(set_a & set_b) / denom > 0.99, (
                f"parity broke: {len(set_a & set_b)}/{denom}"
            )
        print(f"[{preset}] parity: detection sets match", flush=True)
    else:
        # Approx prefilter (approx_max_k) partitions differently per arm —
        # set equality between arms is NOT the contract. Instead compare
        # each arm's top-20 scores against the exact-prefilter concat
        # reference (the same check prefilter_ab.py used).
        exact_cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, nms_exact_prefilter=True)
        )

        @jax.jit
        def infer_ref(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, spec, cfg, imgs)
            det = postprocess(cls, box, anchors, exact_cfg, use_pallas=on_tpu)
            return det.scores

        s_ref = np.asarray(infer_ref(qp, images[:8]))[:, :20]
        dev_a = float(np.max(np.abs(np.sort(sa[:, :20]) - np.sort(s_ref))))
        dev_b = float(np.max(np.abs(np.sort(sb[:, :20]) - np.sort(s_ref))))
        print(
            f"[{preset}] top-20 score deviation vs exact: "
            f"concat={dev_a:.2e} per_level={dev_b:.2e}", flush=True,
        )
        # approx_max_k may drop a borderline candidate (recall contract
        # 0.95/row); a few e-3 of score on a mid-ranked detection is way
        # below mAP resolution. Gate on gross breakage only.
        assert dev_a < 2e-2 and dev_b < 2e-2, "approx recall broke top-20"

    iters = 20
    med_a, med_b = [], []
    for r in range(rounds):
        dt_a = timed(infer_a, qp, images, iters=iters)
        dt_b = timed(infer_b, qp, images, iters=iters)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(
            f"[{preset}] round {r}: concat={bs/dt_a:8.1f}  "
            f"per_level={bs/dt_b:8.1f} img/s",
            flush=True,
        )
    ma, mb = float(np.median(med_a)), float(np.median(med_b))
    print(
        f"[{preset}] median: concat={ma:.1f} per_level={mb:.1f} img/s "
        f"(per_level speedup = {mb/ma:.4f}x)"
    )


def main():
    presets = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["ssd512_resnet50_coco", "retinanet_fpn_coco", "ssd300_infer_bs64"]
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for p in presets:
        bench_preset(p, rounds)


if __name__ == "__main__":
    main()
