"""General same-session A/B of EvalConfig knobs on the full int8
uint8->detections pipeline: A = preset defaults, B = preset with the
given dotted overrides. Interleaved ABAB so tunnel drift cancels; top-20
detection-score agreement is printed (and asserted within --atol unless
--no-parity).

Examples:
    python benchmarks/evalcfg_ab.py ssd512_resnet50_coco eval.nms_exact_prefilter=False
    python benchmarks/evalcfg_ab.py retinanet_fpn_coco eval.int8_logits_bf16=True --atol 3e-3
"""

import argparse
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
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine

DEFAULT_BS = {"ssd300_infer_bs64": 64, "ssd512_resnet50_coco": 64,
              "retinanet_fpn_coco": 32}


def _parse_value(s: str):
    if s in ("True", "False"):
        return s == "True"
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("overrides", nargs="+", help="dotted field=value pairs")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--atol", type=float, default=3e-3)
    ap.add_argument("--no-parity", action="store_true",
                    help="report score agreement but don't assert")
    args = ap.parse_args()

    cfg_a = get_config(args.preset)
    over = {k: _parse_value(v) for k, v in
            (o.split("=", 1) for o in args.overrides)}
    cfg_b = cfg_a.override(over)
    bs = DEFAULT_BS.get(args.preset, cfg_a.eval.batch_size)
    s = cfg_a.model.image_size
    on_tpu = jax.default_backend() == "tpu"

    model = build_model(cfg_a)
    variables = model.init(jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False)
    anchors = jnp.asarray(
        anchors_for_model(cfg_a.model.family, cfg_a.anchors, cfg_a.model.image_size)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8))
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    if cfg_a.model.family == "retinanet":
        qp, spec = qengine.quantize_retinanet(cfg_a, variables, [calib])
        forward = qengine.retinanet_int8_forward
    else:
        qp, spec = qengine.quantize_ssd(
            cfg_a, variables["params"], [calib],
            batch_stats=variables.get("batch_stats"),
        )
        forward = qengine.int8_forward
    qp = jax.device_put(qp)

    def make_infer(cfg):
        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, spec, cfg, imgs)
            det = postprocess(cls, box, anchors, cfg, use_pallas=on_tpu)
            return det.boxes, det.scores, det.classes, det.valid

        return infer

    infer_a, infer_b = make_infer(cfg_a), make_infer(cfg_b)

    sa = np.sort(np.asarray(infer_a(qp, images[:8])[1]).ravel())[::-1][:20]
    sb = np.sort(np.asarray(infer_b(qp, images[:8])[1]).ravel())[::-1][:20]
    dev = float(np.abs(sa - sb).max())
    print(f"top-20 score deviation: {dev:.2e}", flush=True)
    if not args.no_parity:
        np.testing.assert_allclose(sa, sb, atol=args.atol)

    med_a, med_b = [], []
    for r in range(args.rounds):
        dt_a = timed(infer_a, qp, images, iters=args.iters)
        dt_b = timed(infer_b, qp, images, iters=args.iters)
        med_a.append(bs / dt_a)
        med_b.append(bs / dt_b)
        print(f"round {r}: A={bs/dt_a:8.1f}  B={bs/dt_b:8.1f} img/s", flush=True)
    ma, mb = float(np.median(med_a)), float(np.median(med_b))
    print(f"median: A={ma:.1f} B={mb:.1f} img/s (B speedup = {mb/ma:.4f}x)  "
          f"[B: {over}]")


if __name__ == "__main__":
    main()
