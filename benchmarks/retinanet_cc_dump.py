"""Identify the 2.95 ms anonymous [custom-call] in hlo_retinanet.log.

The r4 prefilter micro A/B (chip_logs/prefilter_micro_r4.log) showed the
approx_max_k PartialReduce costs only 0.2-0.6 ms isolated at the
production shape, so the 2.95 ms custom-call in the in-program profile
must be something else. This compiles the EXACT headline int8 RetinaNet
program (mirrors headline._bench_int8) and prints every custom_call /
sort / fusion-of-interest instruction from the optimized HLO with its
operand/result shapes, so the cost can be attributed by name.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from object_detector_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

import benchmarks.headline as h
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess
from object_detector_tpu.quant import engine as qengine


def main(bs: int = 64) -> None:
    # bs defaults to 64 — the headline row flipped there in r4
    # (chip_logs/retinanet_bs64_ab.log); keep the dumped program == the
    # headline program (ADVICE r4 #4).
    cfg, model, variables, anchors, images = h._setup("retinanet_fpn_coco", bs)
    calib = aug_ops.normalize(images[:8].astype(jnp.float32) / 255.0)
    qp, spec = qengine.quantize_retinanet(cfg, variables, [calib])
    forward = qengine.retinanet_int8_forward
    qp = jax.device_put(qp)

    # Mirror headline._bench_int8's postprocess-path selection exactly so
    # the dump stays the headline program even if per_level_heads flips.
    per_level = cfg.eval.per_level_heads and "fpn/lateral3" in qp.w_int8
    if per_level:
        from object_detector_tpu.ops.postprocess import postprocess_levels

        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            lvl_cls, lvl_box = forward(q, spec, cfg, imgs, concat_heads=False)
            det = postprocess_levels(lvl_cls, lvl_box, anchors, cfg)
            return det.boxes, det.scores, det.classes, det.valid

    else:
        @jax.jit
        def infer(q, x_u8):
            imgs = aug_ops.normalize(x_u8.astype(jnp.float32) / 255.0)
            cls, box = forward(q, spec, cfg, imgs)
            det = postprocess(cls, box, anchors, cfg, use_pallas=True)
            return det.boxes, det.scores, det.classes, det.valid

    print(f"program: retinanet_fpn_coco bs={bs} per_level={per_level}")
    txt = infer.lower(qp, images).compile().as_text()
    pat = re.compile(r"custom_call_target=\"([^\"]+)\"")
    for line in txt.splitlines():
        if "custom-call" in line or "custom_call" in line:
            m = pat.search(line)
            tgt = m.group(1) if m else "?"
            head = line.strip().split(" = ")
            name = head[0].strip()
            shape = head[1].split(" custom-call")[0] if len(head) > 1 else ""
            print(f"{name:40s} target={tgt:30s} {shape[:120]}")
    n_sort = txt.count(" sort(")
    print(f"\n(sort instruction count: {n_sort})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
