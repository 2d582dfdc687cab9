"""Golden-detection regression test (SURVEY.md §4 parity/golden).

A fixed-seed tiny model + fixed synthetic image produce a detection set
that is captured once into tests/fixtures/golden_detections.npz and must
reproduce within tight tolerances forever after. This is the guard against
silent semantic drift in decode/match/NMS refactors (the reference's
detections are unavailable — SURVEY.md §0 — so the framework self-goldens;
when a reference artifact appears, drop its detections into the same
fixture format).

Two paths are goldened: the jnp oracle postprocess and the Pallas
decode+NMS path (interpret mode on CPU) — the latter is the TPU serving
default, so drift there is what actually ships.

Regenerate intentionally with:
    python -m tests.test_golden --regen
"""

import os

import jax

if __name__ == "__main__":
    # Fixture must be generated on the same backend the suite runs on (CPU).
    # Must happen BEFORE importing the package: downstream imports can
    # initialize the default (TPU) backend, after which the platform is
    # locked and interpret-mode Pallas crawls through the device tunnel.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.data.synthetic import make_synthetic_dataset, render_synthetic_image
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_detections.npz")


def _compute_detections(use_pallas: bool):
    cfg = tiny_test_config()
    model = SSDModel(cfg)
    ds = make_synthetic_dataset(num_images=2, image_size=cfg.model.image_size, seed=7)
    img = render_synthetic_image(ds.records[0], cfg.model.image_size)
    variables = model.init(jax.random.key(123), jnp.zeros((1, 64, 64, 3)), train=False)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))

    images = aug_ops.normalize(jnp.asarray(img)[None].astype(jnp.float32) / 255.0)
    cls, box = model.apply(variables, images, train=False)
    det = postprocess(cls, box, anchors, cfg, use_pallas=use_pallas)
    return (
        np.asarray(det.boxes[0]),
        np.asarray(det.scores[0]),
        np.asarray(det.classes[0]),
        np.asarray(det.valid[0]),
    )


def _check(golden, prefix: str, use_pallas: bool):
    boxes, scores, classes, valid = _compute_detections(use_pallas)
    g_valid = golden[f"{prefix}valid"]
    np.testing.assert_array_equal(valid, g_valid)
    np.testing.assert_array_equal(classes[valid], golden[f"{prefix}classes"][g_valid])
    np.testing.assert_allclose(scores[valid], golden[f"{prefix}scores"][g_valid], atol=1e-4)
    np.testing.assert_allclose(boxes[valid], golden[f"{prefix}boxes"][g_valid], atol=1e-4)


def test_golden_detections():
    assert os.path.exists(FIXTURE), "golden fixture missing — run --regen"
    golden = np.load(FIXTURE)
    _check(golden, "", use_pallas=False)


def test_golden_detections_pallas():
    """Same golden through the Pallas decode+NMS path (interpret on CPU)."""
    assert os.path.exists(FIXTURE), "golden fixture missing — run --regen"
    golden = np.load(FIXTURE)
    _check(golden, "pallas_", use_pallas=True)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        blob = {}
        for prefix, use_pallas in (("", False), ("pallas_", True)):
            boxes, scores, classes, valid = _compute_detections(use_pallas)
            blob[f"{prefix}boxes"] = boxes
            blob[f"{prefix}scores"] = scores
            blob[f"{prefix}classes"] = classes
            blob[f"{prefix}valid"] = valid
            print(f"{prefix or 'jnp_'}path: {int(valid.sum())} valid detections")
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, **blob)
        print(f"wrote {FIXTURE}")
