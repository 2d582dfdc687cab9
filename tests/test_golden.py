"""Golden-detection regression test (SURVEY.md §4 parity/golden).

A fixed-seed tiny model + fixed synthetic image produce a detection set
that is captured once into tests/fixtures/golden_detections.npz and must
reproduce within tight tolerances forever after. This is the guard against
silent semantic drift in decode/match/NMS refactors (the reference's
detections are unavailable — SURVEY.md §0 — so the framework self-goldens;
when a reference artifact appears, drop its detections into the same
fixture format).

Regenerate intentionally with:
    python -m tests.test_golden --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors.priors import ssd_anchors
from object_detector_tpu.core.config import tiny_test_config
from object_detector_tpu.data.synthetic import make_synthetic_dataset, render_synthetic_image
from object_detector_tpu.models.ssd import SSDModel
from object_detector_tpu.ops import augment as aug_ops
from object_detector_tpu.ops.postprocess import postprocess

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_detections.npz")


def _compute_detections():
    cfg = tiny_test_config()
    model = SSDModel(cfg)
    ds = make_synthetic_dataset(num_images=2, image_size=cfg.model.image_size, seed=7)
    img = render_synthetic_image(ds.records[0], cfg.model.image_size)
    variables = model.init(jax.random.key(123), jnp.zeros((1, 64, 64, 3)), train=False)
    anchors = jnp.asarray(ssd_anchors(cfg.anchors, cfg.model.image_size))

    images = aug_ops.normalize(jnp.asarray(img)[None].astype(jnp.float32) / 255.0)
    cls, box = model.apply(variables, images, train=False)
    det = postprocess(cls, box, anchors, cfg, use_pallas=False)
    return (
        np.asarray(det.boxes[0]),
        np.asarray(det.scores[0]),
        np.asarray(det.classes[0]),
        np.asarray(det.valid[0]),
    )


def test_golden_detections():
    assert os.path.exists(FIXTURE), "golden fixture missing — run --regen"
    golden = np.load(FIXTURE)
    boxes, scores, classes, valid = _compute_detections()
    np.testing.assert_array_equal(valid, golden["valid"])
    np.testing.assert_array_equal(classes[valid], golden["classes"][golden["valid"]])
    np.testing.assert_allclose(scores[valid], golden["scores"][golden["valid"]], atol=1e-4)
    np.testing.assert_allclose(boxes[valid], golden["boxes"][golden["valid"]], atol=1e-4)


if __name__ == "__main__":
    import sys

    # Fixture must be generated on the same backend the suite runs on (CPU)
    # — conftest.py isn't loaded outside pytest, so force it here.
    jax.config.update("jax_platforms", "cpu")

    if "--regen" in sys.argv:
        boxes, scores, classes, valid = _compute_detections()
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, boxes=boxes, scores=scores, classes=classes, valid=valid)
        print(f"wrote {FIXTURE}: {int(valid.sum())} valid detections")
