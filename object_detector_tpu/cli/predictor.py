"""Single-image prediction API (BASELINE entry point #2: predict-on-image).

Loads an image, runs the jitted forward + decode + NMS, returns detections
in original-image pixel coordinates; optionally draws and saves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_tpu.anchors.priors import anchors_for_model
from object_detector_tpu.core.config import DetectorConfig
from object_detector_tpu.eval.evaluator import make_predict_fn
from object_detector_tpu.models.retinanet import build_model


@dataclasses.dataclass
class Detection:
    box: np.ndarray  # (4,) pixel corner coords in the original image
    score: float
    class_id: int  # 0-based
    class_name: str


class Predictor:
    def __init__(
        self,
        cfg: DetectorConfig,
        variables: Any,
        class_names: Optional[Sequence[str]] = None,
        use_pallas: Optional[bool] = None,
        int8: bool = False,
        calibration_images_u8: Optional[np.ndarray] = None,
    ):
        self.cfg = cfg
        self.variables = variables
        self.class_names = list(class_names) if class_names else [
            f"class_{i}" for i in range(cfg.model.num_classes)
        ]
        self.model = build_model(cfg)
        anchors = anchors_for_model(cfg.model.family, cfg.anchors, cfg.model.image_size)
        if int8:
            from object_detector_tpu.eval.evaluator import make_int8_predict_fn

            if calibration_images_u8 is None:
                s = cfg.model.image_size
                calibration_images_u8 = np.random.default_rng(0).integers(
                    0, 255, (8, s, s, 3), dtype=np.uint8
                )
            int8_fn = make_int8_predict_fn(
                cfg, variables, anchors, calibration_images_u8, use_pallas
            )
            self._predict = lambda _v, imgs: int8_fn(imgs)
        else:
            self._predict = make_predict_fn(cfg, self.model, anchors, use_pallas)

    def predict_array(
        self, image_u8: np.ndarray, score_threshold: float = 0.3
    ) -> List[Detection]:
        """image_u8: (H, W, 3) uint8 at any resolution."""
        h, w = image_u8.shape[:2]
        s = self.cfg.model.image_size
        from PIL import Image

        canvas = np.asarray(
            Image.fromarray(image_u8).resize((s, s), Image.BILINEAR), np.uint8
        )
        det = self._predict(self.variables, jnp.asarray(canvas)[None])
        det = jax.device_get(det)
        out: List[Detection] = []
        for box, score, cls, ok in zip(
            det.boxes[0], det.scores[0], det.classes[0], det.valid[0]
        ):
            if not ok or score < score_threshold:
                continue
            pixel_box = np.array(
                [box[0] * w, box[1] * h, box[2] * w, box[3] * h], np.float32
            )
            out.append(
                Detection(
                    box=pixel_box,
                    score=float(score),
                    class_id=int(cls),
                    class_name=self.class_names[int(cls)],
                )
            )
        return out

    def predict_file(
        self,
        image_path: str,
        score_threshold: float = 0.3,
        output_path: Optional[str] = None,
    ) -> List[Detection]:
        from PIL import Image

        image = np.asarray(Image.open(image_path).convert("RGB"), np.uint8)
        dets = self.predict_array(image, score_threshold)
        if output_path:
            draw_detections(image, dets, output_path)
        return dets


def draw_detections(
    image_u8: np.ndarray, detections: List[Detection], output_path: str
) -> None:
    from PIL import Image, ImageDraw

    im = Image.fromarray(image_u8)
    draw = ImageDraw.Draw(im)
    for d in detections:
        x1, y1, x2, y2 = [float(v) for v in d.box]
        draw.rectangle([x1, y1, x2, y2], outline=(255, 64, 64), width=3)
        draw.text((x1 + 2, max(y1 - 12, 0)), f"{d.class_name} {d.score:.2f}", fill=(255, 255, 0))
    im.save(output_path)
