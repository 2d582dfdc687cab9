"""Host-side input pipeline: decode cache -> batches -> async device_put.

Design (SURVEY.md §3.1 rebuild stack): the host does exactly one job —
deliver fixed-size uint8 image canvases plus padded annotations to HBM.
Everything after (photometric/geometric augmentation, normalization,
matching) happens inside the jitted train step on device.

- Images are decoded once (multi-process pool) and cached as a single
  (N, S, S, 3) uint8 array (VOC-trainval at 300² ≈ 1.3 GB — SURVEY.md §7
  hard part #5), aspect-preserving-free plain resize to the canvas.
- Batches are gathered by fancy-indexing the cache (zero decode on the hot
  path) and shipped with `jax.device_put` under a double-buffered prefetch
  so the transfer overlaps the previous step's compute.
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
import os
import queue
import tempfile
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from object_detector_tpu.data.types import Dataset, pad_annotations


def _decode_resize(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        # draft() lets libjpeg decode at reduced DCT scale — much cheaper
        # than full decode + resize for large photos.
        im.draft("RGB", (size, size))
        im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


class DecodedCache:
    """All-images uint8 cache: (N, S, S, 3) + padded annotations.

    For COCO-scale datasets the image array no longer fits in host RAM
    (train2017 at 512² ≈ 93 GB), so when its size exceeds
    `max_ram_bytes` the cache spills to a disk-backed `np.memmap`
    (`spill_dir`, default: alongside `cache_path` or a temp dir).
    `gather` fancy-indexing is unchanged — reads ride the OS page cache,
    so hot batches cost RAM only up to the page-cache budget, and a
    completed spill file is reused across runs (annotations are cheap to
    rebuild; only pixels are memmapped).
    """

    def __init__(
        self,
        dataset: Dataset,
        image_size: int,
        max_boxes: int = 100,
        num_workers: int = 4,
        cache_path: Optional[str] = None,
        max_ram_bytes: Optional[int] = None,
        spill_dir: Optional[str] = None,
    ):
        self.dataset = dataset
        self.image_size = image_size
        n = len(dataset)
        img_shape = (n, image_size, image_size, 3)
        self.boxes = np.zeros((n, max_boxes, 4), np.float32)
        self.labels = np.zeros((n, max_boxes), np.int32)
        self.valid = np.zeros((n, max_boxes), bool)

        self.memmap_path: Optional[str] = None
        spill = (
            max_ram_bytes is not None
            and int(np.prod(img_shape)) > max_ram_bytes
        )
        reuse_memmap = False
        if spill:
            if spill_dir is None:
                spill_dir = (
                    os.path.dirname(os.path.abspath(cache_path))
                    if cache_path
                    else tempfile.mkdtemp(prefix="odt_cache_")
                )
            os.makedirs(spill_dir, exist_ok=True)
            # The filename must pin dataset IDENTITY, not just (n, size):
            # train/eval splits of equal length sharing one spill_dir must
            # not silently reuse each other's pixels (ADVICE r2).
            import hashlib

            ident = hashlib.md5(
                "\n".join(
                    [dataset.name]
                    + [r.path or r.image_id for r in dataset.records]
                ).encode()
            ).hexdigest()[:12]
            self.memmap_path = os.path.join(
                spill_dir, f"images_{ident}_{n}x{image_size}.npy"
            )
            marker = self.memmap_path + ".complete"
            if os.path.exists(self.memmap_path) and os.path.exists(marker):
                self.images = np.lib.format.open_memmap(
                    self.memmap_path, mode="r"
                )
                reuse_memmap = self.images.shape == img_shape
                if not reuse_memmap:
                    self.images = np.lib.format.open_memmap(
                        self.memmap_path, mode="w+",
                        dtype=np.uint8, shape=img_shape,
                    )
            else:
                self.images = np.lib.format.open_memmap(
                    self.memmap_path, mode="w+", dtype=np.uint8, shape=img_shape
                )
        else:
            self.images = np.zeros(img_shape, np.uint8)

        if reuse_memmap:
            # Pixels are on disk already; only rebuild the (small) host-RAM
            # annotation arrays from the dataset records.
            for i, rec in enumerate(dataset.records):
                b, l, v = pad_annotations(rec, max_boxes)
                self.boxes[i], self.labels[i], self.valid[i] = b, l, v
            return

        if not spill and cache_path and os.path.exists(cache_path):
            blob = np.load(cache_path)
            self.images, self.boxes = blob["images"], blob["boxes"]
            self.labels, self.valid = blob["labels"], blob["valid"]
            return

        # Fast path: native C++ decode pool for file-backed records. Files
        # the native decoder rejects (corrupt, CMYK, non-JPEG) fall through
        # to the PIL path below instead of entering the cache as black.
        # Chunked so the temporary decode buffer stays bounded (~0.75 GB at
        # 512²) regardless of dataset size — required for the memmap path.
        jpeg_idx = [i for i, r in enumerate(dataset.records) if r.path]
        jpeg_done = set()
        native_ok = bool(jpeg_idx)
        chunk = 1024
        for lo in range(0, len(jpeg_idx), chunk):
            idx_chunk = jpeg_idx[lo : lo + chunk]
            from object_detector_tpu.data import native_decode

            decoded = native_decode.decode_batch(
                [dataset.records[i].path for i in idx_chunk],
                image_size,
                num_threads=max(1, num_workers),
            )
            if decoded is None:
                native_ok = False
                break  # native lib unavailable — PIL handles everything
            images, ok = decoded
            self.images[np.asarray(idx_chunk)] = images
            for slot, i in enumerate(idx_chunk):
                if not ok[slot]:
                    continue  # retried via PIL below
                b, l, v = pad_annotations(dataset.records[i], max_boxes)
                self.boxes[i], self.labels[i], self.valid[i] = b, l, v
                jpeg_done.add(i)
        if native_ok and len(jpeg_done) < len(jpeg_idx):
            import logging

            logging.getLogger("object_detector_tpu").warning(
                "native JPEG decode failed for %d/%d files; "
                "re-decoding via PIL",
                len(jpeg_idx) - len(jpeg_done), len(jpeg_idx),
            )

        def fill(i: int) -> None:
            rec = dataset.records[i]
            if rec.path:
                try:
                    self.images[i] = _decode_resize(rec.path, image_size)
                except Exception as exc:  # undecodable even by PIL
                    import logging

                    logging.getLogger("object_detector_tpu").warning(
                        "undecodable image %s (%s); using zeros", rec.path, exc
                    )
            else:  # synthetic record — render procedurally
                from object_detector_tpu.data.synthetic import render_synthetic_image

                self.images[i] = render_synthetic_image(rec, image_size)
            b, l, v = pad_annotations(rec, max_boxes)
            self.boxes[i], self.labels[i], self.valid[i] = b, l, v

        todo = [i for i in range(n) if i not in jpeg_done]
        workers = max(1, num_workers)
        if workers == 1 or len(todo) < 8:
            for i in todo:
                fill(i)
        else:
            with futures.ThreadPoolExecutor(workers) as pool:
                list(pool.map(fill, todo))

        if self.memmap_path is not None:
            self.images.flush()
            with open(self.memmap_path + ".complete", "w") as f:
                f.write("ok\n")
            # Reopen read-only: training must never dirty cache pages
            # (dirty pages pin RAM until writeback; clean ones are
            # evictable for free).
            self.images = np.lib.format.open_memmap(self.memmap_path, mode="r")
        elif cache_path:
            np.savez(
                cache_path,
                images=self.images,
                boxes=self.boxes,
                labels=self.labels,
                valid=self.valid,
            )

    def __len__(self) -> int:
        return len(self.dataset)

    def gather(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "image": self.images[idx],
            "boxes": self.boxes[idx],
            "labels": self.labels[idx],
            "valid": self.valid[idx],
        }


def epoch_batches(
    cache: DecodedCache,
    batch_size: int,
    seed: int,
    shuffle: bool = True,
    drop_remainder: bool = True,
    start_step: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Deterministic, resumable index-shuffled batch stream.

    `start_step` skips already-consumed batches after checkpoint resume
    (dataset cursor is part of the checkpoint, SURVEY.md §5).
    """
    n = len(cache)
    steps_per_epoch = n // batch_size if drop_remainder else -(-n // batch_size)
    # Validate EAGERLY (this is a plain function returning a generator, not a
    # generator function): a raise inside the generator body would fire on
    # first next() inside the prefetcher thread and surface as a bare
    # StopIteration, hiding this message.
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {n} images yields zero batches at batch_size="
            f"{batch_size} with drop_remainder — reduce the batch size"
        )

    def generate():
        step = start_step
        while True:
            epoch = step // steps_per_epoch
            rng = np.random.default_rng(seed + epoch)
            order = rng.permutation(n) if shuffle else np.arange(n)
            for b in range(step % steps_per_epoch, steps_per_epoch):
                idx = order[b * batch_size : (b + 1) * batch_size]
                if len(idx) < batch_size and drop_remainder:
                    break
                yield cache.gather(idx)
                step += 1

    return generate()


class DevicePrefetcher:
    """Background thread pushing host batches to device N steps ahead.

    `place` is any host->device function (e.g. a sharded jax.device_put);
    the separation keeps this module import-safe without jax.
    """

    def __init__(self, iterator: Iterator, place, depth: int = 2):
        self._iter = iterator
        self._place = place
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for batch in self._iter:
                self._q.put(self._place(batch))
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item
