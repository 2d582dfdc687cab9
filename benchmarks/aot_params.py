"""CPU-subprocess init-value donor for the AOT bench stages (see aot.py).

Runs under the CPU platform (forced via jax.config BEFORE backend init —
env vars are rewritten by this image's sitecustomize) and writes the
seeded init values to an npz. jax's threefry RNG is platform-
deterministic, so these bit-match the on-device init the legacy stages
computed — measurements stay comparable across the switch.

    python benchmarks/aot_params.py latency /tmp/odt_lat_params.npz
    python benchmarks/aot_params.py train32 /tmp/odt_train_state.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main() -> None:
    kind, out_path = sys.argv[1], sys.argv[2]
    if kind == "latency":
        from object_detector_tpu.core.config import get_config
        from object_detector_tpu.models.ssd import SSDModel
        from benchmarks.aot import flatten_to_npz

        cfg = get_config("ssd300_vgg16_voc")
        s = cfg.model.image_size
        model = SSDModel(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, s, s, 3)), train=False
        )
        flatten_to_npz(out_path, variables["params"])
    elif kind == "train32":
        from object_detector_tpu.core.config import get_config
        from object_detector_tpu.train.loop import init_model_state

        cfg = get_config("ssd300_vgg16_voc").override(
            {"train.batch_size": 32}
        )
        _, state = init_model_state(cfg, jax.random.key(0))
        leaves = jax.tree_util.tree_leaves(state)
        np.savez(out_path, **{
            f"leaf{i}": np.asarray(v) for i, v in enumerate(leaves)
        })
    else:
        raise SystemExit(f"unknown kind {kind!r}")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
