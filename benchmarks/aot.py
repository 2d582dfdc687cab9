"""AOT-exported bench programs: sidestep the axon per-op tracing chatter.

Measured r5 (benchmarks/latency_probe.py, chip logs lat_probe_r5.log):
under the axon platform, *tracing/lowering* of the first big program
blocks ~611 s at ~0% local CPU (main thread on a futex, tokio tunnel
worker in ep_poll) — thousands of per-op remote round-trips at the
~28 ms tunnel RTT — while the identical `.lower()` on the CPU platform
takes 0.4 s, and compiles themselves are ~10 s warm from the committed
cache. This chatter, not compile time, is what blew the latency stage's
600 s cap in the r4 and r5 driver sessions (p50 null four rounds
running).

Fix: serving/train programs are exported ONCE from a CPU-platform
process (`jax.export` with platforms=["tpu"] — cross-platform lowering,
Mosaic kernels serialize inside; 1.5 s per program) and committed under
benchmarks/aot/. Bench stages deserialize (+jit of the spliced artifact,
O(1) tracing) and run — no per-op chatter, compile warm from
benchmarks/xla_cache.

Param VALUES come from a CPU-subprocess init (aot_params.py): jax's
threefry RNG is platform-deterministic, so CPU init bit-matches the
on-device init the stages used before — measurements stay comparable.

Artifacts are environment-tied (jax version, custom-call stability); any
load/call failure falls back to the legacy jit path (callers catch).
"""

from __future__ import annotations

import os

AOT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "aot")


def artifact_path(name: str) -> str:
    return os.path.join(AOT_DIR, f"{name}.jaxexp")


def have(name: str) -> bool:
    return os.path.exists(artifact_path(name))


def save(name: str, blob: bytes) -> str:
    os.makedirs(AOT_DIR, exist_ok=True)
    p = artifact_path(name)
    with open(p, "wb") as f:
        f.write(blob)
    return p


def load(name: str):
    """Deserialize a committed artifact -> jax.export.Exported."""
    import jax

    with open(artifact_path(name), "rb") as f:
        return jax.export.deserialize(f.read())


def flatten_to_npz(path: str, tree) -> None:
    """Save a pytree of arrays as npz keyed by '/'-joined key path."""
    import numpy as np
    import jax

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def nested_from_npz(path: str) -> dict:
    """Rebuild the nested-dict pytree flatten_to_npz wrote (keys have no
    '/' of their own, so splitting is unambiguous)."""
    import numpy as np

    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def unflatten_from_npz(path: str, treedef_like):
    """Rebuild a pytree shaped like `treedef_like` from an npz."""
    import numpy as np
    import jax

    data = np.load(path)
    paths = jax.tree_util.tree_flatten_with_path(treedef_like)[0]
    leaves = []
    for kp, _ in paths:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        leaves.append(data[key])
    treedef = jax.tree_util.tree_structure(treedef_like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latency_bf16_fn_and_avals():
    """(jit fn, abstract args) for the bs=1 bf16 serving program.

    Must run under the CPU platform (exporter / shape donor); the
    function is the EXACT latency_bench infer_f (anchors baked in).
    """
    import jax
    import jax.numpy as jnp

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.models.ssd import SSDModel
    from object_detector_tpu.ops import augment as aug_ops
    from object_detector_tpu.ops.postprocess import postprocess

    cfg = get_config("ssd300_vgg16_voc")
    s = cfg.model.image_size
    model = SSDModel(cfg)
    anchors_np = ssd_anchors(cfg.anchors, s)

    var_struct = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, s, s, 3)), train=False),
        jax.random.key(0),
    )

    @jax.jit
    def infer_f(p, x):
        anchors = jnp.asarray(anchors_np)
        images = aug_ops.normalize(x.astype(jnp.float32) / 255.0)
        cls, box = model.apply({"params": p}, images, train=False)
        det = postprocess(cls, box, anchors, cfg, use_pallas=True)
        return det.boxes, det.scores, det.classes, det.valid

    image_aval = jax.ShapeDtypeStruct((1, s, s, 3), jnp.uint8)
    return infer_f, (var_struct["params"], image_aval)


def train32_flat_fn_and_avals():
    """(jit fn over FLAT leaves, flat abstract args, n_state) for the bs=32
    SSD-300 train step.

    Flat-leaf calling convention because jax.export cannot serialize the
    optax namedtuple pytree types inside TrainState; both sides rebuild
    the tree structure locally (tree_flatten of a numpy-leaf template —
    no device work). Inputs: state leaves + batch leaves + raw uint32 key
    data; outputs: new state leaves + metric leaves. State leaves are
    donated.
    """
    import jax
    import jax.numpy as jnp

    step_fn, (state_struct, batch_avals, _) = train32_fn_and_avals()
    s_leaves, s_def = jax.tree_util.tree_flatten(state_struct)
    b_leaves, b_def = jax.tree_util.tree_flatten(batch_avals)
    n_state, n_batch = len(s_leaves), len(b_leaves)

    def step_flat(*leaves):
        state = jax.tree_util.tree_unflatten(s_def, leaves[:n_state])
        batch = jax.tree_util.tree_unflatten(
            b_def, leaves[n_state:n_state + n_batch]
        )
        key = jax.random.wrap_key_data(leaves[-1])
        new_state, metrics = step_fn.__wrapped__(state, batch, key)
        m_leaves = jax.tree_util.tree_leaves(metrics)
        return tuple(jax.tree_util.tree_leaves(new_state)) + tuple(m_leaves)

    jit_flat = jax.jit(step_flat, donate_argnums=tuple(range(n_state)))
    key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jit_flat, tuple(s_leaves) + tuple(b_leaves) + (key_aval,), n_state


def train32_fn_and_avals():
    """(jit fn, abstract args) for the bs=32 SSD-300 train step."""
    import jax
    import jax.numpy as jnp

    from object_detector_tpu.anchors.priors import ssd_anchors
    from object_detector_tpu.core.config import get_config
    from object_detector_tpu.train.loop import init_model_state
    from object_detector_tpu.train.step import make_train_step

    cfg = get_config("ssd300_vgg16_voc").override({"train.batch_size": 32})
    s, m = cfg.model.image_size, cfg.data.max_boxes
    bs = 32

    def _init(k):
        _, st = init_model_state(cfg, k)
        return st

    state_struct = jax.eval_shape(_init, jax.random.key(0))
    # make_train_step needs the live model module (structure only).
    from object_detector_tpu.models.retinanet import build_model

    model = build_model(cfg)
    step_fn = make_train_step(
        cfg, model, ssd_anchors(cfg.anchors, s), mesh=None, augment=True
    )
    batch_avals = {
        "image": jax.ShapeDtypeStruct((bs, s, s, 3), jnp.uint8),
        "boxes": jax.ShapeDtypeStruct((bs, m, 4), jnp.float32),
        "labels": jax.ShapeDtypeStruct((bs, m), jnp.int32),
        "valid": jax.ShapeDtypeStruct((bs, m), jnp.bool_),
    }
    key_aval = jax.eval_shape(lambda: jax.random.key(1))
    return step_fn, (state_struct, batch_avals, key_aval)
