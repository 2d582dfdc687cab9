"""Pallas per-class NMS kernel (BASELINE north-star: on-chip decode-to-
detections; SURVEY.md §7 step 6).

Design (TPU-first; v2 after profiling on real v5e):
- XLA does what it is best at outside the kernel: per-class `top_k`
  candidate selection and the final cross-class merge.
- The kernel owns the sequential greedy suppression. Every (image, class)
  pair is one independent NMS problem; all of them are packed as ROWS of a
  (rows, k) tile so each sequential greedy step is dense VPU work across
  the whole batch (sublane axis) instead of a scalar loop. A grid over row
  chunks bounds VMEM.
- Greedy semantics via argmax-emit: each iteration keeps the highest
  remaining score per row, reconstructs winner coordinates by masked
  row-reduction (no dynamic gathers), computes winner-vs-all IoU on the
  fly, and suppresses. `max_out` iterations (the per-class cap) — greedy
  NMS truncated at max_out keeps exactly the first max_out survivors.
- VPU work per sequential step: ~20 elementwise/reduce ops on
  (ROW_CHUNK, k) f32 — lanes and sublanes saturated; working set
  (6 coordinate/score planes) stays VMEM-resident across all iterations.

Interpret mode runs on CPU for tests; compiled mode on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from object_detector_tpu.ops.nms import Detections

Array = jnp.ndarray

_LANE = 128
# Rows (image*class problems) per grid step. 256 measured best at M=512
# (512-row blocks were a wash — VMEM double-buffering pressure).
_ROW_CHUNK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _check_score_threshold(score_threshold: float) -> None:
    """The kernels require score_threshold >= 0: suppression rewrites a
    loser's score to 0.0 and the dead-row early-exit treats max==0 rows as
    inactive, which is only equivalent to `valid & ~suppressed` masking
    when 0.0 can never re-clear the threshold (ADVICE r3). Enforced at
    trace time (the threshold is a static argument) in every public entry
    point rather than assumed."""
    if score_threshold < 0:
        raise ValueError(
            f"score_threshold must be >= 0 (got {score_threshold}): the NMS "
            "kernel uses 0.0 as the suppressed/padded-score sentinel"
        )


def _nms_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,  # (R, k) each
    out_scores_ref,  # (R, max_out) winner scores, in emit order (desc)
    out_cols_ref,  # (R, max_out) winner candidate columns (s32)
    *,
    k: int,
    rows: int,
    max_out: int,
    iou_threshold: float,
    score_threshold: float,
):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    cdt = x1.dtype  # coordinate-plane dtype (f32, or bf16 via coord_bf16)
    area = jnp.maximum(x2 - x1, cdt.type(0)) * jnp.maximum(
        y2 - y1, cdt.type(0)
    )  # (R, k)
    # Union-free suppression test (exact rearrangement, saves two plane
    # ops per emit):  inter > t*(w_area + area - inter)
    #            <=>  inter > t/(1+t) * (w_area + area)
    # so t/(1+t)*area is hoisted out of the emit loop entirely.
    t_ratio = cdt.type(iou_threshold / (1.0 + iou_threshold))
    area_scaled = area * t_ratio  # (R, k), hoisted
    scores = scores_ref[:]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, max_out), 1)

    def emit(j, carry):
        remaining, acc_s, acc_c, _ = carry
        s = jnp.max(remaining, axis=1, keepdims=True)  # (R, 1)
        idx = jnp.argmax(remaining, axis=1).reshape(rows, 1)  # (R, 1)
        valid = s > score_threshold  # (R, 1) bool
        # Activity flag for the NEXT iteration from this iteration's
        # per-row maxima — a (R, 1) reduce instead of the full (R, k)
        # plane max the old early-exit recomputed every step. A row that
        # emits its last candidate at step j keeps the flag up for j+1
        # (whose s is then 0): at most one spare iteration, never a
        # skipped live one.
        next_active = jnp.max(s) > score_threshold
        onehot = col_ids == idx  # (R, k) bool
        # Compact emit: slot j of the survivor list takes this winner's
        # (score, column) — lane-select into loop-carried accumulators
        # (Mosaic cannot store at a dynamic lane index). The merge then
        # sorts C*max_out entries per image instead of C*k (5x smaller
        # at the default config).
        hit = (out_iota == j) & valid  # (R, max_out)
        acc_s = jnp.where(hit, s, acc_s)
        acc_c = jnp.where(hit, idx, acc_c)
        # Winner coordinates per row via masked reduce (dynamic lane
        # gathers don't lower in Mosaic for these shapes); the winner's
        # area follows from its corners. select+max instead of
        # cast+mul+sum: coordinates are clipped to [0, 1] upstream
        # (box_ops.decode(clip=True)), so 0 is a safe mask identity and
        # the onehot->dtype cast plane op disappears.
        zero = cdt.type(0)
        wx1 = jnp.max(jnp.where(onehot, x1, zero), axis=1, keepdims=True)
        wy1 = jnp.max(jnp.where(onehot, y1, zero), axis=1, keepdims=True)
        wx2 = jnp.max(jnp.where(onehot, x2, zero), axis=1, keepdims=True)
        wy2 = jnp.max(jnp.where(onehot, y2, zero), axis=1, keepdims=True)
        w_area = jnp.maximum(wx2 - wx1, cdt.type(0)) * jnp.maximum(
            wy2 - wy1, cdt.type(0)
        )
        # Winner-vs-all IoU, rows independent; suppression in boolean
        # masks.
        # One clamp, not two: inter = max(iw, 0) * ih is sign-safe — if
        # ih < 0 the product is <= 0 and rhs >= 0, so the suppression
        # compare is false either way (the double-clamp spent an extra
        # (R, k) plane to make inter exactly 0 there).
        iw = jnp.maximum(
            jnp.minimum(wx2, x2) - jnp.maximum(wx1, x1), cdt.type(0)
        )
        ih = jnp.minimum(wy2, y2) - jnp.maximum(wy1, y1)
        inter = iw * ih
        lhs, rhs = inter, area_scaled + w_area * t_ratio
        if cdt == jnp.bfloat16:
            # Mosaic on v5e rejects bf16 vector cmpf ("Target does not
            # support this comparison"): arithmetic stays bf16, the one
            # compare per emit upcasts to f32.
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        # No `valid &` on the full-width mask: when a row is below the
        # score threshold its whole `remaining` is already below it, so
        # the spurious zeroing can never change what later emits see (the
        # per-slot `hit` stays valid-gated — dead rows emit nothing).
        suppress = onehot | (lhs > rhs)
        return jnp.where(suppress, 0.0, remaining), acc_s, acc_c, next_active

    def body(j, carry):
        # Early-exit shortcut: once every row's candidates fall below the
        # score threshold, remaining iterations cost one scalar compare
        # (accumulators start zeroed, so skipped slots are empty). The
        # flag is carried from the previous emit's per-row maxima — see
        # next_active in emit().
        return jax.lax.cond(
            carry[3], lambda c: emit(j, c), lambda c: c, carry
        )

    _, out_s, out_c, _ = jax.lax.fori_loop(
        0,
        max_out,
        body,
        (
            scores,
            jnp.zeros((rows, max_out), jnp.float32),
            jnp.zeros((rows, max_out), jnp.int32),
            jnp.max(scores) > score_threshold,
        ),
    )
    out_scores_ref[:] = out_s
    out_cols_ref[:] = out_c


def _merge_survivors(
    kept_s: Array,  # (B*C, n_out) survivor scores
    kept_c: Array,  # (B*C, n_out) survivor candidate columns
    cand_boxes: Array,  # (B, M, 4)
    batch: int,
    num_classes: int,
    n_out: int,
    max_detections: int,
    packed_sort: bool = False,
) -> Detections:
    """Cross-class merge per image over COMPACT survivor lists (C * n_out
    entries vs C * M candidates — 5x smaller sort at the default config).

    packed_sort: single-key int32 sort instead of the variadic
    (score, iota) top_k; output scores stay exact (gathered through the
    selected indices) — see ops/packsort.py for the tie contract."""
    total = num_classes * n_out
    flat_scores = kept_s.reshape(batch, total)
    flat_cols = kept_c.reshape(batch, total)
    if total < max_detections:  # tiny configs: pad with empty slots
        flat_scores = jnp.pad(flat_scores, ((0, 0), (0, max_detections - total)))
        flat_cols = jnp.pad(flat_cols, ((0, 0), (0, max_detections - total)))
    if packed_sort:
        from object_detector_tpu.ops.packsort import top_k_packed_idx

        merged_idx = top_k_packed_idx(flat_scores, max_detections)
        merged_scores = jnp.take_along_axis(flat_scores, merged_idx, axis=1)
    else:
        merged_scores, merged_idx = jax.lax.top_k(flat_scores, max_detections)
    anchor_idx = jnp.take_along_axis(flat_cols, merged_idx, axis=1)
    out_boxes = jnp.take_along_axis(cand_boxes, anchor_idx[..., None], axis=1)
    out_classes = jnp.minimum(merged_idx // n_out, num_classes - 1).astype(
        jnp.int32
    )
    valid = merged_scores > 0.0
    return Detections(
        boxes=out_boxes, scores=merged_scores, classes=out_classes, valid=valid
    )


def _rows_nms_merge(
    cand_boxes: Array,  # (B, m) planes via (B, m, 4)
    cand_scores_rows: Array,  # (R, m) f32, R = B*C
    batch: int,
    num_classes: int,
    m_eff: int,
    *,
    class_top_k: int,
    max_per_class: int,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
    interpret: bool,
    exact_prefilter: bool,
    recall_target: float,
    packed_sort: bool,
    coord_bf16: bool = False,
) -> Detections:
    """Shared tail of both NMS entry points: optional PER-CLASS candidate
    narrowing, the suppression kernel, and the cross-class merge.

    class_top_k > 0 keeps only the top class_top_k candidates of each
    (image, class) row before suppression — the documented
    `pre_nms_top_k` per-class contract (ops/nms.py:67 does exactly this
    truncation), and the kernel's per-emit VPU cost is linear in row
    width, so narrowing 512 -> 256 lanes halves suppression time. Exact
    per-row `lax.top_k` selection by default; `approx_max_k` when
    exact_prefilter=False (same contract as the anchor prefilter)."""
    rows, m = cand_scores_rows.shape
    nidx = None
    if class_top_k and _round_up(min(class_top_k, m_eff), _LANE) < m:
        k2 = _round_up(min(class_top_k, m_eff), _LANE)
        if interpret or exact_prefilter:
            row_scores, nidx = jax.lax.top_k(cand_scores_rows, k2)
        else:
            row_scores, nidx = jax.lax.approx_max_k(
                cand_scores_rows, k2, recall_target=recall_target
            )
        # Row coords: gather the narrowed columns out of the per-image
        # plane (the broadcast over classes folds into the gather).
        coords = jnp.take_along_axis(
            jnp.broadcast_to(
                jnp.transpose(cand_boxes, (2, 0, 1))[:, :, None, :],
                (4, batch, num_classes, m),
            ).reshape(4, rows, m),
            nidx[None],
            axis=2,
        )
    else:
        row_scores = cand_scores_rows
        coords = jnp.broadcast_to(
            jnp.transpose(cand_boxes, (2, 0, 1))[:, :, None, :],
            (4, batch, num_classes, m),
        ).reshape(4, rows, m)

    n_out = min(max_per_class, max_detections, row_scores.shape[1])
    kept_s, kept_c = _nms_rows(
        coords.astype(jnp.bfloat16) if coord_bf16 else coords,
        row_scores.astype(jnp.float32),
        max_out=n_out,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        interpret=interpret,
    )
    if nidx is not None:
        # Kernel columns index the narrowed row; translate back to
        # candidate columns for the merge's box lookup.
        kept_c = jnp.take_along_axis(nidx, kept_c, axis=1)

    return _merge_survivors(
        kept_s, kept_c, cand_boxes, batch, num_classes, n_out, max_detections,
        packed_sort=packed_sort,
    )


def _nms_rows(
    coords: Array,  # (4, R, k) x1/y1/x2/y2 planes
    scores: Array,  # (R, k) sorted desc per row
    *,
    max_out: int,
    iou_threshold: float,
    score_threshold: float,
    interpret: bool,
    sort_rows: bool = False,
) -> tuple[Array, Array]:
    """Run the kernel over all rows; returns per-row survivors in emit
    (descending-score) order: (scores (R, max_out) f32, candidate columns
    (R, max_out) s32). Empty slots have score 0.

    sort_rows groups rows by activity (candidates above threshold,
    descending) before chunking, so dead rows concentrate into chunks the
    kernel's early-exit skips. EXACT (rows independent; outputs are
    inverse-permuted) but MEASURED SLOWER — default off. v5e A/B
    (benchmarks/nms_rowsort_ab.py, R=1280, k=512, max_out=100): dense
    profile 1.632 -> 1.719 ms, sparse trained-like 1.014 -> 1.102 ms.
    The permute gathers cost ~0.09 ms while the in-kernel early exit
    already captures the sparse win without reordering: a chunk's cost
    tracks its hottest row's candidate count, and spreading hot rows
    across chunks costs the same total iterations as concentrating them
    when the grid is sequential."""
    total_rows, k = scores.shape
    perm = None
    if sort_rows and total_rows > _ROW_CHUNK:
        activity = jnp.sum(scores > score_threshold, axis=1)  # (R,)
        perm = jnp.argsort(-activity)
        inv_perm = jnp.argsort(perm)
        coords = jnp.take(coords, perm, axis=1)
        scores = jnp.take(scores, perm, axis=0)
    chunk = min(_ROW_CHUNK, total_rows)
    pad_rows = _round_up(total_rows, chunk) - total_rows
    if pad_rows:
        coords = jnp.pad(coords, ((0, 0), (0, pad_rows), (0, 0)))
        scores = jnp.pad(scores, ((0, pad_rows), (0, 0)))
    grid = (scores.shape[0] // chunk,)

    kernel = functools.partial(
        _nms_kernel,
        k=k,
        rows=chunk,
        max_out=max_out,
        iou_threshold=float(iou_threshold),
        score_threshold=float(score_threshold),
    )
    plane = lambda i: pl.BlockSpec(  # noqa: E731
        (chunk, k), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (chunk, max_out), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    kept_s, kept_c = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane(0), plane(1), plane(2), plane(3), plane(4)],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((scores.shape[0], max_out), jnp.float32),
            jax.ShapeDtypeStruct((scores.shape[0], max_out), jnp.int32),
        ),
        interpret=interpret,
    )(coords[0], coords[1], coords[2], coords[3], scores)
    if pad_rows:
        kept_s, kept_c = kept_s[:total_rows], kept_c[:total_rows]
    if perm is not None:
        kept_s = jnp.take(kept_s, inv_perm, axis=0)
        kept_c = jnp.take(kept_c, inv_perm, axis=0)
    return kept_s, kept_c


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_threshold", "iou_threshold", "pre_nms_top_k", "max_detections",
        "max_per_class", "interpret", "exact_prefilter", "recall_target",
        "packed_sort", "class_top_k", "coord_bf16",
    ),
)
def pallas_per_class_nms_batched(
    boxes: Array,  # (B, A, 4) decoded corner boxes
    scores: Array,  # (B, A, C)
    *,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    pre_nms_top_k: int = 400,
    max_detections: int = 200,
    max_per_class: int = 100,
    interpret: bool | None = None,
    exact_prefilter: bool = False,
    recall_target: float = 0.95,
    packed_sort: bool = False,
    class_top_k: int = 0,
    coord_bf16: bool = False,
) -> Detections:
    """Batched per-class NMS. All B*C (image, class) problems become kernel
    rows — one pallas_call for the whole batch (do NOT vmap this; the batch
    dim is already folded into rows).

    Boxes are corner-form with NON-NEGATIVE coordinates (the decode path
    clips to [0, 1]); the kernel's winner-coordinate extraction relies on
    0 being a masking identity.

    Candidate selection is CLASS-AGNOSTIC: SSD boxes are shared across
    classes, so the top M anchors by max-class score are selected once per
    image and their coordinates broadcast to every class row — this removes
    the per-(image, class) box gather that dominated the v3 profile
    (11.7 ms of a 14 ms NMS). M = 2 * pre_nms_top_k.

    Approximation contract (honest version — ADVICE r1): when M < A the
    result can differ from exact per-class NMS in two ways: (1) the
    class-agnostic prefilter ranks anchors by max-class score, so a class
    can lose low-ranked candidates to other classes' high scorers; (2) on
    TPU the default prefilter is `approx_max_k(recall_target)` — set
    `exact_prefilter=True` for `lax.top_k` selection. Additionally
    `max_per_class` caps survivors per class; set it to `max_detections`
    to make the cap unobservable in the merged output. Only when M >= A is
    the result exactly greedy per-class NMS. Measured deviation at
    realistic A >> M: tests/test_nms_pallas.py (candidate-starvation
    bound) and benchmarks/tpu_nms_check.py (compiled vs oracle).
    """
    _check_score_threshold(score_threshold)
    batch, num_anchors, num_classes = scores.shape
    m_eff = min(2 * pre_nms_top_k, num_anchors)
    m = _round_up(m_eff, _LANE)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if m_eff >= num_anchors:
        # Keep every anchor: no selection, no gather.
        cand_scores = scores  # (B, A, C)
        cand_boxes = boxes  # (B, A, 4)
    else:
        # Class-agnostic top-M anchors per image. approx_max_k is the
        # TPU-native partial-reduction top-k (the argmax-emit kernel needs
        # candidate recall, not ordering).
        agnostic = jnp.max(scores, axis=-1)  # (B, A)
        if packed_sort:
            from object_detector_tpu.ops.packsort import top_k_packed_idx

            aidx = top_k_packed_idx(agnostic, m_eff)  # (B, M)
        elif interpret or exact_prefilter:
            _, aidx = jax.lax.top_k(agnostic, m_eff)  # (B, M)
        else:
            _, aidx = jax.lax.approx_max_k(
                agnostic, m_eff, recall_target=recall_target
            )
        cand_scores = jnp.take_along_axis(scores, aidx[..., None], axis=1)
        cand_boxes = jnp.take_along_axis(boxes, aidx[..., None], axis=1)

    pad = m - cand_scores.shape[1]
    if pad:
        cand_scores = jnp.pad(cand_scores, ((0, 0), (0, pad), (0, 0)))
        cand_boxes = jnp.pad(cand_boxes, ((0, 0), (0, pad), (0, 0)))

    rows = batch * num_classes
    # Scores: (B, M, C) -> (B, C, M) -> (R, M).
    row_scores = jnp.transpose(cand_scores, (0, 2, 1)).reshape(rows, m)
    return _rows_nms_merge(
        cand_boxes,
        row_scores.astype(jnp.float32),
        batch,
        num_classes,
        m_eff,
        class_top_k=class_top_k,
        max_per_class=max_per_class,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        interpret=interpret,
        exact_prefilter=exact_prefilter,
        recall_target=recall_target,
        packed_sort=packed_sort,
        coord_bf16=coord_bf16,
    )


def pallas_per_class_nms(
    boxes: Array,  # (A, 4) one image
    scores: Array,  # (A, C)
    **kwargs,
) -> Detections:
    """Single-image convenience wrapper (tests / predict-on-image)."""
    det = pallas_per_class_nms_batched(boxes[None], scores[None], **kwargs)
    return Detections(
        boxes=det.boxes[0], scores=det.scores[0],
        classes=det.classes[0], valid=det.valid[0],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_threshold", "iou_threshold", "pre_nms_top_k", "max_detections",
        "max_per_class", "center_variance", "size_variance", "interpret",
        "exact_prefilter", "recall_target", "packed_sort", "class_top_k",
        "coord_bf16",
    ),
)
def pallas_decode_nms(
    cls_logits: Array,  # (B, A, C) raw sigmoid logits
    box_offsets: Array,  # (B, A, 4) SSD-encoded offsets
    anchors_center: Array,  # (A, 4)
    *,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    pre_nms_top_k: int = 256,
    max_detections: int = 200,
    max_per_class: int = 100,
    center_variance: float = 0.1,
    size_variance: float = 0.2,
    interpret: bool | None = None,
    exact_prefilter: bool = False,
    recall_target: float = 0.95,
    packed_sort: bool = False,
    class_top_k: int = 0,
    coord_bf16: bool = False,
) -> Detections:
    """Fused candidate-sparse postprocess: the anchor pre-filter runs on
    LOGITS (sigmoid is monotone, so top-M by max-class logit == top-M by
    max-class score), and sigmoid + box decode only touch the M gathered
    candidates instead of all A anchors — at SSD-300 bs=64 that removes
    full-size (B, 8732, C) sigmoid/transpose and (B, 8732, 4) decode
    passes.

    Same approximation contract as `pallas_per_class_nms_batched` (see its
    docstring): exact only when M >= A; otherwise class-agnostic candidate
    selection (+ approx_max_k unless `exact_prefilter`) can drop candidates
    a per-class exact scan would keep."""
    from object_detector_tpu.ops import boxes as box_ops

    _check_score_threshold(score_threshold)
    batch, num_anchors, num_classes = cls_logits.shape
    m_eff = min(2 * pre_nms_top_k, num_anchors)
    m = _round_up(m_eff, _LANE)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if m_eff >= num_anchors:
        cand_logits = cls_logits
        cand_offsets = box_offsets
        cand_anchors = jnp.broadcast_to(
            anchors_center[None], (batch, num_anchors, 4)
        )
    else:
        agnostic = jnp.max(cls_logits, axis=-1)  # (B, A), native dtype
        if packed_sort:
            from object_detector_tpu.ops.packsort import top_k_packed_idx

            aidx = top_k_packed_idx(agnostic.astype(jnp.float32), m_eff)
        elif interpret or exact_prefilter:
            _, aidx = jax.lax.top_k(agnostic, m_eff)
        else:
            _, aidx = jax.lax.approx_max_k(
                agnostic, m_eff, recall_target=recall_target
            )
        cand_logits = jnp.take_along_axis(cls_logits, aidx[..., None], axis=1)
        cand_offsets = jnp.take_along_axis(box_offsets, aidx[..., None], axis=1)
        cand_anchors = jnp.take(anchors_center, aidx, axis=0)  # (B, M, 4)

    return _candidates_decode_nms(
        cand_logits, cand_offsets, cand_anchors, m, m_eff,
        center_variance=center_variance, size_variance=size_variance,
        class_top_k=class_top_k, max_per_class=max_per_class,
        max_detections=max_detections, iou_threshold=iou_threshold,
        score_threshold=score_threshold, interpret=interpret,
        exact_prefilter=exact_prefilter, recall_target=recall_target,
        packed_sort=packed_sort, coord_bf16=coord_bf16,
    )


def _candidates_decode_nms(
    cand_logits: Array,  # (B, M', C) raw logits (any float dtype)
    cand_offsets: Array,  # (B, M', 4) f32 SSD-encoded offsets
    cand_anchors: Array,  # (B, M', 4) center-form anchors
    m: int,  # lane-rounded kernel row width (>= M')
    m_eff: int,
    *,
    center_variance: float,
    size_variance: float,
    class_top_k: int,
    max_per_class: int,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
    interpret: bool,
    exact_prefilter: bool,
    recall_target: float,
    packed_sort: bool,
    coord_bf16: bool,
) -> Detections:
    """Shared tail of the decode-NMS entry points: sigmoid + box decode on
    the gathered candidates only, lane pad, then the suppression kernel +
    cross-class merge."""
    from object_detector_tpu.ops import boxes as box_ops

    batch, _, num_classes = cand_logits.shape
    cand_scores = jax.nn.sigmoid(cand_logits.astype(jnp.float32))
    cand_boxes = box_ops.decode(
        cand_offsets, cand_anchors, center_variance, size_variance, clip=True
    )

    pad = m - cand_scores.shape[1]
    if pad:
        cand_scores = jnp.pad(cand_scores, ((0, 0), (0, pad), (0, 0)))
        cand_boxes = jnp.pad(cand_boxes, ((0, 0), (0, pad), (0, 0)))

    rows = batch * num_classes
    row_scores = jnp.transpose(cand_scores, (0, 2, 1)).reshape(rows, m)
    return _rows_nms_merge(
        cand_boxes,
        row_scores.astype(jnp.float32),
        batch,
        num_classes,
        m_eff,
        class_top_k=class_top_k,
        max_per_class=max_per_class,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        interpret=interpret,
        exact_prefilter=exact_prefilter,
        recall_target=recall_target,
        packed_sort=packed_sort,
        coord_bf16=coord_bf16,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "anchors_per_level", "score_threshold", "iou_threshold",
        "pre_nms_top_k", "max_detections", "max_per_class",
        "center_variance", "size_variance", "interpret", "exact_prefilter",
        "recall_target", "packed_sort", "class_top_k", "coord_bf16",
    ),
)
def pallas_decode_nms_levels(
    level_logits: tuple,  # per level: (B, H, W, a*C) raw logits, head-native
    level_offsets: tuple,  # per level: (B, H, W, a*4) f32 offsets
    anchors_center: Array,  # (A, 4) full level-major anchor set
    anchors_per_level: tuple,  # anchors per cell (a) for each level
    *,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    pre_nms_top_k: int = 256,
    max_detections: int = 200,
    max_per_class: int = 100,
    center_variance: float = 0.1,
    size_variance: float = 0.2,
    interpret: bool | None = None,
    exact_prefilter: bool = False,
    recall_target: float = 0.95,
    packed_sort: bool = False,
    class_top_k: int = 0,
    coord_bf16: bool = False,
) -> Detections:
    """Per-level candidate selection: consumes the heads' NATIVE per-level
    (B, H, W, a*C) tensors, never materializing the concatenated (B, A, C)
    logits (at SSD-512/COCO bs=64 that tensor is 251 MB bf16 and its
    assembly — per-level (H, W, a*C)->(A', C) retiles plus the
    dynamic-update-slice concat — cost ~2.8 ms of HBM traffic, r3 HLO
    profile).

    Two-stage EXACT prefilter: per level, top-min(M, N_l) anchors by
    max-class logit (a superset of that level's contribution to the global
    top-M, since the global top-M contains at most M anchors of any
    level), then a global top-M over the ~Sum min(M, N_l) stage-1
    survivors. Candidate logits/offsets are gathered per level with LOCAL
    row indices from the native layout: one row gather of the (H*W, a*C)
    view plus an in-register anchor-slot select — no global (B, A, C)
    operand ever exists. The candidate SET equals the single-shot global
    top-M exactly; only score-tie ordering across levels can differ (the
    two-stage sort breaks cross-level ties by stage-1 slot instead of raw
    anchor index), which greedy NMS is insensitive to except on exact
    ties.

    When exact_prefilter=False the per-level stage-1 uses approx_max_k
    (same recall contract as the one-shot path). Results otherwise follow
    the `pallas_per_class_nms_batched` approximation contract.

    STATUS (r3, v5e-1): MEASURED LOSS vs the concat path — 0.90x
    SSD-300, 0.93x SSD-512, 1.01x RetinaNet (chip_logs/per_level_ab.log,
    parity clean) with exact stage-1 sorts, and STILL a loss with
    approx_max_k stage 1 after the COCO prefilter flip (0.91x SSD-512,
    0.95x RetinaNet — same log; top-20 matched the exact oracle, and the
    per-level arm was exactly oracle-equal). The many small per-level
    selections + local gathers + slot-select reduces dominate the saved
    concat traffic in both regimes. Off by default
    (EvalConfig.per_level_heads); kept as the exact-parity scaffold."""
    _check_score_threshold(score_threshold)
    batch = level_logits[0].shape[0]
    counts = [
        t.shape[1] * t.shape[2] * a
        for t, a in zip(level_logits, anchors_per_level)
    ]
    num_anchors = sum(counts)
    num_classes = level_logits[0].shape[-1] // anchors_per_level[0]
    m_eff = min(2 * pre_nms_top_k, num_anchors)
    m = _round_up(m_eff, _LANE)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Stage 1: per-level max-class logit + top-k_l anchors (k_l = full
    # level when it fits). The class reduce fuses with the (metadata)
    # reshape and reads the head output in its native layout once.
    sel_logits, sel_offsets, sel_anchors, sel_amax = [], [], [], []
    offset = 0
    for tap_c, tap_b, a, n_l in zip(
        level_logits, level_offsets, anchors_per_level, counts
    ):
        b, h, w, _ = tap_c.shape
        amax = jnp.max(
            tap_c.reshape(b, h * w * a, num_classes), axis=-1
        )  # (B, N_l) native dtype
        k_l = min(m_eff, n_l)
        flat_c = tap_c.reshape(b, h * w, a * num_classes)
        flat_b = tap_b.reshape(b, h * w, a * 4)
        if k_l >= n_l:
            # Whole level survives stage 1: skip the sort AND the gather —
            # the native reshape is the candidate slab.
            sel_logits.append(tap_c.reshape(b, n_l, num_classes))
            sel_offsets.append(tap_b.reshape(b, n_l, 4))
            sel_anchors.append(
                jnp.broadcast_to(
                    anchors_center[offset : offset + n_l][None], (b, n_l, 4)
                )
            )
            sel_amax.append(amax)
        else:
            if packed_sort:
                from object_detector_tpu.ops.packsort import top_k_packed_idx

                lidx = top_k_packed_idx(amax.astype(jnp.float32), k_l)
                lmax = jnp.take_along_axis(amax, lidx, axis=1)
            elif interpret or exact_prefilter:
                lmax, lidx = jax.lax.top_k(amax, k_l)
            else:
                lmax, lidx = jax.lax.approx_max_k(
                    amax, k_l, recall_target=recall_target
                )
            cell = lidx // a  # (B, k_l) spatial row in the native view
            slot = lidx - cell * a  # anchor slot within the cell
            g_c = jnp.take_along_axis(
                flat_c, cell[..., None], axis=1
            ).reshape(b, k_l, a, num_classes)
            g_b = jnp.take_along_axis(
                flat_b, cell[..., None], axis=1
            ).reshape(b, k_l, a, 4)
            # Anchor-slot select as a one-hot mask-sum (a is 4/6/9 — a
            # dynamic sublane gather lowers poorly; the masked reduce is
            # a few VPU passes over a (B, k_l, a, C) register block).
            onehot = (
                slot[..., None]
                == jnp.arange(a, dtype=slot.dtype)[None, None]
            )  # (B, k_l, a)
            sel_logits.append(
                jnp.sum(
                    jnp.where(onehot[..., None], g_c, 0), axis=2
                ).astype(tap_c.dtype)
            )
            sel_offsets.append(
                jnp.sum(jnp.where(onehot[..., None], g_b, 0), axis=2)
            )
            sel_anchors.append(
                jnp.take(anchors_center, offset + lidx, axis=0)
            )
            sel_amax.append(lmax)
        offset += n_l

    stage1_amax = jnp.concatenate(sel_amax, axis=1)  # (B, S)
    stage1_logits = jnp.concatenate(sel_logits, axis=1)  # (B, S, C)
    stage1_offsets = jnp.concatenate(sel_offsets, axis=1).astype(jnp.float32)
    stage1_anchors = jnp.concatenate(sel_anchors, axis=1)

    s_total = stage1_amax.shape[1]
    if s_total > m_eff:
        # Stage 2: global top-M over the stage-1 survivors (exact: stage 1
        # kept a superset of every level's global-top-M contribution).
        if packed_sort:
            from object_detector_tpu.ops.packsort import top_k_packed_idx

            aidx = top_k_packed_idx(stage1_amax.astype(jnp.float32), m_eff)
        elif interpret or exact_prefilter:
            _, aidx = jax.lax.top_k(stage1_amax, m_eff)
        else:
            _, aidx = jax.lax.approx_max_k(
                stage1_amax, m_eff, recall_target=recall_target
            )
        cand_logits = jnp.take_along_axis(
            stage1_logits, aidx[..., None], axis=1
        )
        cand_offsets = jnp.take_along_axis(
            stage1_offsets, aidx[..., None], axis=1
        )
        cand_anchors = jnp.take_along_axis(
            stage1_anchors, aidx[..., None], axis=1
        )
    else:
        cand_logits = stage1_logits
        cand_offsets = stage1_offsets
        cand_anchors = stage1_anchors

    return _candidates_decode_nms(
        cand_logits, cand_offsets, cand_anchors, m, m_eff,
        center_variance=center_variance, size_variance=size_variance,
        class_top_k=class_top_k, max_per_class=max_per_class,
        max_detections=max_detections, iou_threshold=iou_threshold,
        score_threshold=score_threshold, interpret=interpret,
        exact_prefilter=exact_prefilter, recall_target=recall_target,
        packed_sort=packed_sort, coord_bf16=coord_bf16,
    )
