"""Regenerate every published perf number from headline_results.json
(VERDICT r2 item #8: one source of truth).

    python benchmarks/headline.py --update-json   # measure on the chip
    python benchmarks/update_docs.py              # rewrite README/ARCHITECTURE

The script rewrites the text between `<!-- BENCH:BEGIN -->` and
`<!-- BENCH:END -->` markers in README.md and ARCHITECTURE.md from the
committed JSON — never hand-edit numbers inside those blocks. Rows whose
key is absent from the JSON are emitted as "not yet measured" so a stale
fixture can't masquerade as a measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RESULTS_PATH = os.path.join(HERE, "headline_results.json")

# (json key, README row label). Order == table order.
ROWS = [
    ("ssd300_int8",
     "SSD-300 batched inference bs=64, uint8→detections "
     "(int8 trunk+heads, Pallas fused stem + Pallas NMS)"),
    ("ssd300_int8_stem_off", "same, fused stem off (A/B)"),
    ("ssd300_bf16", "same, bf16"),
    ("ssd512_int8", "SSD-512/ResNet-50 bs=64 (int8, BN-folded)"),
    ("ssd512_bf16", "SSD-512/ResNet-50 bs=32 (bf16)"),
    ("retinanet_int8", "RetinaNet/FPN-ResNet-50 bs=64 (int8 incl. FPN+heads)"),
    ("retinanet_bf16", "RetinaNet/FPN-ResNet-50 bs=32 (bf16)"),
    ("train_ssd300_bs32", "train step bs=32 (augment+match+fwd+bwd+SGD)"),
]

BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def _latest_driver_confirmed() -> tuple[str, dict] | None:
    """Newest BENCH_r*.json whose parsed record carries a non-null headline
    — the only independently-confirmed numbers this repo has (VERDICT r3
    weak #2: published numbers must say which column they are)."""
    import glob

    best = None
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed")
        except (ValueError, OSError):
            continue
        if isinstance(parsed, dict) and parsed.get("value") is not None:
            best = (os.path.basename(path), parsed)
    return best


def render(results: dict) -> str:
    date = results.get("date", "?")
    backend = results.get("backend", "?")
    lines = [
        BEGIN,
        f"Source of truth: `benchmarks/headline_results.json` "
        f"(generated {date}, backend {backend}, v5e-1; regenerate with "
        f"`python benchmarks/headline.py --update-json && "
        f"python benchmarks/update_docs.py`).",
        "",
    ]
    confirmed = _latest_driver_confirmed()
    if confirmed is not None:
        name, parsed = confirmed
        extra = []
        if parsed.get("p50_latency_ms_bs1") is not None:
            extra.append(f"p50 {parsed['p50_latency_ms_bs1']:.2f} ms")
        if parsed.get("train_images_per_sec_chip") is not None:
            extra.append(f"train {parsed['train_images_per_sec_chip']:.0f} img/s")
        extra_s = (", " + ", ".join(extra)) if extra else ""
        lines += [
            f"Driver-confirmed (`{name}`, independent run of `bench.py`): "
            f"SSD-300 headline **{parsed['value']:.0f} img/s/chip**{extra_s}. "
            f"All table rows below are builder-measured on the same chip "
            f"class and regenerated from the JSON above.",
            "",
        ]
    lines += [
        "| Metric | Value (builder-measured) |",
        "|---|---|",
    ]
    for key, label in ROWS:
        v = results.get(key)
        val = f"**{v:.0f} img/s/chip**" if v is not None else "not yet measured"
        lines.append(f"| {label} | {val} |")
    lat = results.get("p50_latency_ms_bs1")
    path_name = results.get("p50_latency_path", "?")
    lat_i8 = results.get("p50_latency_ms_bs1_int8")
    lat_bf = results.get("p50_latency_ms_bs1_bf16")
    lat_s = f"**{lat:.2f} ms**" if lat is not None else "not yet measured"
    both = (
        f"; int8 {lat_i8:.2f} ms / bf16 {lat_bf:.2f} ms"
        if lat_i8 is not None and lat_bf is not None else ""
    )
    lines.append(
        f"| p50 single-image latency (on-device, bs=1, default VMEM, "
        f"fastest serving path = {path_name}{both}) | {lat_s} |"
    )
    lines.append("| target (BASELINE north star) | 5000 img/s/chip |")
    lines.append(END)
    return "\n".join(lines)


def patch(path: str, block: str) -> bool:
    with open(path) as f:
        text = f.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pat.search(text):
        print(f"[update_docs] no {BEGIN} block in {path}", file=sys.stderr)
        return False
    new = pat.sub(lambda _: block, text)
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        print(f"updated {path}")
        return True
    print(f"{path} already current")
    return True


def main() -> None:
    with open(RESULTS_PATH) as f:
        results = json.load(f)
    block = render(results)
    ok = True
    for name in ("README.md", "ARCHITECTURE.md"):
        ok &= patch(os.path.join(REPO, name), block)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
