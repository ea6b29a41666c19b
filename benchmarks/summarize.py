"""Render benchmarks/results.jsonl as a markdown table (BENCHMARKS.md).

The PRIMARY throughput column is the XPlane device rate
(``*_images_per_sec_device``): on this box the axon tunnel's dispatch
overhead and any concurrent CPU load depress wall rates 10-40% while
device timestamps stay flat (ROUND4 phase-E evidence: deepvit wall
6380 img/s vs a flat 4.76 ms device step).  Wall rates stay in the table
as the end-to-end cross-check.  Latest row per model wins.
"""

import json
import os
import sys


def _prov(r):
    parts = [r.get("round", "r2/r3"), r.get("method", "pre-provenance")]
    if r.get("git"):
        parts.append(r["git"])
    return " ".join(parts)


def _rate(r, key):
    v = r.get(key)
    return f"{v:.0f}" if v is not None else "—"


def _ms(r, key):
    v = r.get(key)
    return f"{v:.2f}" if v is not None else "—"


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "results.jsonl")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows = {r["model"]: r for r in rows if "error" not in r}.values()

    models = [r for r in rows if not r["model"].endswith("_obj")]
    objectives = [r for r in rows if r["model"].endswith("_obj")]

    lines = [
        "# Benchmarks",
        "",
        f"Single chip ({next(iter(rows))['device']}), bf16 compute / f32 "
        "params, steady-state amortized throughput.  **device** columns are "
        "XPlane device time (the primary number — the tunnel's host-side "
        "dispatch and box CPU load can depress walls without touching the "
        "chip); **wall** is the end-to-end cross-check.",
        "",
        "| model | image | batch | infer img/s device | infer img/s wall | "
        "infer ms device | train img/s device | train img/s wall | "
        "provenance |",
        "|---|---|---|---|---|---|---|---|---|",
    ]

    def sort_key(r):
        return -(r.get("infer_images_per_sec_device")
                 or r.get("infer_images_per_sec_per_chip") or 0)

    for r in sorted(models, key=sort_key):
        lines.append(
            f"| {r['model']} | {r['image_size']} | {r['batch']} | "
            f"{_rate(r, 'infer_images_per_sec_device')} | "
            f"{_rate(r, 'infer_images_per_sec_per_chip')} | "
            f"{_ms(r, 'infer_device_ms_per_step')} | "
            f"{_rate(r, 'train_images_per_sec_device')} | "
            f"{_rate(r, 'train_images_per_sec_per_chip')} | {_prov(r)} |")
    if objectives:
        lines += [
            "",
            "Objective wrappers (the forward *is* the loss — train step "
            "differentiates it directly; BASELINE.md workload 5):",
            "",
            "| objective | image | batch | train img/s device | "
            "train img/s wall | train ms device | provenance |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in sorted(objectives, key=lambda r: -(
                r.get("train_images_per_sec_device")
                or r.get("train_images_per_sec_per_chip") or 0)):
            lines.append(
                f"| {r['model']} | {r['image_size']} | {r['batch']} | "
                f"{_rate(r, 'train_images_per_sec_device')} | "
                f"{_rate(r, 'train_images_per_sec_per_chip')} | "
                f"{_ms(r, 'train_device_ms_per_step')} | {_prov(r)} |")
    out = os.path.join(here, "BENCHMARKS.md")
    # Preserve the prose sections (method notes, ceilings, compile-time
    # story) — everything from the first "## " heading onward.
    tail = ""
    if os.path.exists(out):
        old = open(out).read()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(out)


if __name__ == "__main__":
    main()
