"""Render benchmarks/results.jsonl as a markdown table (BENCHMARKS.md)."""

import json
import os
import sys


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
        "params, steady-state amortized throughput.",
        "",
        "| model | image | batch | infer img/s | train (fwd+bwd) img/s | "
        "infer device ms (XPlane) | provenance |",
        "|---|---|---|---|---|---|---|",
    ]

    def _prov(r):
        parts = [r.get("round", "r2/r3"), r.get("method", "pre-provenance")]
        if r.get("git"):
            parts.append(r["git"])
        return " ".join(parts)

    for r in sorted(models,
                    key=lambda r: -r["infer_images_per_sec_per_chip"]):
        xp = r.get("infer_device_ms_per_step")
        lines.append(
            f"| {r['model']} | {r['image_size']} | {r['batch']} | "
            f"{r['infer_images_per_sec_per_chip']:.0f} | "
            f"{r['train_images_per_sec_per_chip']:.0f} | "
            f"{xp if xp is not None else '—'} | {_prov(r)} |")
    if objectives:
        lines += [
            "",
            "Objective wrappers (the forward *is* the loss — train step "
            "differentiates it directly; BASELINE.md workload 5):",
            "",
            "| objective | image | batch | train (fwd+bwd) img/s | "
            "provenance |",
            "|---|---|---|---|---|",
        ]
        for r in sorted(objectives,
                        key=lambda r: -r["train_images_per_sec_per_chip"]):
            lines.append(
                f"| {r['model']} | {r['image_size']} | {r['batch']} | "
                f"{r['train_images_per_sec_per_chip']:.0f} | {_prov(r)} |")
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
