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
    out = " ".join(parts)
    if r.get("_train_prov"):
        out += f" (train: {r['_train_prov']})"
    return out


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
    # Latest row per model wins per-column: a partial row (e.g. the train
    # compile died — run_benchmarks emits the infer half) overrides only
    # the columns it carries; older values it lacks stay, with their own
    # provenance called out so the table can't silently mix vintages.
    merged = {}
    for r in rows:
        if "error" in r:
            continue
        m = r["model"]
        if m in merged:
            prev = merged[m]
            has_train = any(k.startswith("train_") and not k.endswith("_error")
                            and r.get(k) is not None for k in r)
            prev_prov = (prev.get("_train_prov") or _prov(prev)
                         if not has_train else None)
            prev = dict(prev)
            prev.update({k: v for k, v in r.items() if v is not None})
            if prev_prov and prev_prov != _prov(r):
                prev["_train_prov"] = prev_prov
            elif has_train:
                prev.pop("_train_prov", None)
            merged[m] = prev
        else:
            merged[m] = dict(r)
    rows = merged.values()

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
    tail = _splice_compile_table(here, tail)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(out)


def _splice_compile_table(here, tail):
    """Render results_compile.jsonl between the compile-table markers in
    the preserved prose, so the cold-vs-warm table can never diverge from
    its log either."""
    start, end = "<!-- compile-table:start -->", "<!-- compile-table:end -->"
    path = os.path.join(here, "results_compile.jsonl")
    if start not in tail or end not in tail or not os.path.exists(path):
        return tail
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows = {r["model"]: r for r in rows}.values()  # latest per model wins

    def _s(r, key):
        v = r.get(key)
        return f"{v:.1f}" if v is not None else "—"

    lines = [
        start,
        "",
        "| model | cold compile s | cold time-to-first-result s | "
        "warm compile s | warm time-to-first-result s |",
        "|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: -(r.get("cold_compile_s") or 0)):
        lines.append(
            f"| {r['model']} | {_s(r, 'cold_compile_s')} | "
            f"{_s(r, 'cold_wall_s')} | {_s(r, 'warm_compile_s')} | "
            f"{_s(r, 'warm_wall_s')} |")
    lines.append("")
    pre = tail[:tail.index(start)]
    post = tail[tail.index(end) + len(end):]
    return pre + "\n".join(lines) + end + post


if __name__ == "__main__":
    main()
