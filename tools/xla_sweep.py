#!/usr/bin/env python
"""XLA/libtpu flag sweep for the train step (VERDICT r2 weak #1).

Runs the device-step benchmark (bench.py with BENCH_E2E=0) in a fresh
subprocess per flag configuration — flags only take effect at backend
initialisation, so in-process sweeping is impossible — and reports
img/s per config against the no-flag baseline.

Each config pays its own compile (different flags change the XLA
compilation cache key), so a sweep of N configs costs N * (compile +
13 steps). Use --iters/--batch to trade precision for time.

Configs are real, public XLA TPU flags (the MaxText/ml-goodput corpus);
an unknown flag makes libtpu fail fast — those rows report "invalid".

Usage: python tools/xla_sweep.py [--batch 128] [--only name,name]
Results append to sweep_results.jsonl (one JSON line per config).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# Single-chip-relevant candidates. Collective/async flags are omitted —
# the bench is single-device, they would be dead switches.
CONFIGS: dict[str, str] = {
    "baseline": "",
    # bigger scoped-VMEM scratch lets the fusion cost model build larger
    # fused loops (default 16 MB-ish; v5e has 128 MB VMEM)
    "vmem64": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96": "--xla_tpu_scoped_vmem_limit_kib=98304",
    # latency-hiding scheduler: mostly for collectives but also reorders
    # DMA-heavy programs
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # allow more aggressive loop-invariant code motion size inflation
    "licm": "--xla_tpu_licm_size_inflation_ratio=2.0",
    # combined best-guess
    "vmem64+lhs": ("--xla_tpu_scoped_vmem_limit_kib=65536 "
                   "--xla_tpu_enable_latency_hiding_scheduler=true"),
}


def run_config(name: str, flags: str, batch: int, iters: int) -> dict:
    env = dict(os.environ)
    env["BENCH_E2E"] = "0"
    env["BENCH_BATCH"] = str(batch)
    env["BENCH_ITERS"] = str(iters)
    if flags:
        env["LIBTPU_INIT_ARGS"] = flags
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], env=env,
            capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        return {"config": name, "flags": flags, "status": "timeout"}
    line = None
    for ln in out.stdout.strip().splitlines()[::-1]:
        if ln.startswith("{"):
            line = ln
            break
    if out.returncode != 0 or line is None:
        tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
        return {"config": name, "flags": flags, "status": "invalid",
                "tail": tail}
    rec = json.loads(line)
    return {"config": name, "flags": flags, "status": "ok",
            "img_per_sec": rec["value"],
            "infer_ips": rec.get("infer_nms_images_per_sec_per_chip")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    names = (args.only.split(",") if args.only else list(CONFIGS))

    results = []
    log = open(REPO / "sweep_results.jsonl", "a")
    for name in names:
        flags = CONFIGS[name]
        print(f"[{name}] {flags or '(no flags)'} ...", flush=True)
        rec = run_config(name, flags, args.batch, args.iters)
        results.append(rec)
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(f"  -> {rec}", flush=True)

    base = next((r for r in results
                 if r["config"] == "baseline" and r["status"] == "ok"), None)
    print(f"\n{'config':>14} {'img/s':>8} {'vs base':>8}  status")
    for r in results:
        ips = r.get("img_per_sec")
        rel = (f"{ips / base['img_per_sec']:+.1%}"
               if ips and base else "")
        print(f"{r['config']:>14} {ips or '-':>8} {rel:>8}  {r['status']}")


if __name__ == "__main__":
    main()
