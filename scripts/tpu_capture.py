#!/usr/bin/env python3
"""One-shot TPU measurement capture: run every benchmark/profile in
sequence with per-step timeouts and save the outputs under
bench_artifacts/. Use after kernel changes (or a tunnel outage) to
re-measure everything with one command:

    python scripts/tpu_capture.py            # full capture (~15 min)
    python scripts/tpu_capture.py --quick    # bench.py inference only

Each step runs in a subprocess so one pathological compile can't sink
the rest; artifacts are plain text (plus the bench JSON line) for diffing
across rounds.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "bench_artifacts")

STEPS = [
    # (name, argv, timeout_s, quick)
    ("probe", [sys.executable, "-c",
               "import jax; print(jax.devices())"], 120, True),
    ("bench_infer", [sys.executable, "bench.py", "--mode", "infer"],
     900, True),
    ("bench_infer_unpacked_attn",
     [sys.executable, "bench.py", "--mode", "infer"], 900, True),
    ("kernel_bench", [sys.executable, "scripts/kernel_bench.py"], 1500,
     False),
    ("kernel_bench_unpacked_attn",
     [sys.executable, "scripts/kernel_bench.py"], 1500, False),
    ("bench_train", [sys.executable, "bench.py", "--mode", "train"],
     1500, False),
    ("bench_train_unpacked_attn",
     [sys.executable, "bench.py", "--mode", "train"], 1500, False),
    ("bench_aux", [sys.executable, "bench.py", "--mode", "aux"], 1500,
     False),
    ("profile_forward", [sys.executable, "scripts/profile_forward.py"],
     900, False),
    ("profile_train", [sys.executable, "scripts/profile_train.py"],
     1500, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated step names")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None

    for name, argv, tmo, quick in STEPS:
        if only is not None and name not in only:
            continue
        if args.quick and not quick:
            continue
        path = os.path.join(OUT, f"{name}.txt")
        env = dict(os.environ)
        if name.endswith("_unpacked_attn"):
            # A/B leg: packed narrow-C attention is the default; this
            # measures the windowed fallback for comparison.
            env["UFORMER_TPU_PACKED_ATTN"] = "0"
        t0 = time.time()
        try:
            r = subprocess.run(argv, cwd=ROOT, capture_output=True,
                               text=True, timeout=tmo, env=env)
            body = r.stdout + ("\n--- stderr ---\n" + r.stderr
                               if r.returncode else "")
            status = f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            body = "(timed out)"
            status = f"TIMEOUT after {tmo}s"
        dt = time.time() - t0
        with open(path, "w") as f:
            f.write(f"# {name} — {status}, {dt:.0f}s\n{body}\n")
        print(f"{name:16s} {status:12s} {dt:7.0f}s -> {path}",
              flush=True)
        if name == "probe" and "TIMEOUT" in status:
            print("TPU unreachable — aborting capture", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
