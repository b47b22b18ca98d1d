#!/usr/bin/env python3
"""A/B the opt-in stage-kernel options on hardware in one command.

Runs kernel_bench's stage section under each flag combo and prints a
collated ms table per stage row, so the flip-the-default decision for
UFORMER_TPU_DIAG_SOFTMAX / UFORMER_TPU_MEGA_T256 is one reading:

    python scripts/ab_stage_opts.py [--batch 8]

Each leg is a subprocess (fresh lru_caches + compile cache reuse across
legs is fine — the variants differ, so each compiles its own kernels).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEGS = [
    ("base", {}),
    ("diag", {"UFORMER_TPU_DIAG_SOFTMAX": "1"}),
    ("t256", {"UFORMER_TPU_MEGA_T256": "1"}),
    ("diag+t256", {"UFORMER_TPU_DIAG_SOFTMAX": "1",
                   "UFORMER_TPU_MEGA_T256": "1"}),
]

ROW = re.compile(r"^(stage \S+ x\d+ \S+)\s+([0-9.]+)\s")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()

    tables = {}
    names: list[str] = []
    for leg, envd in LEGS:
        env = dict(os.environ, **envd)
        try:
            r = subprocess.run(
                [sys.executable, "scripts/kernel_bench.py",
                 "--kernel", "stage", "--batch", str(args.batch)],
                cwd=ROOT, capture_output=True, text=True,
                timeout=args.timeout, env=env)
            out = r.stdout
        except subprocess.TimeoutExpired:
            out = ""
        tables[leg] = {}
        for line in out.splitlines():
            m = ROW.match(line.strip())
            if m:
                tables[leg][m.group(1)] = float(m.group(2))
                if m.group(1) not in names:
                    names.append(m.group(1))
        print(f"[{leg}] {len(tables[leg])} rows", flush=True)

    hdr = f"{'row':<28}" + "".join(f"{leg:>11}" for leg, _ in LEGS)
    print("\n" + hdr)
    for name in names:
        cells = "".join(
            f"{tables[leg].get(name, float('nan')):>11.3f}"
            for leg, _ in LEGS)
        print(f"{name:<28}{cells}")
    for leg, _ in LEGS[1:]:
        common = [n for n in names
                  if n in tables[leg] and n in tables["base"]]
        if common:
            d = sum(tables[leg][n] - tables["base"][n] for n in common)
            print(f"sum delta vs base [{leg}]: {d:+.3f} ms "
                  f"over {len(common)} shared rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
