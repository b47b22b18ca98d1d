#!/usr/bin/env python3
"""Read the hardware A/B artifacts (bench_artifacts/ab/) and print a
go/no-go recommendation for each opt-in default, per the decision
checklist in TPU_QUEUE.md:

  - UFORMER_TPU_DIAG_SOFTMAX: flip iff the diag leg beats base summed
    over the shared stage rows and no row regresses materially.
  - UFORMER_TPU_MEGA_T256: flip iff the t256 leg beats base AND the
    q_infer_t256 headline >= the committed bench_infer headline AND the
    leg output has no Mosaic spill warnings.
  - UFORMER_TPU_LEFF_ILEAVE: keep 2 iff the il2 model totals <= il1.

Advisory only — it changes nothing; a human (or the session) applies the
flip and recaptures. Exits 0 always; missing artifacts are reported as
PENDING.
"""

from __future__ import annotations

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB = os.path.join(ROOT, "bench_artifacts", "ab")

NOISE_MS = 0.05  # per-row jitter allowance on the chained microbench


def _read(name):
    try:
        with open(os.path.join(AB, name)) as f:
            return f.read()
    except OSError:
        return None


def parse_stage_table(text):
    """The collated table ab_stage_opts prints: a header line starting
    with 'row', then one line per stage row with 4 float cells
    (base, diag, t256, diag+t256)."""
    rows = {}
    in_table = False
    for line in text.splitlines():
        if line.startswith("row"):
            in_table = True
            continue
        if not in_table:
            continue
        m = re.match(r"^(.*?)\s+(-?[\d.]+|nan)\s+(-?[\d.]+|nan)"
                     r"\s+(-?[\d.]+|nan)\s+(-?[\d.]+|nan)\s*$", line)
        if m:
            rows[m.group(1).strip()] = tuple(
                float(m.group(i)) for i in range(2, 6))
    return rows


def leg_delta(rows, idx):
    """(sum delta vs base, worst per-row regression) for leg column idx."""
    tot, worst = 0.0, 0.0
    for name, cells in rows.items():
        base, leg = cells[0], cells[idx]
        if base != base or leg != leg:  # nan
            continue
        d = leg - base
        tot += d
        worst = max(worst, d)
    return tot, worst


def last_json(text):
    rec = None
    for line in text.splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                pass
    return rec


def main():
    verdicts = []

    # --- diag softmax + t256 (stage table) ---
    t = _read("q_stage_opts.txt")
    if t is None:
        verdicts.append(("UFORMER_TPU_DIAG_SOFTMAX", "PENDING",
                         "q_stage_opts.txt missing"))
        verdicts.append(("UFORMER_TPU_MEGA_T256", "PENDING",
                         "q_stage_opts.txt missing"))
    else:
        rows = parse_stage_table(t)
        if not rows:
            verdicts.append(("UFORMER_TPU_DIAG_SOFTMAX", "PENDING",
                             "no parsed rows in q_stage_opts.txt"))
            verdicts.append(("UFORMER_TPU_MEGA_T256", "PENDING",
                             "no parsed rows"))
        else:
            dtot, dworst = leg_delta(rows, 1)
            ok = dtot < -NOISE_MS and dworst <= NOISE_MS
            verdicts.append((
                "UFORMER_TPU_DIAG_SOFTMAX",
                "FLIP to 1" if ok else "keep 0",
                f"sum delta {dtot:+.3f} ms, worst row {dworst:+.3f} ms "
                f"over {len(rows)} rows"))

            # t256's win is a NEW dec2-megakernel row that the base leg
            # lacks (per-block kernels), so shared-row deltas can't see
            # it — the end-to-end headline is the deciding criterion;
            # shared rows only guard against regressions elsewhere.
            ttot, tworst = leg_delta(rows, 2)
            spill = bool(re.search(r"spill", t, re.I))
            head_ok, head_msg = None, "q_infer_t256.txt missing"
            ti = _read("q_infer_t256.txt")
            if ti is not None:
                spill = spill or bool(re.search(r"spill", ti, re.I))
                new = last_json(ti)
                try:
                    with open(os.path.join(ROOT, "bench_artifacts",
                                           "bench_infer.txt")) as f:
                        cur = last_json(f.read())
                except OSError:
                    cur = None
                if new and cur and new.get("value") and cur.get("value"):
                    head_ok = new["value"] >= cur["value"] + 0.05
                    head_msg = (f"t256 headline {new['value']} vs committed "
                                f"{cur['value']}")
            ok = (head_ok is True and not spill and tworst <= NOISE_MS)
            verdicts.append((
                "UFORMER_TPU_MEGA_T256",
                "FLIP to 1" if ok else
                ("PENDING" if head_ok is None else "keep 0"),
                f"shared-row sum delta {ttot:+.3f} ms, worst "
                f"{tworst:+.3f} ms; {head_msg}; spill-warnings={spill}"))

    # --- LeFF interleave ---
    t2, t1 = _read("q_leff_il2.txt"), _read("q_leff_il1.txt")
    if t2 is None or t1 is None:
        verdicts.append(("UFORMER_TPU_LEFF_ILEAVE", "PENDING",
                         "q_leff_il{1,2}.txt missing"))
    else:
        tot = {}
        for tag, txt in (("il2", t2), ("il1", t1)):
            m = re.search(r"model total: bwd ([\d.]+) ms, fwd ([\d.]+) ms",
                          txt)
            tot[tag] = (float(m.group(1)) + float(m.group(2))) if m else None
        if tot["il2"] is None or tot["il1"] is None:
            verdicts.append(("UFORMER_TPU_LEFF_ILEAVE", "PENDING",
                             "model-total line not found"))
        else:
            keep2 = tot["il2"] <= tot["il1"] + NOISE_MS
            verdicts.append((
                "UFORMER_TPU_LEFF_ILEAVE",
                "keep 2" if keep2 else "SET default 1",
                f"il2 bwd+fwd {tot['il2']:.2f} ms vs il1 {tot['il1']:.2f} ms"))

    # --- AD gate (context for the train capture) ---
    ad = _read("q_ad.txt")
    if ad is not None:
        state = ("FAILED — bench_train captured with PACKED_ATTN=0"
                 if "FAIL" in ad or "PACKED_ATTN=0" in ad
                 else ("ok" if "ALL OK" in ad else "inconclusive"))
        verdicts.append(("hardware AD parity", state, "q_ad.txt"))

    w = max(len(v[0]) for v in verdicts)
    for name, verdict, why in verdicts:
        print(f"{name:<{w}}  {verdict:<12}  {why}")
    print("\nAfter any flip: rerun "
          "`python scripts/tpu_capture.py --only bench_infer,bench_train` "
          "and commit — artifacts must match defaults at HEAD.")


if __name__ == "__main__":
    main()
