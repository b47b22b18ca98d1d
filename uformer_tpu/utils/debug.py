"""Debug-mode guards and profiling hooks (SURVEY.md §5).

The reference has no sanitizers; here debug mode adds NaN/Inf detection
(jax_debug_nans + explicit checks) and a profiler context that captures a
device trace readable with the TensorBoard profile plugin or the
parse helper below.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN debugging: every jit output is checked and errors point
    at the producing op."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree, name: str = "tree"):
    """In-graph finite check usable inside jitted fns: raises
    FloatingPointError host-side if any leaf has NaN/Inf."""
    import jax.debug as jdbg

    ok = jnp.array(True)
    for leaf in jax.tree_util.tree_leaves(tree):
        ok = ok & jnp.isfinite(leaf).all()

    def _raise(o):
        if not bool(o):
            raise FloatingPointError(f"non-finite values in {name}")

    jdbg.callback(_raise, ok)
    return tree


@contextlib.contextmanager
def profile(trace_dir: str = "/tmp/uformer_tpu_trace"):
    """Capture a device trace: `with profile('/tmp/t'): run(...)`."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(trace_dir: str, top: int = 20, instances: bool = False):
    """Aggregate device op time from the captured trace (ms per family;
    `instances=True` keeps per-instance op names instead)."""
    import collections
    import glob
    import gzip
    import json
    import re

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in trace["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    groups = collections.defaultdict(float)
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev:
            name = e.get("name", "")
            if name.startswith("jit_"):
                continue
            fam = name if instances else re.sub(r"[.\d]+$", "", name)
            if not fam or re.fullmatch(r"[.\d]+", fam):
                # pure-numeric names are whole-program events, not ops —
                # counting them double-counts the step
                continue
            groups[fam] += e.get("dur", 0) / 1e3
    return dict(sorted(groups.items(), key=lambda kv: -kv[1])[:top])
