"""Model-FLOPs-utilization accounting for benchmarks.

FLOPs per step come from XLA's own cost model on the COMPILED program
(`compiled.cost_analysis()['flops']`) — no hand-maintained analytic
formula to drift out of sync with the model.  Peak chip FLOP/s is
looked up from the device kind (bf16 matmul peak, the number TPU
marketing quotes and the scaling-book uses for MFU).
"""

from typing import Optional

import jax

# bf16 peak FLOP/s per chip (dense).  Sources: public TPU specs.
_PEAK_BF16 = {
    'TPU v2': 45e12,
    'TPU v3': 123e12,
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12,
    'TPU v5e': 197e12,
    'TPU v5': 459e12,
    'TPU v5p': 459e12,
    'TPU v6 lite': 918e12,
    'TPU v6e': 918e12,
}


def peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of the chip, or None if unknown."""
    device = device or jax.devices()[0]
    kind = getattr(device, 'device_kind', '') or ''
    for name, val in _PEAK_BF16.items():
        if kind.lower().startswith(name.lower()):
            return val
    # axon tunnels report kinds like 'TPU v5 lite chip' etc.
    for name, val in _PEAK_BF16.items():
        if name.lower() in kind.lower():
            return val
    return None


def program_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """XLA-estimated FLOPs of one invocation of a jitted function.

    NOTE: lower().compile() compiles a SECOND executable — for large
    programs prefer `compiled_flops(jitted_fn.lower(...).compile())`
    and reuse that compiled object for execution too."""
    try:
        return compiled_flops(jitted_fn.lower(*args, **kwargs).compile())
    except Exception:  # pragma: no cover - cost model availability
        return None


def compiled_flops(compiled) -> Optional[float]:
    """XLA-estimated FLOPs of an already-compiled executable."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # old jax returns per-device list
            cost = cost[0]
        return float(cost['flops'])
    except Exception:  # pragma: no cover - cost model availability
        return None


def mfu(flops_per_sec: float, device=None) -> Optional[float]:
    peak = peak_flops(device)
    if not peak:
        return None
    return flops_per_sec / peak
