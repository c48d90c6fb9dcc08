"""FLOPs / cost accounting via XLA's compiled cost analysis.

TPU-native replacement for thop/fvcore counters
(reference ``tools/Tester.py:447-457``, ``models/vmg.py:742``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def cost_analysis(fn, *example_args) -> Dict[str, Any]:
    """Compile ``fn`` for the example args and return XLA's cost analysis
    (keys include 'flops', 'bytes accessed')."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-device list
        costs = costs[0]
    return dict(costs)


def model_flops(model, params, x) -> float:
    """Total forward FLOPs for model.apply(params, x)."""
    costs = cost_analysis(lambda p, v: model.apply(p, v), params, x)
    return float(costs.get("flops", 0.0))
