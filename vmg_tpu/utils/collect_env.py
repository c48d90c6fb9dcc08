"""Runtime-environment report (reference ``mmedit/utils/collect_env.py``).

The reference collects CUDA/torch build facts through mmcv; the TPU-native
equivalent reports the JAX/XLA stack and the device topology instead —
the facts that determine reproducibility here (platform, device kinds,
process/mesh layout, library versions, compiler flags).
"""

from __future__ import annotations

import os
import platform
import subprocess
import sys


def _git_hash(repo_dir: str | None = None) -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo_dir or os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=5,
        )
        if out.returncode == 0:
            return out.stdout.strip()[:7]
    except Exception:
        pass
    return "unknown"


def collect_env(devices: bool = True) -> dict:
    """Ordered dict of environment facts.

    ``devices=False`` skips ``jax.devices()`` — device discovery can block
    on an unreachable remote backend, and callers that only want host
    facts (e.g. log headers written before backend init) should not pay
    that.
    """
    import jax
    import vmg_tpu

    info: dict = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "CPU": platform.processor() or platform.machine(),
        "vmg_tpu": f"{vmg_tpu.__version__}+{_git_hash()}",
        "jax": jax.__version__,
    }
    for mod in ("jaxlib", "flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            m = __import__(mod)
            for part in mod.split(".")[1:]:
                m = getattr(m, part)
            info[mod] = getattr(m, "__version__", "?")
        except Exception:
            info[mod] = "not installed"
    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "LIBTPU_INIT_ARGS",
                "PALLAS_AXON_TPU_GEN"):
        if os.environ.get(var):
            info[var] = os.environ[var]
    if devices:
        try:
            devs = jax.devices()
            info["backend"] = jax.default_backend()
            info["num_devices"] = len(devs)
            info["num_processes"] = jax.process_count()
            kinds = sorted({d.device_kind for d in devs})
            info["device_kind"] = ", ".join(kinds)
        except Exception as e:  # backend unreachable — report, don't die
            info["backend"] = f"unavailable ({type(e).__name__})"
    return info


if __name__ == "__main__":
    for name, val in collect_env().items():
        print(f"{name}: {val}")
