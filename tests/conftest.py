"""Test config: force JAX onto CPU with 8 virtual devices (portable mesh
testing, the TPU-native analogue of multi-GPU fixtures -- see SURVEY.md §4).

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS; pin via config.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: model-init/apply compiles dominate test time
# on CPU; cache them across pytest processes.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "jax")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_setup():
    """(model, params, x) for the tiny preset -- shared across the session
    because CPU init is expensive."""
    from vmg_tpu.configs import TINY_TEST_PRESET
    from vmg_tpu.models import create_model

    model = create_model(TINY_TEST_PRESET, is_train=False)
    x = jnp.asarray(np.random.default_rng(0).random((1, 4, 64, 64, 3),
                                                    dtype=np.float32))
    params = jax.jit(model.init)(jax.random.key(0), x)
    return model, params, x
