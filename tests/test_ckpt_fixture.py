"""Committed reference-format .pth fixture -> converter -> forward parity.

The golden suite proves conversion from in-memory state dicts; this test
eats an actual ``torch.save`` FILE in the reference trainer's container
format (``tests/fixtures/ref_tiny_mine.pth``, generated once by
``tools/make_ckpt_fixture.py``), covering the full file path of
``tools/Tester.py:311-373``: container unwrap ('mine' with DataParallel
'module.' prefixes, plus the 'ST' and 'KAIR' containers saved round-trip
through torch.save in-test), layout transforms, and a forward-pass parity
check against the reference model loaded from the SAME file.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vmg_tpu.ckpt.torch_convert import (  # noqa: E402
    convert_torch_state_dict,
    normalize_torch_checkpoint,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ref_tiny_mine.pth")


@pytest.fixture(scope="module")
def fixture_ckpt():
    return torch.load(FIXTURE, map_location="cpu", weights_only=True)


def test_fixture_unwraps_and_converts(fixture_ckpt):
    sd = normalize_torch_checkpoint(fixture_ckpt, "mine")
    assert not any(k.startswith("module.") for k in sd)
    params = convert_torch_state_dict(
        {k: v.float() for k, v in sd.items()}, strict=True)
    n_leaves = len(jax.tree.leaves(params))
    assert n_leaves > 200, n_leaves


def test_container_formats_agree(fixture_ckpt, tmp_path):
    """'mine'/'ST'/'KAIR' containers (Tester.py:311-373) through real
    torch.save files all produce the identical converted tree."""
    base = normalize_torch_checkpoint(fixture_ckpt, "mine")
    st_path = tmp_path / "st.pth"
    kair_path = tmp_path / "kair.pth"
    torch.save({"state_dict": {"generator." + k: v for k, v in base.items()},
                "meta": {}}, st_path)
    torch.save({"params": dict(base)}, kair_path)

    ref = convert_torch_state_dict(
        {k: v.float() for k, v in base.items()}, strict=True)
    for path, source in ((st_path, "ST"), (kair_path, "KAIR")):
        ck = torch.load(path, map_location="cpu", weights_only=True)
        sd = normalize_torch_checkpoint(ck, source)
        got = convert_torch_state_dict(
            {k: v.float() for k, v in sd.items()}, strict=True)
        a, b = jax.tree.leaves(ref), jax.tree.leaves(got)
        assert len(a) == len(b)
        for va, vb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.slow
def test_fixture_forward_parity(fixture_ckpt):
    """Reference model loaded FROM THE FILE vs vmg_tpu loaded through the
    converter FROM THE SAME FILE: same forward, 2e-4 abs."""
    from ref_stubs import import_reference_models
    from test_golden_reference import _build_pair

    ref_vmg = import_reference_models()
    ref, mine = _build_pair(ref_vmg, seed=7)
    sd = {k: v.float() for k, v in
          normalize_torch_checkpoint(fixture_ckpt, "mine").items()}
    ref.load_state_dict(sd)
    ref.eval()

    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(sd,
                                                                strict=True))
    rng = np.random.default_rng(11)
    x = rng.random((1, 4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(mine.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
