#!/usr/bin/env python
"""Generate the committed reference-format checkpoint fixture.

Produces ``tests/fixtures/ref_tiny_mine.pth`` -- a real ``torch.save``
file in the reference trainer's own container format
(``{'state_dict': {'module.<name>': tensor}}``, the DataParallel-prefixed
'mine' layout of ``tools/Trainer.py:281-289`` / ``Tester.py:311-341``) --
from the stubbed reference VMG at the golden-test tiny architecture.

Tensors are stored fp16 to keep the committed file small; the consumer
test loads the SAME fixture into both the reference torch model and the
vmg_tpu converter, so the precision of the stored values cancels out of
the parity comparison.

Deterministic (torch.manual_seed) -- regenerating produces an identical
tree; run only when the fixture needs to change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))


def main():
    import torch
    from ref_stubs import import_reference_models
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tests"))
    from test_golden_reference import _build_pair

    ref_vmg = import_reference_models()
    ref, _ = _build_pair(ref_vmg, seed=7)
    sd = {"module." + k: v.detach().to(torch.float16)
          for k, v in ref.state_dict().items()}
    out_dir = os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                           "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "ref_tiny_mine.pth")
    torch.save({"state_dict": sd, "iter": 123}, path)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, "
          f"{len(sd)} tensors)")


if __name__ == "__main__":
    main()
