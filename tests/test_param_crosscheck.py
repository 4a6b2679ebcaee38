"""Architecture parity: every variable of the trained reference graph
(`/root/reference/pretrained_model/pretrained_model.ckpt.index`) must map
bijectively onto our full-res Flax parameters with identical shapes.

Uses shapes only (the reference data blob is missing upstream); the check is
pure `eval_shape`, no compute.
"""

import os

import pytest

REFERENCE_INDEX = "/root/reference/pretrained_model/pretrained_model.ckpt.index"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_INDEX),
    reason="reference checkpoint index not present",
)


def test_param_inventory_matches_reference():
    pytest.importorskip("tensorflow")
    from tools.param_crosscheck import crosscheck

    result = crosscheck()
    assert result["mismatches"] == [], result["mismatches"]
    assert result["missing_ref"] == [], result["missing_ref"]
    assert result["missing_ours"] == [], result["missing_ours"]
    assert result["unmapped_ref"] == [], result["unmapped_ref"]
    assert result["unmapped_ours"] == [], result["unmapped_ours"]
    # full bijection: 561 reference model variables <-> 561 of our leaves
    assert result["n_checked"] == result["n_ref"] == result["n_ours"] == 561
