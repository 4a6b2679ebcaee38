"""The analytic HBM-byte model for the Pallas selects (tools/roofline.py)
must agree with the ACTUAL prebuilt window tensor the kernel reads —
otherwise the published %-of-roofline figures are fiction.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from efficientlo_net_tpu.ops.pallas_select import _prebuild  # noqa: E402
from roofline import select_analytic_bytes  # noqa: E402


def _check(b, h, w, kernel, k, cstride):
    xyz = jnp.zeros((b, h, w, 3), jnp.float32)
    n_h = -(-h // cstride[0])
    n_w = -(-w // cstride[1])
    src, _, _, wc = _prebuild(xyz, kernel, cstride, (1, 1), (n_h, n_w))
    prebuilt_bytes = int(np.prod(src.shape)) * 4
    analytic = select_analytic_bytes(b, h, w, h, w, kernel, k, cstride)
    expected = (
        b * h * w * 3 * 4          # source read
        + 2 * prebuilt_bytes       # prebuilt write + kernel read
        + b * 3 * n_h * n_w * 4    # centers
        + 2 * b * k * n_h * n_w * 4  # idx + mask outputs
    )
    assert analytic == expected, (analytic, expected, src.shape)


def test_analytic_bytes_match_prebuilt_down_l0():
    _check(2, 64, 1800, (9, 15), 32, (4, 8))


def test_analytic_bytes_match_prebuilt_down_l1():
    _check(2, 16, 225, (7, 11), 32, (2, 2))


def test_analytic_bytes_match_prebuilt_cv():
    _check(2, 16, 225, (11, 41), 6, (1, 1))
