"""bench.py's analytic FLOPs model — the denominator of every reported MFU.

Pins the values so an accidental edit to the cost model can't silently
inflate/deflate the benchmark's MFU numbers (BASELINE.md derivation:
~640 GFLOP per 10-channel image through one DINO step at D=192)."""

import numpy as np

from bench import model_flops_per_image


def test_flops_canonical_values():
    assert model_flops_per_image(10) == 636684017664.0          # moyen, c=10
    assert model_flops_per_image(10, d=768) == 3212963512320.0  # B/16, c=10
    assert model_flops_per_image(1) == 38338830336.0            # moyen, c=1


def test_flops_structure():
    # more channels -> superlinear (attention is quadratic in sequence)
    f = [model_flops_per_image(c) for c in range(1, 11)]
    assert all(b > a for a, b in zip(f, f[1:]))
    r_hi = f[9] / f[8]   # c=9 -> 10
    r_lo = f[1] / f[0]   # c=1 -> 2
    assert r_hi > 1.10 and r_lo > r_hi  # relative jump shrinks as c grows
    # per-channel cost rises with c: f(c)/c is increasing
    per = [fi / (i + 1) for i, fi in enumerate(f)]
    assert all(b > a for a, b in zip(per, per[1:]))
    # step = student fwd+bwd on 2 crops + teacher fwd on 2 crops = 8x one fwd
    assert np.isclose(model_flops_per_image(5) % 8, 0)
