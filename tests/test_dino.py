"""DINO loss + head parity against torch oracles, and schedule math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chadavit_tpu.losses.dino import dino_loss_and_center, teacher_temp_schedule
from chadavit_tpu.models.dino_head import DINOHead
from chadavit_tpu.models.import_torch import dino_head_params_from_torch

from .oracle import load_reference_dino_loss


def test_dino_loss_parity(rng):
    torch = pytest.importorskip("torch")
    ref_mod = load_reference_dino_loss()

    P, B = 64, 8
    student = rng.standard_normal((2 * B, P)).astype(np.float32)
    teacher = rng.standard_normal((2 * B, P)).astype(np.float32)

    ref_loss_mod = ref_mod.DINOLoss(
        num_prototypes=P, warmup_teacher_temp=0.04, teacher_temp=0.07,
        warmup_teacher_temp_epochs=10, num_epochs=100, student_temp=0.1,
    )
    ref_loss_mod.epoch = 3
    ref_center0 = ref_loss_mod.center.clone().numpy()
    ref_loss = ref_loss_mod(torch.from_numpy(student), torch.from_numpy(teacher)).item()
    ref_center1 = ref_loss_mod.center.numpy()

    temp = teacher_temp_schedule(3, 0.04, 0.07, 10)
    loss, center1 = dino_loss_and_center(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(ref_center0), temp,
        student_temp=0.1, num_large_crops=2,
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(center1), ref_center1, rtol=1e-5, atol=1e-6)


def test_teacher_temp_schedule_matches_linspace():
    import numpy as np

    sched = np.concatenate([np.linspace(0.04, 0.07, 10), np.ones(90) * 0.07])
    for e in [0, 1, 5, 9, 10, 50, 99]:
        got = float(teacher_temp_schedule(e, 0.04, 0.07, 10))
        np.testing.assert_allclose(got, sched[e], rtol=1e-6)
    # no warmup
    np.testing.assert_allclose(float(teacher_temp_schedule(0, 0.04, 0.07, 0)), 0.07)


def test_dino_head_parity_vs_torch(rng):
    """Build an equivalent torch head (Linear/GELU/normalize/weight_norm, per the
    documented reference architecture dino.py:32-111) and compare numerics."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as F

    in_dim, hidden, bottleneck, P = 192, 128, 32, 64
    torch.manual_seed(0)
    mlp = tnn.Sequential(
        tnn.Linear(in_dim, hidden), tnn.GELU(),
        tnn.Linear(hidden, hidden), tnn.GELU(),
        tnn.Linear(hidden, bottleneck),
    )
    last = tnn.utils.weight_norm(tnn.Linear(bottleneck, P, bias=False))
    last.weight_g.data.fill_(1)

    x = rng.standard_normal((5, in_dim)).astype(np.float32)
    with torch.no_grad():
        h = mlp(torch.from_numpy(x))
        h = F.normalize(h, dim=-1)
        ref = last(h).numpy()

    sd = {("mlp." + k): v for k, v in mlp.state_dict().items()}
    sd.update({("last_layer." + k): v for k, v in last.state_dict().items()})
    params = dino_head_params_from_torch(sd)

    head = DINOHead(in_dim=in_dim, num_prototypes=P, hidden_dim=hidden,
                    bottleneck_dim=bottleneck, use_bn=False, norm_last_layer=True)
    out = head.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_dino_loss_sharded_center_matches_global(rng):
    """psum-based centering under shard_map == single-device global computation."""
    from jax.sharding import Mesh, PartitionSpec as PS
    from jax import shard_map

    P, B = 32, 16
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    student = rng.standard_normal((2 * B, P)).astype(np.float32)
    teacher = rng.standard_normal((2 * B, P)).astype(np.float32)
    center = np.zeros((1, P), np.float32)
    temp = jnp.asarray(0.07)

    loss_g, center_g = dino_loss_and_center(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(center), temp
    )

    # shard the batch: each device holds B/4 rows of each crop. Crop-major
    # layout means we shard each crop chunk separately then re-concat.
    def shard_crop_major(x):
        crops = np.split(x, 2)
        return np.stack(crops, 0)  # (2, B, P)

    s2, t2 = shard_crop_major(student), shard_crop_major(teacher)

    def local_fn(s, t, c):
        s = jnp.concatenate(list(s), axis=0)
        t = jnp.concatenate(list(t), axis=0)
        loss, new_c = dino_loss_and_center(s, t, c, temp, axis_name="data")
        return jax.lax.pmean(loss, "data"), new_c

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(PS(None, "data"), PS(None, "data"), PS()),
        out_specs=(PS(), PS()),
    )
    loss_s, center_s = fn(jnp.asarray(s2), jnp.asarray(t2), jnp.asarray(center))

    np.testing.assert_allclose(float(loss_s), float(loss_g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(center_s), np.asarray(center_g), rtol=1e-5, atol=1e-7)
