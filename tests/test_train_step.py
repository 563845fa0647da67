"""End-to-end DINO train step on the virtual 8-device CPU mesh: DP and DP+TP
shardings must produce the same math as a single-device run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chadavit_tpu.parallel.mesh import make_mesh
from chadavit_tpu.train.pretrain import DinoPretrainSpec, build_dino, synthetic_dino_batch

TINY = dict(
    backbone_kwargs=dict(embed_dim=64, patch_size=16, return_all_tokens=False,
                         max_number_channels=4, depth=2, num_heads=2),
    img_size=32,
    max_channels=4,
    proj_hidden_dim=32,
    proj_output_dim=16,
    num_prototypes=64,
    steps_per_epoch=2,
    max_epochs=4,
    warmup_epochs=1,
    clip_grad=3.0,
    freeze_last_layer=1,
    warmup_teacher_temperature_epochs=2,
)


def _run_steps(mesh, batch, n=3, seed=0, fsdp=False):
    spec = DinoPretrainSpec(**TINY)
    state, step, _, _ = build_dino(spec, mesh=mesh, rng=jax.random.PRNGKey(seed),
                                   fsdp=fsdp)
    metrics_hist = []
    for _ in range(n):
        state, metrics = step(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    return state, metrics_hist


def test_dino_step_runs_and_learns():
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    spec = DinoPretrainSpec(**TINY)
    batch = synthetic_dino_batch(spec, batch_size=8)
    state, hist = _run_steps(mesh, batch, n=4)

    assert all(np.isfinite(m["dino_loss"]) for m in hist)
    assert float(state.step) == 4
    # center moved away from zero
    assert float(jnp.linalg.norm(state.center)) > 0
    # teacher params differ from student (EMA with tau<1 after updates)
    s_leaf = jax.tree.leaves(state.student)[0]
    t_leaf = jax.tree.leaves(state.teacher)[0]
    assert not np.allclose(np.asarray(s_leaf), np.asarray(t_leaf))
    # tau follows the cosine schedule from base_tau
    assert hist[0]["tau"] == pytest.approx(0.9995, abs=1e-6)
    # teacher temp warming up: epoch 0 -> warmup value
    assert hist[0]["teacher_temp"] == pytest.approx(0.04, abs=1e-6)


def test_dp_matches_single_device():
    spec = DinoPretrainSpec(**TINY)
    batch = synthetic_dino_batch(spec, batch_size=8)

    mesh1 = make_mesh(n_model=1, devices=jax.devices()[:1])
    mesh8 = make_mesh(n_model=1)
    _, h1 = _run_steps(mesh1, batch, n=2)
    _, h8 = _run_steps(mesh8, batch, n=2)

    for m1, m8 in zip(h1, h8):
        assert m1["dino_loss"] == pytest.approx(m8["dino_loss"], rel=1e-4)


def test_tp_matches_single_device():
    spec = DinoPretrainSpec(**TINY)
    batch = synthetic_dino_batch(spec, batch_size=8)

    mesh1 = make_mesh(n_model=1, devices=jax.devices()[:1])
    mesh_tp = make_mesh(n_model=2)  # 4-way data x 2-way tensor parallel
    _, h1 = _run_steps(mesh1, batch, n=2)
    _, htp = _run_steps(mesh_tp, batch, n=2)

    for m1, mtp in zip(h1, htp):
        assert m1["dino_loss"] == pytest.approx(mtp["dino_loss"], rel=1e-4)


def test_fsdp_matches_single_device_and_shards_state():
    """FSDP (ZeRO-3 over the data axis): identical training math AND smaller
    per-device param/teacher/optimizer footprint than replicated DP."""
    import math

    spec = DinoPretrainSpec(**TINY)
    batch = synthetic_dino_batch(spec, batch_size=8)

    mesh1 = make_mesh(n_model=1, devices=jax.devices()[:1])
    mesh8 = make_mesh(n_model=1)
    _, h1 = _run_steps(mesh1, batch, n=2)
    state_f, hf = _run_steps(mesh8, batch, n=2, fsdp=True)
    for m1, mf in zip(h1, hf):
        assert m1["dino_loss"] == pytest.approx(mf["dino_loss"], rel=1e-4)

    def per_device_bytes(tree):
        return sum(
            math.prod(leaf.sharding.shard_shape(leaf.shape)) * leaf.dtype.itemsize
            for leaf in jax.tree.leaves(tree) if hasattr(leaf, "sharding"))

    state_dp, _ = _run_steps(mesh8, batch, n=0)
    for part in ("student", "teacher", "opt_state"):
        assert per_device_bytes(getattr(state_f, part)) < \
            per_device_bytes(getattr(state_dp, part)), part
    # large leaves shard to 1/8; small ones (biases, norms) stay replicated,
    # so the whole tree lands strictly between 1/8 and 1x
    assert per_device_bytes(state_f.student) < 0.5 * per_device_bytes(state_dp.student)


def test_fsdp_composes_with_tp():
    """DP(4)xTP(2) + FSDP: the TP rule claims its dim, FSDP shards the largest
    remaining divisible dim; the training math is unchanged."""
    spec = DinoPretrainSpec(**TINY)
    batch = synthetic_dino_batch(spec, batch_size=8)

    mesh1 = make_mesh(n_model=1, devices=jax.devices()[:1])
    mesh_tp = make_mesh(n_model=2)
    _, h1 = _run_steps(mesh1, batch, n=2)
    state_ftp, hftp = _run_steps(mesh_tp, batch, n=2, fsdp=True)
    for m1, mf in zip(h1, hftp):
        assert m1["dino_loss"] == pytest.approx(mf["dino_loss"], rel=1e-4)
    # an FFN kernel carries BOTH axes: model (TP rule) + data (FSDP)
    from chadavit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    k = state_ftp.student["backbone"]["blocks_0"]["linear1"]["kernel"]
    spec_axes = [a for a in k.sharding.spec if a is not None]
    assert MODEL_AXIS in spec_axes and DATA_AXIS in spec_axes


def test_prototype_freeze_then_update():
    """Prototype layer grads are zeroed for epoch < freeze_last_layer and start
    updating afterwards (reference dino.py:367-376)."""
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    spec = DinoPretrainSpec(**TINY)  # steps_per_epoch=2, freeze_last_layer=1
    batch = synthetic_dino_batch(spec, batch_size=8)
    state, step, _, _ = build_dino(spec, mesh=mesh)
    v0 = np.asarray(jax.device_get(state.student["head"]["last_layer_v"]))

    state, _ = step(state, batch)  # step 0, epoch 0: frozen
    state, _ = step(state, batch)  # step 1, epoch 0: frozen
    v_frozen = np.asarray(jax.device_get(state.student["head"]["last_layer_v"]))
    np.testing.assert_array_equal(v_frozen, v0)

    state, _ = step(state, batch)  # step 2, epoch 1: training
    v_after = np.asarray(jax.device_get(state.student["head"]["last_layer_v"]))
    assert not np.array_equal(v_after, v0)


def test_seed_determinism():
    """Same seed + same data -> bitwise-identical first-step loss."""
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    spec = DinoPretrainSpec(**TINY)
    batch = synthetic_dino_batch(spec, batch_size=4)
    losses = []
    for _ in range(2):
        state, step, _, _ = build_dino(spec, mesh=mesh, rng=jax.random.PRNGKey(7))
        _, m = step(state, batch)
        losses.append(float(m["dino_loss"]))
    assert losses[0] == losses[1]


@pytest.mark.slow  # ~18 s compile: variant-backbone step compile
def test_dino_one_channel_backbone():
    """DINO pretraining with the `one_channel` strategy: a plain 1-channel ViT
    applied per channel plane (reference base.py:538-543 with vit_* backbones)."""
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    spec = DinoPretrainSpec(
        backbone="vit_ultra_tiny",
        backbone_kwargs=dict(patch_size=16),
        img_size=32, max_channels=3, img_channels=3,
        channels_strategy="one_channel", mixed_channels=False,
        proj_hidden_dim=32, proj_output_dim=16, num_prototypes=64,
        steps_per_epoch=2, max_epochs=2, warmup_epochs=0,
    )
    state, step, _, _ = build_dino(spec, mesh=mesh)
    batch = synthetic_dino_batch(spec, batch_size=4)
    batch["channel_counts"] = jnp.full((4,), 3, jnp.int32)  # fixed 3 channels
    state, m = step(state, batch)
    assert np.isfinite(float(m["dino_loss"]))


@pytest.mark.slow  # ~10 s compile: variant-backbone step compile
def test_dino_rgb_backbone():
    """DINO pretraining with a fixed-channel (RGB-style) plain ViT."""
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    spec = DinoPretrainSpec(
        backbone="vit_ultra_tiny",
        backbone_kwargs=dict(patch_size=16),
        img_size=32, max_channels=3, img_channels=3,
        channels_strategy=None, mixed_channels=False,
        proj_hidden_dim=32, proj_output_dim=16, num_prototypes=64,
        steps_per_epoch=2, max_epochs=2, warmup_epochs=0,
    )
    state, step, _, _ = build_dino(spec, mesh=mesh)
    batch = synthetic_dino_batch(spec, batch_size=4)
    batch["channel_counts"] = jnp.full((4,), 3, jnp.int32)
    state, m = step(state, batch)
    assert np.isfinite(float(m["dino_loss"]))


def _per_device_bytes(tree) -> int:
    """Bytes held by ONE device for every array in the pytree (shard-local)."""
    import math

    total = 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "sharding"):
            continue
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        total += math.prod(shard_shape) * leaf.dtype.itemsize
    return total


def test_tp_shards_params_and_optimizer_state():
    """TP must shrink per-device PARAM and OPTIMIZER bytes, not just activations
    (a replicated opt_state would make TP useless for memory). Uses a ViT-Base
    shaped backbone so the sharded matmuls dominate."""
    base = dict(TINY)
    base["backbone_kwargs"] = dict(embed_dim=768, patch_size=16, return_all_tokens=False,
                                   max_number_channels=2, depth=2, num_heads=12)
    base["max_channels"] = 2
    base["img_size"] = 32
    spec = DinoPretrainSpec(**base)

    mesh_dp = make_mesh(n_model=1)
    mesh_tp = make_mesh(n_model=2)
    state_dp, _, _, _ = build_dino(spec, mesh=mesh_dp, rng=jax.random.PRNGKey(0))
    state_tp, _, _, _ = build_dino(spec, mesh=mesh_tp, rng=jax.random.PRNGKey(0))

    p_dp = _per_device_bytes(state_dp.student)
    p_tp = _per_device_bytes(state_tp.student)
    o_dp = _per_device_bytes(state_dp.opt_state)
    o_tp = _per_device_bytes(state_tp.opt_state)

    # the sharded FFN/QKV/head matmuls dominate a ViT-Base layer; expect a
    # substantial (not necessarily exactly 2x) per-device reduction
    assert p_tp < 0.75 * p_dp, (p_tp, p_dp)
    assert o_tp < 0.75 * o_dp, (o_tp, o_dp)


@pytest.mark.slow  # 115 s: multi-step CPU training — learning-dynamics tier
def test_online_classifier_learns_and_leaves_dino_unchanged():
    """Labeled non-mixed pretrain: the online classifier (detached feats, own
    param group — reference base.py:233,561-563) climbs above chance, while
    backbone/head updates are IDENTICAL to a run without the classifier."""
    # slow backbone (stable features) + fast classifier; schedule spans the test
    base = dict(TINY, optimizer="sgd", lr=1e-4, max_epochs=40,
                optimizer_kwargs={"momentum": 0.9})
    spec_off = DinoPretrainSpec(**base)
    spec_on = DinoPretrainSpec(**base, num_classes=3, online_classifier=True,
                               momentum_classifier=True, classifier_lr=0.1)

    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    batch_on = synthetic_dino_batch(spec_on, batch_size=16, seed=3)
    batch_off = {k: v for k, v in batch_on.items() if k != "labels"}

    s_off, step_off, _, _ = build_dino(spec_off, mesh=mesh, rng=jax.random.PRNGKey(0))
    s_on, step_on, _, _ = build_dino(spec_on, mesh=mesh, rng=jax.random.PRNGKey(0))

    accs = []
    for _ in range(60):
        s_off, m_off = step_off(s_off, batch_off)
        s_on, m_on = step_on(s_on, batch_on)
        accs.append(float(m_on["train_acc1"]))
    assert "momentum_acc1" in m_on

    # classifier learned the (fixed) batch labels
    assert accs[-1] > 66.0, accs[-5:]
    # DINO dynamics untouched: backbone params identical with/without classifier
    b_off = jax.tree.leaves(s_off.student["backbone"])
    b_on = jax.tree.leaves(s_on.student["backbone"])
    for a, b in zip(b_off, b_on):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m_on["dino_loss"]) == pytest.approx(float(m_off["dino_loss"]), abs=1e-6)


@pytest.mark.slow  # ~10 s compile: composition covered by test_fsdp_composes_with_tp + test_grad_accumulation_matches_big_batch
def test_tp_with_grad_accumulation():
    """TP mesh + optax.MultiSteps together: two micro-steps == one optimizer
    step, EMA fires once, and state stays sharded + finite."""
    spec = DinoPretrainSpec(**TINY, accumulate_grad_batches=2)
    mesh = make_mesh(n_model=2)
    state, step, _, _ = build_dino(spec, mesh=mesh, rng=jax.random.PRNGKey(0))
    batch = synthetic_dino_batch(spec, batch_size=8)

    t0 = np.asarray(jax.tree.leaves(state.teacher)[0])
    state, m1 = step(state, batch)          # micro-step 1: no opt step
    t1 = np.asarray(jax.tree.leaves(state.teacher)[0])
    np.testing.assert_array_equal(t0, t1)   # EMA not fired yet
    state, m2 = step(state, batch)          # micro-step 2: opt step + EMA
    t2 = np.asarray(jax.tree.leaves(state.teacher)[0])
    assert not np.array_equal(t1, t2), "EMA must fire on the sync micro-step"
    assert np.isfinite(float(m2["dino_loss"]))
    # params remain sharded over the model axis after the update
    sharded = [x for x in jax.tree.leaves(state.student)
               if hasattr(x, "sharding") and
               "model" in getattr(x.sharding, "spec", ()) .__repr__()]
    assert sharded, "no student param carries a model-axis sharding"


@pytest.mark.slow  # ~29 s compile: fused-augment path also exercised by the entry-point smokes
def test_fused_augment_step():
    """build_dino(device_augmentations=...) compiles augmentation into the
    step: raw uint8 batches go in, the loss is finite, the step is
    deterministic in (state, batch, rng), and distinct rngs give distinct
    augmented views (hence losses)."""
    spec = DinoPretrainSpec(**TINY)
    augs = [
        {"crop_size": 32, "num_crops": 1,
         "rrc": {"enabled": True, "crop_min_scale": 0.3, "crop_max_scale": 1.0},
         "horizontal_flip": {"prob": 0.5}},
        {"crop_size": 32, "num_crops": 1,
         "rrc": {"enabled": True, "crop_min_scale": 0.3, "crop_max_scale": 1.0},
         "horizontal_flip": {"prob": 0.5}},
    ]
    mesh = make_mesh(n_model=1)
    rng0 = jax.random.PRNGKey(0)

    def fresh():
        return build_dino(spec, mesh=mesh, rng=jax.random.PRNGKey(3),
                          device_augmentations=augs)

    rngg = np.random.default_rng(0)
    imgs = jnp.asarray(rngg.integers(0, 255, (8, 4, 32, 32), dtype=np.uint8))
    counts = jnp.asarray(rngg.integers(1, 5, (8,)), jnp.int32)
    batch = lambda r: {"images": imgs, "channel_counts": counts, "rng": r}

    state, step, _, _ = fresh()
    state, m1 = step(state, batch(rng0))
    l1 = float(m1["dino_loss"])
    assert np.isfinite(l1)

    # determinism: same rng -> same loss (fresh state; the jitted step donates)
    state2, step2, _, _ = fresh()
    _, m1b = step2(state2, batch(rng0))
    assert float(m1b["dino_loss"]) == pytest.approx(l1, rel=1e-6)

    # different augmentation rng -> different views -> different loss
    state3, step3, _, _ = fresh()
    _, m2 = step3(state3, batch(jax.random.PRNGKey(1)))
    assert float(m2["dino_loss"]) != pytest.approx(l1, rel=1e-7)


def test_classifier_out_of_range_labels_are_invalid():
    """Targets outside [0, num_classes) must not poison the classifier
    metrics (a mis-inferred num_classes produced NaN class loss before)."""
    spec = DinoPretrainSpec(**TINY, num_classes=3, online_classifier=True)
    mesh = make_mesh(n_model=1)
    state, step, _, _ = build_dino(spec, mesh=mesh, rng=jax.random.PRNGKey(0))
    batch = synthetic_dino_batch(spec, batch_size=8)
    batch["labels"] = jnp.asarray([0, 1, 2, 7, -1, 2, 9, 1], jnp.int32)
    state, m = step(state, batch)
    for k in ("train_class_loss", "train_acc1", "train_acc5", "dino_loss"):
        assert np.isfinite(float(m[k])), (k, float(m[k]))


def test_composed_trajectory_matches_torch_oracle(rng):
    """The COMPOSED reference optimization — LARS (lars.py:112-167) + per-param
    backbone clip (dino.py:249-261) + prototype freeze (dino.py:367-376) +
    per-step LinearWarmupCosineAnnealingLR (base.py:448-459) + EMA teacher with
    cosine tau (momentum.py:73-87, base.py:1250-1276) + DINOLoss EMA centering
    (losses/dino.py:104-118) — run for 20 steps in torch with identical init
    and batches must be tracked by the JAX train_step: losses, center norm and
    param norms to ~1e-4 relative (VERDICT r3 next-round item #2).

    Every piece is the REAL reference module (tests/oracle.py
    load_reference_training_pieces); the loop replays Lightning's call order:
    training_step -> backward -> on_after_backward (clip+freeze) ->
    optimizer.step -> scheduler.step -> on_train_batch_end (EMA, then
    update_tau(global_step)).
    """
    torch = pytest.importorskip("torch")
    from functools import partial
    from types import SimpleNamespace

    from chadavit_tpu.models import chada_vit, densify_one_channel_batch
    from chadavit_tpu.models.dino_head import DINOHead as JDINOHead
    from chadavit_tpu.models.import_torch import (chada_vit_params_from_torch,
                                                  dino_head_params_from_torch)
    from chadavit_tpu.train.dino_step import DinoStepConfig, make_dino_train_step
    from chadavit_tpu.train.optim import build_group_tx
    from chadavit_tpu.train.schedules import warmup_cosine_lr
    from chadavit_tpu.train.state import DinoState

    from .oracle import load_reference_training_pieces

    ref = load_reference_training_pieces()

    # CMAX must be 10: the reference's forward always tokenizes with the
    # DEFAULT max_channels=10 (chada_vit.py:219,274) and skips channel tokens
    # whenever self.max_channels != 10 — parity only exists on the canonical
    # configuration (the JAX model documents the quirk, chada_vit.py:373-376)
    IMG, PATCH, D, DEPTH, HEADS, CMAX = 32, 16, 32, 2, 2, 10
    P, HID, BTL = 32, 64, 16
    B, N_STEPS, SPE = 4, 20, 5  # 4 "epochs" of 5 steps
    COUNTS = [1, 3, 2, 3]
    LR, WARM, W_START, MIN_LR, WD = 0.2, 5, 0.02, 0.001, 1e-4
    CLIP, FREEZE = 0.005, 1
    BASE_TAU, FINAL_TAU = 0.99, 1.0
    WT_TEMP, T_TEMP, WT_EPOCHS, N_EPOCHS = 0.04, 0.07, 2, 4

    # ---- torch side: real reference modules, Lightning call order ----
    torch.manual_seed(0)
    t_backbone = ref.ChAdaViT(img_size=[IMG], patch_size=PATCH, embed_dim=D,
                              depth=DEPTH, num_heads=HEADS,
                              return_all_tokens=False, max_number_channels=CMAX)
    t_head = ref.DINOHead(in_dim=D, num_prototypes=P, use_bn=False,
                          norm_last_layer=True, hidden_dim=HID, bottleneck_dim=BTL)
    t_mbackbone = ref.ChAdaViT(img_size=[IMG], patch_size=PATCH, embed_dim=D,
                               depth=DEPTH, num_heads=HEADS,
                               return_all_tokens=False, max_number_channels=CMAX)
    t_mhead = ref.DINOHead(in_dim=D, num_prototypes=P, use_bn=False,
                           norm_last_layer=True, hidden_dim=HID, bottleneck_dim=BTL)
    ref.initialize_momentum_params(t_backbone, t_mbackbone)
    ref.initialize_momentum_params(t_head, t_mhead)
    t_loss = ref.DINOLoss(num_prototypes=P, warmup_teacher_temp=WT_TEMP,
                          teacher_temp=T_TEMP, warmup_teacher_temp_epochs=WT_EPOCHS,
                          num_epochs=N_EPOCHS, student_temp=0.1,
                          num_large_crops=2, center_momentum=0.9)
    opt = ref.LARS(list(t_backbone.parameters()) + list(t_head.parameters()),
                   lr=LR, momentum=0.9, weight_decay=WD, eta=1e-3,
                   clip_lr=False, exclude_bias_n_norm=True)
    sched = ref.LinearWarmupCosineAnnealingLR(
        opt, warmup_epochs=WARM, max_epochs=N_STEPS,
        warmup_start_lr=W_START, eta_min=MIN_LR)
    updater = ref.MomentumUpdater(base_tau=BASE_TAU, final_tau=FINAL_TAU)

    # ---- JAX side: identical init via the torch->flax importers ----
    jmodel = chada_vit(img_size=IMG, patch_size=PATCH, embed_dim=D, depth=DEPTH,
                       num_heads=HEADS, return_all_tokens=False,
                       max_number_channels=CMAX)
    bb_sd = {k: v.detach().numpy() for k, v in t_backbone.state_dict().items()}
    head_sd = {k: v.detach().numpy() for k, v in t_head.state_dict().items()}
    student = {"backbone": chada_vit_params_from_torch(bb_sd, depth=DEPTH),
               "head": dino_head_params_from_torch(head_sd)}
    # materialize REAL copies NOW: .numpy() views share torch storage (and on
    # the CPU backend jnp.asarray is zero-copy, so it would keep the alias);
    # the torch optimizer mutates params in place before the first jitted
    # step would otherwise convert its (lazy) numpy leaves
    student = jax.tree.map(lambda x: np.array(x, copy=True), student)
    jhead = JDINOHead(in_dim=D, num_prototypes=P, use_bn=False,
                      norm_last_layer=True, hidden_dim=HID, bottleneck_dim=BTL)
    lr_sched = partial(warmup_cosine_lr, base_lr=LR, total_steps=N_STEPS,
                       warmup_steps=WARM, warmup_start_lr=W_START, min_lr=MIN_LR)
    tx = build_group_tx("lars", lr_sched, WD, {"eta": 1e-3, "momentum": 0.9})
    state = DinoState.create(student, tx.init(student), P)
    cfg = DinoStepConfig(
        num_large_crops=2, student_temp=0.1, base_lr=LR, warmup_steps=WARM,
        warmup_start_lr=W_START, min_lr=MIN_LR, warmup_teacher_temp=WT_TEMP,
        teacher_temp=T_TEMP, warmup_teacher_temp_epochs=WT_EPOCHS,
        center_momentum=0.9, clip_grad=CLIP, freeze_last_layer=FREEZE,
        base_tau=BASE_TAU, final_tau=FINAL_TAU, total_steps=N_STEPS,
        steps_per_epoch=SPE)
    step = jax.jit(make_dino_train_step(
        lambda p, x, cc: jmodel.apply({"params": p}, x, cc),
        lambda p, f: jhead.apply({"params": p}, f), tx, cfg))

    # ---- identical batches: two independent views per step ----
    def flat_views(step_i):
        r = np.random.default_rng(100 + step_i)
        return [r.standard_normal((sum(COUNTS), 1, IMG, IMG)).astype(np.float32)
                for _ in range(2)]

    def t_forward(module_b, module_h, flat):
        feats = module_b(torch.from_numpy(flat), index=0,
                         list_num_channels=[COUNTS])
        return module_h(feats)

    t_hist, j_hist = [], []
    for t in range(N_STEPS):
        epoch = t // SPE
        views = flat_views(t)

        # torch: student/teacher fwd (crop-major cat), loss, backward
        t_loss.epoch = epoch  # on_train_epoch_start (dino.py:263-265)
        z_s = torch.cat([t_forward(t_backbone, t_head, v) for v in views])
        with torch.no_grad():
            z_t = torch.cat([t_forward(t_mbackbone, t_mhead, v) for v in views])
        loss = t_loss(z_s, z_t)
        opt.zero_grad()
        loss.backward()
        # on_after_backward (dino.py:367-376)
        ref.DINO.dino_clip_gradients(SimpleNamespace(backbone=t_backbone), CLIP)
        if epoch < FREEZE:
            for p in t_head.last_layer.parameters():
                p.grad = None
        opt.step()
        sched.step()
        # on_train_batch_end (base.py:1250-1276): EMA with cur_tau, then
        # update_tau at the incremented global step
        updater.update(t_backbone, t_mbackbone)
        updater.update(t_head, t_mhead)
        updater.update_tau(cur_step=t + 1, max_steps=N_STEPS)
        t_hist.append((float(loss), float(torch.norm(t_loss.center))))

        # JAX: the single fused step on the densified same views
        dense = [densify_one_channel_batch(v, COUNTS, max_channels=CMAX)
                 for v in views]
        crops = jnp.stack([jnp.asarray(d[0]) for d in dense])
        state, m = step(state, {"crops": crops,
                                "channel_counts": jnp.asarray(dense[0][1])})
        j_hist.append((float(m["dino_loss"]), float(m["center_norm"])))

    for t, ((tl, tc), (jl, jc)) in enumerate(zip(t_hist, j_hist)):
        assert jl == pytest.approx(tl, rel=2e-4), (t, tl, jl)
        assert jc == pytest.approx(tc, rel=2e-4), (t, tc, jc)

    # end-of-trajectory state: student + teacher global param norms
    def t_gnorm(mod):
        return float(torch.sqrt(sum((p ** 2).sum() for p in mod.parameters())))

    def j_gnorm(tree):
        return float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float64) ** 2)
                                  for x in jax.tree.leaves(tree))))

    assert j_gnorm(state.student["backbone"]) == pytest.approx(t_gnorm(t_backbone), rel=1e-4)
    assert j_gnorm(state.student["head"]) == pytest.approx(t_gnorm(t_head), rel=1e-4)
    assert j_gnorm(state.teacher["backbone"]) == pytest.approx(t_gnorm(t_mbackbone), rel=1e-4)
    assert j_gnorm(state.teacher["head"]) == pytest.approx(t_gnorm(t_mhead), rel=1e-4)
