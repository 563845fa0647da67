"""Eval stack: kNN vs brute-force numpy, metrics vs sklearn, probe learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _brute_force_knn(train_f, train_t, test_f, test_t, k, T, distance, num_classes):
    """Independent numpy implementation of the reference's weighted kNN
    (knn.py:95-177) to cross-check the JAX version."""
    if distance == "cosine":
        train_f = train_f / np.linalg.norm(train_f, axis=1, keepdims=True)
        test_f = test_f / np.linalg.norm(test_f, axis=1, keepdims=True)
        sims = test_f @ train_f.T
    else:
        d = np.sqrt(((test_f[:, None] - train_f[None]) ** 2).sum(-1))
        sims = 1 / (d + 1e-5)
    top1 = top5 = 0
    for i in range(len(test_t)):
        idx = np.argsort(-sims[i])[:k]
        w = np.exp(sims[i][idx] / T) if distance == "cosine" else sims[i][idx]
        probs = np.zeros(num_classes)
        for j, ws in zip(train_t[idx], w):
            probs[j] += ws
        order = np.argsort(-probs)
        top1 += order[0] == test_t[i]
        top5 += test_t[i] in order[: min(5, k)]
    n = len(test_t)
    return top1 * 100 / n, top5 * 100 / n


@pytest.mark.parametrize("distance", ["cosine", "euclidean"])
def test_knn_matches_brute_force(rng, distance):
    from chadavit_tpu.eval.knn import knn_classify

    # k large enough that every class appears among the neighbors: the ranking
    # of zero-probability classes is tie-broken arbitrarily in every
    # implementation (including the reference's torch sort), so keep probs
    # strictly positive for a deterministic comparison.
    nc, k = 8, 40
    train_f = rng.standard_normal((120, 16)).astype(np.float32)
    train_t = rng.integers(0, nc, 120).astype(np.int32)
    test_f = rng.standard_normal((37, 16)).astype(np.float32)
    test_t = rng.integers(0, nc, 37).astype(np.int32)

    got = knn_classify(train_f, train_t, test_f, test_t, k=k, T=0.07,
                       distance_fx=distance, num_classes=nc,
                       max_distance_matrix_size=2000)  # force chunking
    want = _brute_force_knn(train_f, train_t, test_f, test_t, k, 0.07, distance, nc)
    assert got[0] == pytest.approx(want[0], abs=1e-6)
    assert got[1] == pytest.approx(want[1], abs=1e-6)


def test_knn_classifier_accumulation(rng):
    from chadavit_tpu.eval.knn import WeightedKNNClassifier

    knn = WeightedKNNClassifier(k=5, num_classes=3)
    # separable clusters -> near-perfect knn
    centers = np.eye(3, 8, dtype=np.float32) * 10
    for _ in range(4):
        t = rng.integers(0, 3, 32).astype(np.int32)
        f = centers[t] + rng.standard_normal((32, 8)).astype(np.float32) * 0.1
        knn.update(train_features=f, train_targets=t)
    t = rng.integers(0, 3, 64).astype(np.int32)
    f = centers[t] + rng.standard_normal((64, 8)).astype(np.float32) * 0.1
    knn.update(test_features=f, test_targets=t)
    top1, top5 = knn.compute()
    assert top1 == 100.0


def test_metrics_vs_sklearn(rng):
    from sklearn.metrics import f1_score, precision_score, recall_score

    from chadavit_tpu.eval.metrics import accuracy_at_k, classification_suite, regression_suite

    nc = 5
    logits = rng.standard_normal((200, nc)).astype(np.float32)
    targets = rng.integers(0, nc, 200)
    suite = classification_suite(logits, targets, nc)
    preds = logits.argmax(1)
    np.testing.assert_allclose(suite["acc1"], (preds == targets).mean() * 100, rtol=1e-6)
    np.testing.assert_allclose(
        suite["precision"], precision_score(targets, preds, average="macro", zero_division=0) * 100, rtol=1e-6)
    np.testing.assert_allclose(
        suite["recall"], recall_score(targets, preds, average="macro", zero_division=0) * 100, rtol=1e-6)
    np.testing.assert_allclose(
        suite["f1"], f1_score(targets, preds, average="macro", zero_division=0) * 100, rtol=1e-5)

    from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score

    preds_r = rng.standard_normal(100)
    targets_r = preds_r * 0.5 + rng.standard_normal(100) * 0.1
    reg = regression_suite(preds_r, targets_r)
    np.testing.assert_allclose(reg["mse"], mean_squared_error(targets_r, preds_r), rtol=1e-9)
    np.testing.assert_allclose(reg["mae"], mean_absolute_error(targets_r, preds_r), rtol=1e-9)
    np.testing.assert_allclose(reg["r2"], r2_score(targets_r, preds_r), rtol=1e-9)


@pytest.mark.slow  # 39 s: multi-epoch CPU probe training — learning-dynamics tier
def test_linear_probe_learns():
    """Frozen random ChAdaViT features + linear head on labels derived from the
    features themselves -> train accuracy must climb well above chance."""
    rng = np.random.default_rng(11)  # local: convergence depends on the draw
    from flax import linen as nn

    from chadavit_tpu.eval.features import make_feature_fn
    from chadavit_tpu.eval.probe import ProbeStepConfig, make_probe_train_step
    from chadavit_tpu.models import chada_vit
    from chadavit_tpu.train.optim import build_group_tx, grouped_optimizer
    from chadavit_tpu.train.state import ProbeState

    model = chada_vit(patch_size=16, embed_dim=32, return_all_tokens=False,
                      max_number_channels=3, img_size=32, depth=2, num_heads=2)
    images = rng.random((64, 3, 32, 32)).astype(np.float32)
    counts = np.full((64,), 3, np.int32)
    bparams = model.init(jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(counts))["params"]

    feature_fn = make_feature_fn(model, "multi_channels", img_channels=3)
    feats = np.asarray(feature_fn(bparams, jnp.asarray(images), jnp.asarray(counts)))
    w_true = rng.standard_normal((feats.shape[1], 3)).astype(np.float32)
    labels = (feats @ w_true).argmax(1).astype(np.int32)

    clf = nn.Dense(3)
    cparams = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, feats.shape[1])))["params"]

    tx = grouped_optimizer(
        {"all": build_group_tx("adamw", lambda c: 0.05, 0.0)},
        {"backbone": jax.tree.map(lambda _: "all", bparams),
         "classifier": jax.tree.map(lambda _: "all", cparams)},
    )
    params = {"backbone": bparams, "classifier": cparams}
    state = ProbeState.create(bparams, cparams, tx.init(params))

    step = jax.jit(make_probe_train_step(
        feature_fn, lambda p, f: clf.apply({"params": p}, f), tx,
        ProbeStepConfig(finetune=False, num_classes=3),
    ))
    batch = {"images": jnp.asarray(images), "channel_counts": jnp.asarray(counts),
             "labels": jnp.asarray(labels)}
    accs = []
    for i in range(150):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        accs.append(float(metrics["acc1"]))
    assert accs[-1] > 90.0, accs[-5:]
    # frozen backbone unchanged
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.backbone)[0]),
        np.asarray(jax.tree.leaves(bparams)[0]),
    )


def test_regression_probe_learns(rng):
    from flax import linen as nn

    from chadavit_tpu.eval.probe import ProbeStepConfig, make_probe_train_step
    from chadavit_tpu.train.optim import build_group_tx, grouped_optimizer
    from chadavit_tpu.train.state import ProbeState

    feats_fixed = rng.standard_normal((128, 16)).astype(np.float32)
    w = rng.standard_normal((16,)).astype(np.float32)
    targets = feats_fixed @ w

    def feature_fn(bparams, images, counts):
        return images  # identity: images already are features here

    clf = nn.Dense(1)
    cparams = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    tx = grouped_optimizer(
        {"all": build_group_tx("adamw", lambda c: 0.05, 0.0)},
        {"backbone": {}, "classifier": jax.tree.map(lambda _: "all", cparams)},
    )
    params = {"backbone": {}, "classifier": cparams}
    state = ProbeState.create({}, cparams, tx.init(params))
    step = jax.jit(make_probe_train_step(
        feature_fn, lambda p, f: clf.apply({"params": p}, f), tx,
        ProbeStepConfig(finetune=False, task="regression", num_classes=1),
    ))
    batch = {"images": jnp.asarray(feats_fixed), "channel_counts": jnp.zeros((128,), jnp.int32),
             "labels": jnp.asarray(targets)}
    losses = []
    for i in range(100):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])


def test_one_channel_strategy_features(rng):
    """`one_channel`: a plain 1-channel ViT runs per channel plane; features
    concatenate to (B, c*D) (reference base.py:538-543, linear.py:400-427)."""
    from chadavit_tpu.eval.features import features_dim, make_feature_fn
    from chadavit_tpu.models import vit_ultra_tiny

    model = vit_ultra_tiny(img_size=32, in_chans=1)
    imgs = rng.random((4, 3, 32, 32)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:, :1]))["params"]

    fn = make_feature_fn(model, "one_channel", img_channels=3)
    feats = np.asarray(fn(params, jnp.asarray(imgs), jnp.full((4,), 3)))
    assert feats.shape == (4, 3 * 32)
    assert feats.shape[1] == features_dim("one_channel", 32, model.num_patches, 3, False)

    # per-plane consistency: plane 1 of image 0 embeds like a 1-channel forward
    single = np.asarray(model.apply({"params": params}, jnp.asarray(imgs[0:1, 1:2])))
    np.testing.assert_allclose(feats[0, 32:64], single[0], rtol=1e-5, atol=1e-5)


def test_layer_decay_scales_updates():
    """Layer-wise lr decay (reference linear.py:290-303): with plain SGD the
    update ratio between block 0 and the final norm equals decay^depth, and
    embeddings get decay^(depth+1)."""
    import optax

    from chadavit_tpu.eval.probe import layer_decay_scales
    from chadavit_tpu.train.optim import build_group_tx, scale_updates_by_path

    decay, depth = 0.75, 4
    params = {
        "patch_embed": {"kernel": jnp.ones((4, 4))},
        "blocks_0": {"w": jnp.ones((4, 4))},
        "blocks_3": {"w": jnp.ones((4, 4))},
        "norm": {"scale": jnp.ones((4,))},
    }
    key_scales = layer_decay_scales(params, decay, depth)
    assert key_scales["blocks_0"] == pytest.approx(decay ** depth)
    assert key_scales["blocks_3"] == pytest.approx(decay ** (depth - 3))
    assert key_scales["patch_embed"] == pytest.approx(decay ** (depth + 1))
    assert key_scales["norm"] == 1.0

    tx = optax.chain(build_group_tx("sgd", lambda c: 1.0, 0.0),
                     scale_updates_by_path(key_scales))
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    ratio = float(updates["blocks_0"]["w"][0, 0] / updates["norm"]["scale"][0])
    assert ratio == pytest.approx(decay ** depth)


def test_build_probe_layer_decay_wired():
    """main_linear.build_probe must apply layer_decay (the config key used to
    be parsed and dropped): block-0 updates shrink by ~decay^depth vs norm."""
    from chadavit_tpu.config import Config
    from chadavit_tpu.models import chada_vit
    from main_linear import build_probe

    model = chada_vit(patch_size=16, embed_dim=32, return_all_tokens=False,
                      max_number_channels=2, img_size=32, depth=2, num_heads=2)
    rng = np.random.default_rng(0)
    images = rng.random((8, 2, 32, 32)).astype(np.float32)
    counts = np.full((8,), 2, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(counts))["params"]

    cfg = Config({
        "backbone": {"name": "vit_channels",
                     "kwargs": {"embed_dim": 32, "depth": 2, "max_number_channels": 2,
                                "return_all_tokens": False}},
        "data": {"dataset": "synthetic", "num_classes": 3, "img_channels": 2},
        "optimizer": {"name": "sgd", "lr": 1.0, "weight_decay": 0.0,
                      "classifier_lr": 1.0, "batch_size": 8, "kwargs": {}},
        "scheduler": {"warmup_epochs": 0, "warmup_start_lr": 0.0, "min_lr": 0.0},
        "max_epochs": 1,
        "finetune": True,
        "layer_decay": 0.5,
        "channels_strategy": "multi_channels",
        "mixed_channels": True,
    })
    state, train_step, _ = build_probe(cfg, model, params, steps_per_epoch=1)
    batch = {"images": jnp.asarray(images), "channel_counts": jnp.asarray(counts),
             "labels": jnp.asarray(np.zeros(8, np.int32))}
    before = jax.tree.map(np.asarray, state.backbone)
    state, _ = train_step(state, batch, jax.random.PRNGKey(0))
    after = jax.tree.map(np.asarray, state.backbone)

    def delta_norm(key):
        b = jax.tree.leaves(before[key]); a = jax.tree.leaves(after[key])
        return float(sum(np.abs(x - y).sum() for x, y in zip(a, b)))

    d0, d_norm = delta_norm("blocks_0"), delta_norm("norm")
    assert d0 > 0 and d_norm > 0
    # blocks_0 scaled by 0.5^2=0.25; relative to the unscaled final norm the
    # aggregate update mass must clearly shrink (not exact: different params)
    s0 = sum(np.abs(x).sum() for x in jax.tree.leaves(before["blocks_0"]))
    sn = sum(np.abs(x).sum() for x in jax.tree.leaves(before["norm"]))
    assert (d0 / max(float(s0), 1e-9)) < (d_norm / max(float(sn), 1e-9))
