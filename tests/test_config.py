"""Config system: reference YAMLs parse unchanged and the defaulting rules
(lr scaling, crop counting, optimizer kwargs) match the reference parsers."""

import numpy as np

from chadavit_tpu.config import Config, load_yaml, parse_knn_cfg, parse_pretrain_cfg, select

REF_YAML = "/root/reference/scripts/knn/bbbc048/dino_chada_vit_moyen.yaml"


def test_load_reference_yaml_with_composition():
    cfg = load_yaml(REF_YAML)
    assert cfg.method == "dino"
    assert cfg.backbone.name == "vit_channels"
    assert cfg.backbone.kwargs.embed_dim == 192
    # hydra defaults composition pulled in the augmentations file
    assert isinstance(cfg.augmentations, list) and len(cfg.augmentations) == 2
    assert cfg.augmentations[0]["crop_size"] == 224


def test_parse_pretrain_rules():
    cfg = load_yaml(REF_YAML)
    cfg.data.train_path = "/nonexistent"
    base_lr = cfg.optimizer.lr
    base_clf = cfg.optimizer.classifier_lr
    cfg = parse_pretrain_cfg(cfg)

    # lr scaling rule: batch 8 * 2 devices * 1 node / 256 (args/pretrain.py:204-207)
    scale = 8 * 2 * 1 / 256
    np.testing.assert_allclose(cfg.optimizer.lr, base_lr * scale)
    np.testing.assert_allclose(cfg.optimizer.classifier_lr, base_clf * scale)

    # crop counting: two pipelines, same crop_size, num_crops 1 each
    assert cfg.data.num_large_crops == 2
    assert cfg.data.num_small_crops == 0

    # optimizer kwargs defaults for lars (args/pretrain.py:220-228);
    # yaml sets clip_lr/eta/exclude explicitly, momentum defaults to 0.9
    assert cfg.optimizer.kwargs.momentum == 0.9
    assert cfg.optimizer.kwargs.clip_lr is True
    assert cfg.optimizer.kwargs.eta == 0.02

    # dino method defaults (dino.py:197-223)
    assert cfg.method_kwargs.student_temperature == 0.1
    assert cfg.method_kwargs.teacher_temperature == 0.07
    assert cfg.method_kwargs.warmup_teacher_temperature_epochs == 50
    assert cfg.data.num_classes == 7  # bbbc048

    # scheduler defaults (base.py)
    assert cfg.scheduler.warmup_epochs == 10
    assert cfg.scheduler.warmup_start_lr == 3e-5


def test_parse_knn_grid_defaults():
    cfg = load_yaml(REF_YAML)
    cfg.data.train_path = "/nonexistent"
    cfg = parse_knn_cfg(cfg)
    assert cfg.knn_eval_offline.k == [1, 2, 5, 10, 20, 50, 100, 200]
    assert cfg.knn_eval_offline.distance_function == ["cosine", "euclidean"]


def test_select_none_string():
    cfg = Config({"a": {"b": "None"}})
    assert select(cfg, "a.b", 5) is None
    assert select(cfg, "a.missing", 7) == 7
    assert cfg.a.missing == 7  # default written back


def test_args_json_roundtrip(tmp_path):
    from chadavit_tpu.config import save_args_json

    cfg = load_yaml(REF_YAML)
    p = tmp_path / "args.json"
    save_args_json(cfg, str(p))
    import json

    loaded = json.loads(p.read_text())
    assert loaded["backbone"]["kwargs"]["patch_size"] == 16


def test_b16_pod_config_parses():
    """The ChAdaViT-B/16 pod stretch config (BASELINE plan #5) parses with
    TP + device augmentation + bucketing + mid-epoch checkpoints enabled."""
    import os

    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = parse_pretrain_cfg(load_yaml(
        os.path.join(repo, "scripts", "pretrain", "dino_chada_vit_b16_pod.yaml")))
    assert cfg.backbone.kwargs["embed_dim"] == 768
    assert cfg.backbone.kwargs["num_heads"] == 12
    assert cfg.get("model_parallel") == 2
    assert cfg.get("device_augmentations") is True
    assert cfg.get("bucket_by_channels") is True
    assert cfg.checkpoint.step_frequency == 500
    assert cfg.method_kwargs.num_prototypes == 65536
    # lr scaling rule applied: 0.3 * (16 * 8 * 1) / 256
    assert abs(cfg.optimizer.lr - 0.3 * 16 * 8 / 256) < 1e-9


def test_config_zoo_parses():
    """Every shipped scripts/{knn,linear,regression}/**.yaml parses through its
    entry point's parser (the reference-schema contract,
    reference scripts/** + src/args/*)."""
    import glob
    import os

    from chadavit_tpu.config import (
        load_yaml,
        parse_knn_cfg,
        parse_linear_cfg,
        parse_regression_cfg,
    )

    root = os.path.join(os.path.dirname(__file__), "..", "scripts")
    parsers = {"knn": parse_knn_cfg, "linear": parse_linear_cfg,
               "regression": parse_regression_cfg}
    n = 0
    for kind, parser in parsers.items():
        for path in glob.glob(os.path.join(root, kind, "*", "*.yaml")):
            cfg = parser(load_yaml(path))
            assert cfg.backbone.name == "vit_channels", path
            assert cfg.data.num_classes is not None or kind == "regression", path
            n += 1
    assert n >= 11  # 5 knn + 5 linear + 2 regression (minus aug-composition files)
