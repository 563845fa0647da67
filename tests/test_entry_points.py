"""End-to-end entry-point smoke tests on synthetic data (CPU)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-CLI smokes: dozens of tiny-mesh compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SMOKE = os.path.join(REPO, "scripts", "smoke")


def test_main_pretrain_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import main_pretrain

    main_pretrain.main([
        "--config-path", SMOKE, "--config-name", "dino_synthetic",
        "max_steps=3", "data.size=32",
    ])


def test_main_knn_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import main_knn

    main_knn.main(["--config-path", SMOKE, "--config-name", "knn_synthetic"])
    csv_path = tmp_path / "knn-smoke_knn_offline_eval.csv"
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("Feature Type,Distance Function,k,T")
    assert len(lines) == 3  # header + k in {1, 5} x cosine x one T


def test_main_linear_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import main_linear

    main_linear.main([
        "--config-path", SMOKE, "--config-name", "linear_synthetic", "max_steps=4",
    ])
    assert (tmp_path / "linear-smoke_confusion_matrix.png").exists()


def test_probe_checkpoint_and_auto_resume(tmp_path, monkeypatch):
    """The probe loop saves per-epoch checkpoints and auto-resumes at epoch
    granularity (reference main_linear.py:198-214 wires Checkpointer +
    AutoResumer into the probes, not just pretrain)."""
    monkeypatch.chdir(tmp_path)
    import io
    from contextlib import redirect_stdout

    import main_linear
    from chadavit_tpu.cli import apply_overrides, load_cfg
    from chadavit_tpu.config import parse_linear_cfg

    def make_cfg(*extra):
        cfg = load_cfg(["--config-path", SMOKE, "--config-name",
                        "linear_synthetic"])
        apply_overrides(cfg, [
            "checkpoint.enabled=true", "auto_resume.enabled=true",
            f"checkpoint.dir={tmp_path}/ckpts", "max_epochs=2", *extra,
        ])
        return parse_linear_cfg(cfg)

    # first run: max_steps stops it exactly at the end of epoch 0 (4 steps of
    # 64/16); max_steps is not a SHOULD_MATCH key, so the resume still matches
    main_linear.run_probe(make_cfg("max_steps=4"))
    run_dir = next((tmp_path / "ckpts" / "linear").iterdir())
    assert any("-ep=0" in p.name for p in run_dir.iterdir())

    # second run: resumes from ep=0 and trains only epoch 1
    buf = io.StringIO()
    with redirect_stdout(buf):
        main_linear.run_probe(make_cfg())
    assert "auto-resumed probe" in buf.getvalue()
    assert "at epoch 1" in buf.getvalue()


def test_main_regression_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import main_regression

    main_regression.main([
        "--config-path", SMOKE, "--config-name", "linear_synthetic",
        "max_steps=4", "name=regression-smoke",
    ])


def test_main_attn_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from PIL import Image

    img_path = tmp_path / "cell.png"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((40, 40)) * 255).astype(np.uint8)).save(img_path)

    import main_attn

    main_attn.main([
        "--config-path", SMOKE, "--config-name", "knn_synthetic",
        f"image_path={img_path}", "output_dir=attn_out", "patch_size=16",
        "name=attn-smoke", "threshold=0.6",
    ])
    assert (tmp_path / "attn_out" / "attn-mean.png").exists()
    assert (tmp_path / "attn_out" / "attn-head0.png").exists()
    # masked-overlay exports (reference main_attn.py:207-265)
    assert (tmp_path / "attn_out" / "img.png").exists()
    assert (tmp_path / "attn_out" / "mask_th0.6_head0.png").exists()


def test_main_umap_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import main_umap

    main_umap.main([
        "--config-path", SMOKE, "--config-name", "knn_synthetic",
        "name=umap-smoke", "data.size=48",
    ])
    assert (tmp_path / "umap-smoke_umap.png").exists()


def test_checkpoint_and_auto_resume(tmp_path, monkeypatch):
    """DINO pretrain saves per-epoch checkpoints; a fresh run with the same
    config auto-resumes from the newest one (reference auto_resumer contract)."""
    monkeypatch.chdir(tmp_path)
    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    def make_cfg():
        cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
        apply_overrides(cfg, [
            "checkpoint.enabled=true", "auto_resume.enabled=true",
            f"checkpoint.dir={tmp_path}/ckpts", "data.size=32", "max_epochs=2",
        ])
        return parse_pretrain_cfg(cfg)

    # first run: one epoch's worth of steps, checkpoint saved, then stop
    run_dino_pretrain(make_cfg(), max_steps=2)
    ckpt_root = tmp_path / "ckpts" / "dino"
    runs = list(ckpt_root.iterdir())
    assert len(runs) == 1
    ckpts = [p for p in runs[0].iterdir() if "-ep=" in p.name]
    assert len(ckpts) == 1

    # second run with the SAME config (all SHOULD_MATCH keys equal) resumes
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_dino_pretrain(make_cfg())
    assert "auto-resumed" in buf.getvalue()


def test_main_pretrain_device_augmentations(tmp_path, monkeypatch):
    """The on-device (DALI-equivalent) augmentation path trains end-to-end."""
    monkeypatch.chdir(tmp_path)
    import main_pretrain

    main_pretrain.main([
        "--config-path", SMOKE, "--config-name", "dino_synthetic",
        "max_steps=3", "data.size=32", "device_augmentations=true",
    ])


def test_host_mem_guard_checkpoints_and_reexecs(tmp_path, monkeypatch):
    """When process RSS crosses the guard threshold mid-run, the loop saves a
    step checkpoint and re-execs the process (fresh device client); auto-resume
    then continues at that exact step. Guard rationale: leaky PJRT-over-RPC
    clients retain every uploaded batch (~34 MB/step measured), OOM-killing
    multi-hour runs (see train/loop.py::_host_mem_guard)."""
    monkeypatch.chdir(tmp_path)
    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train import loop as loop_mod
    from chadavit_tpu.utils import misc as misc_mod

    calls = []

    def fake_exec(*a):  # faithful to execv: never returns
        calls.append(a)
        raise SystemExit(98)

    monkeypatch.setattr(misc_mod, "_EXEC", fake_exec)
    # rss reads: guard-construction baseline, then per-log checks — report a
    # huge "grown" value from the second read on so the growth condition holds
    reads = iter([10 * 2**20])
    fake_rss = lambda: next(reads, 4 * 2**30)  # noqa: E731
    monkeypatch.setattr(misc_mod, "host_rss_bytes", fake_rss)
    monkeypatch.setattr(loop_mod, "host_rss_bytes", fake_rss)  # metric line

    cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
    apply_overrides(cfg, [
        "checkpoint.enabled=true", "auto_resume.enabled=true",
        f"checkpoint.dir={tmp_path}/ckpts", "data.size=32", "max_epochs=1",
        "log_every=2", "host_mem_guard_mb=1024",  # 1 GiB << fake 4 GiB rss
    ])
    with pytest.raises(SystemExit):
        loop_mod.run_dino_pretrain(parse_pretrain_cfg(cfg))

    assert calls, "guard should have invoked the re-exec hook"
    exe, argv = calls[0]
    assert exe == sys.executable and argv[0] == sys.executable
    run_dir = next((tmp_path / "ckpts" / "dino").iterdir())
    assert any("-step=" in p.name for p in run_dir.iterdir()), \
        "guard must checkpoint the exact step before re-exec"


def test_main_pretrain_validation_knn_and_ssl_loss(tmp_path, monkeypatch):
    """Online kNN validation + SSL val loss run at epoch end."""
    monkeypatch.chdir(tmp_path)
    import io
    from contextlib import redirect_stdout

    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
    apply_overrides(cfg, ["data.size=32", "max_epochs=1", "ssl_val_loss=true",
                          "knn_eval.enabled=true", "knn_eval.k=3"])
    metrics = run_dino_pretrain(parse_pretrain_cfg(cfg))
    assert "val_knn_top1" in metrics and metrics["val_knn_top1"] >= 0
    assert "dino_loss_val" in metrics and np.isfinite(metrics["dino_loss_val"])


def test_knn_reconstructs_model_from_args_json(tmp_path, monkeypatch):
    """Eval entry points rebuild the backbone config from the checkpoint's
    args.json sidecar (reference main_knn.py:181-196)."""
    monkeypatch.chdir(tmp_path)
    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
    apply_overrides(cfg, ["checkpoint.enabled=true", f"checkpoint.dir={tmp_path}/ck",
                          "data.size=32", "max_epochs=1"])
    run_dino_pretrain(parse_pretrain_cfg(cfg), max_steps=2)
    run_dir = next((tmp_path / "ck" / "dino").iterdir())
    ckpt = next(p for p in run_dir.iterdir() if "-ep=" in p.name)

    import main_knn

    # deliberately WRONG embed_dim in the eval yaml: the training run's
    # args.json must win (it defines the architecture matching the weights)
    main_knn.main([
        "--config-path", SMOKE, "--config-name", "knn_synthetic",
        f"pretrained_feature_extractor={ckpt}",
        "backbone.kwargs.embed_dim=999",  # corrected by args.json reconstruction
        "name=knn-args-smoke",
    ])
    assert (tmp_path / "knn-args-smoke_knn_offline_eval.csv").exists()


def test_knn_from_torch_lightning_ckpt(tmp_path, monkeypatch):
    """The FULL eval path from a torch Lightning checkpoint: encoder.-prefixed
    state dict -> remap/qkv-split import -> feature extraction -> kNN CSV
    (VERDICT r3 item #6; reference HOW_TO_USE cells 8-26 / main_knn.py flow)."""
    torch = pytest.importorskip("torch")
    monkeypatch.chdir(tmp_path)
    tests_dir = os.path.join(REPO, "tests")
    if tests_dir not in sys.path:
        sys.path.insert(0, tests_dir)
    from oracle import load_reference

    ref = load_reference()
    torch.manual_seed(3)
    tmodel = ref.ChAdaViT(img_size=[32], patch_size=16, embed_dim=32, depth=2,
                          num_heads=2, return_all_tokens=False,
                          max_number_channels=10)
    sd = {("encoder." + k): v for k, v in tmodel.state_dict().items()}
    ckpt = tmp_path / "lightning.ckpt"
    torch.save({"state_dict": sd, "epoch": 11}, ckpt)

    import main_knn

    main_knn.main([
        "--config-path", SMOKE, "--config-name", "knn_synthetic",
        f"pretrained_feature_extractor={ckpt}",
        "backbone.kwargs.embed_dim=32", "backbone.kwargs.max_number_channels=10",
        "name=knn-torch-ckpt",
    ])
    csv_path = tmp_path / "knn-torch-ckpt_knn_offline_eval.csv"
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 3
    for row in lines[1:]:  # top1/top5 parse and are valid percentages
        cells = row.split(",")
        top1, top5 = float(cells[-2]), float(cells[-1])
        assert 0.0 <= top1 <= 100.0 and 0.0 <= top5 <= 100.0


def test_main_pretrain_model_parallel(tmp_path, monkeypatch):
    """model_parallel: 2 runs the full loop over a (data=4, model=2) mesh."""
    monkeypatch.chdir(tmp_path)
    import main_pretrain

    main_pretrain.main([
        "--config-path", SMOKE, "--config-name", "dino_synthetic",
        "max_steps=2", "data.size=32", "model_parallel=2",
    ])


def test_main_attn_plain_vit(tmp_path, monkeypatch):
    """Attention export with a plain ViT backbone (the one_channel path,
    reference main_attn.py:135)."""
    monkeypatch.chdir(tmp_path)
    from PIL import Image

    rng = np.random.default_rng(1)
    img_path = tmp_path / "x.png"
    Image.fromarray((rng.random((48, 48)) * 255).astype(np.uint8)).save(img_path)

    import main_attn

    main_attn.main([
        "--config-path", SMOKE, "--config-name", "knn_synthetic",
        "backbone.name=vit_ultra_tiny",
        "backbone.kwargs={'patch_size': 16, 'img_size': 32}",
        "channels_strategy=one_channel",
        f"image_path={img_path}", "output_dir=attn_vit", "name=attn-vit",
    ])
    assert (tmp_path / "attn_vit" / "attn-mean.png").exists()


def test_mid_epoch_preemption_resume_exact(tmp_path, monkeypatch):
    """Kill the loop mid-epoch, resume, and land on EXACTLY the metrics of an
    uninterrupted run (deterministic loader order + step-indexed rng)."""
    monkeypatch.chdir(tmp_path)
    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    def make_cfg(ckpt_dir):
        cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
        apply_overrides(cfg, [
            "checkpoint.enabled=true", "auto_resume.enabled=true",
            f"checkpoint.dir={ckpt_dir}", "data.size=32", "max_epochs=2",
            "device_augmentations=true",
        ])
        return parse_pretrain_cfg(cfg)

    # uninterrupted reference run (own checkpoint dir so B can't resume from it)
    full = run_dino_pretrain(make_cfg(f"{tmp_path}/full"))

    # interrupted run: stop after 3 steps (mid-epoch: 4 steps/epoch), resume
    run_dino_pretrain(make_cfg(f"{tmp_path}/pre"), max_steps=3)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        resumed = run_dino_pretrain(make_cfg(f"{tmp_path}/pre"))
    assert "auto-resumed" in buf.getvalue() and "step 3" in buf.getvalue()
    assert resumed["dino_loss"] == pytest.approx(full["dino_loss"], abs=1e-5), (
        resumed["dino_loss"], full["dino_loss"])


def test_preemption_resume_exact_under_fsdp(tmp_path, monkeypatch):
    """Mid-epoch resume is exact with FSDP-sharded state too: orbax saves the
    gathered tree and restores into the data-axis-sharded template."""
    monkeypatch.chdir(tmp_path)
    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    def make_cfg(ckpt_dir):
        cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
        apply_overrides(cfg, [
            "checkpoint.enabled=true", "auto_resume.enabled=true",
            f"checkpoint.dir={ckpt_dir}", "data.size=32", "max_epochs=2",
            "fsdp=true", "device_augmentations=true",
        ])
        return parse_pretrain_cfg(cfg)

    full = run_dino_pretrain(make_cfg(f"{tmp_path}/full"))
    run_dino_pretrain(make_cfg(f"{tmp_path}/pre"), max_steps=3)
    resumed = run_dino_pretrain(make_cfg(f"{tmp_path}/pre"))
    assert resumed["dino_loss"] == pytest.approx(full["dino_loss"], abs=1e-5), (
        resumed["dino_loss"], full["dino_loss"])


def test_sigusr1_checkpoints_and_exits(tmp_path, monkeypatch):
    """SIGUSR1 (the reference's SLURM requeue signal) checkpoints at the
    current step and exits the loop cleanly."""
    monkeypatch.chdir(tmp_path)
    import os as _os
    import signal
    import threading

    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
    apply_overrides(cfg, [
        "checkpoint.enabled=true", f"checkpoint.dir={tmp_path}/ckpts",
        "data.size=32", "max_epochs=50",
    ])
    cfg = parse_pretrain_cfg(cfg)

    timer = threading.Timer(1.0, lambda: _os.kill(_os.getpid(), signal.SIGUSR1))
    timer.start()
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_dino_pretrain(cfg)  # returns early on the signal, not after 50 epochs
    timer.cancel()
    assert "preemption signal" in buf.getvalue()
    runs = list((tmp_path / "ckpts" / "dino").iterdir())
    step_ckpts = [p for p in runs[0].iterdir() if "-step=" in p.name]
    assert step_ckpts, "no mid-epoch step checkpoint written"


def test_auto_umap_training_callback(tmp_path, monkeypatch):
    """auto_umap.enabled writes umap_ep={N}.png into the run dir at each
    validation epoch (reference AutoUMAP callback)."""
    monkeypatch.chdir(tmp_path)
    from chadavit_tpu.cli import apply_overrides
    from chadavit_tpu.config import load_yaml, parse_pretrain_cfg
    from chadavit_tpu.train.loop import run_dino_pretrain

    cfg = load_yaml(os.path.join(SMOKE, "dino_synthetic.yaml"))
    apply_overrides(cfg, [
        "checkpoint.enabled=true", f"checkpoint.dir={tmp_path}/ckpts",
        "data.size=32", "max_epochs=1", "auto_umap.enabled=true",
    ])
    run_dino_pretrain(parse_pretrain_cfg(cfg))
    runs = list((tmp_path / "ckpts" / "dino").iterdir())
    pngs = list(runs[0].glob("umap_ep=*.png"))
    assert pngs, "AutoUMAP produced no figure"


def test_common_compound_overlay(tmp_path):
    """plot_common_compounds colors only compounds shared by both datasets."""
    from chadavit_tpu.utils.auto_umap import plot_common_compounds

    rng = np.random.default_rng(0)
    emb = rng.random((40, 2)).astype(np.float32)
    dataset_idx = np.array([0] * 20 + [1] * 20)
    compound_idx = np.concatenate([np.arange(20) % 5, np.arange(20) % 7])
    base = str(tmp_path / "common")
    plot_common_compounds(emb, dataset_idx, compound_idx, base)
    assert os.path.exists(base + ".png")
