"""Import the reference PyTorch implementation (read-only at /root/reference) as
a *test oracle* — we run it to generate golden outputs, never copy its code.

The reference package eagerly imports timm/omegaconf/tifffile/lightning, which
are absent here, so modules are loaded by file path under synthetic parent
packages, with the missing third-party deps stubbed."""

import importlib.util
import sys
import types

REF = "/root/reference"


def _stub(name: str, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _fake_pkg(name: str):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package
        sys.modules[name] = mod
    return sys.modules[name]


def _load(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _prepare():
    _stub("tifffile", imread=lambda *a, **k: None)
    _stub("omegaconf", OmegaConf=type("OmegaConf", (), {}), DictConfig=dict, ListConfig=list)
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.helpers", group_parameters=None)
    _stub("timm.optim")
    _stub("timm.optim.optim_factory", _layer_map=None)
    _stub("timm.models.vision_transformer", PatchEmbed=None)
    _stub("timm.models.registry", register_model=lambda f: f)
    for pkg in ("src", "src.utils", "src.backbones", "src.backbones.vit", "src.losses"):
        _fake_pkg(pkg)
    _load("src.utils.misc", f"{REF}/src/utils/misc.py")


def load_reference():
    """Returns the reference `src.backbones.vit.chada_vit` module."""
    _prepare()
    return _load("src.backbones.vit.chada_vit", f"{REF}/src/backbones/vit/chada_vit.py")


def load_reference_dino_loss():
    _prepare()
    return _load("src.losses.dino", f"{REF}/src/losses/dino.py")


def load_reference_training_pieces():
    """Load the reference's full training composition as real modules:
    DINOHead + dino_clip_gradients (``src/methods/dino.py``), LARS
    (``src/utils/lars.py``), MomentumUpdater/initialize_momentum_params
    (``src/utils/momentum.py``), LinearWarmupCosineAnnealingLR
    (``src/utils/lr_scheduler.py``), DINOLoss (``src/losses/dino.py``).

    ``src/methods/base.py`` drags in pytorch_lightning (absent here), so
    ``BaseMomentumMethod`` is stubbed with a bare ``nn.Module`` — only the
    class object is needed for ``class DINO(BaseMomentumMethod)`` to define;
    the trajectory test drives the pieces itself in the Lightning call order.
    """
    _prepare()
    import torch.nn as nn

    losses = _load("src.losses.dino", f"{REF}/src/losses/dino.py")
    momentum = _load("src.utils.momentum", f"{REF}/src/utils/momentum.py")
    lars = _load("src.utils.lars", f"{REF}/src/utils/lars.py")
    lr_sched = _load("src.utils.lr_scheduler", f"{REF}/src/utils/lr_scheduler.py")
    _fake_pkg("src.methods")
    _stub("src.methods.base", BaseMomentumMethod=type("BaseMomentumMethod", (nn.Module,), {}))
    dino = _load("src.methods.dino", f"{REF}/src/methods/dino.py")
    backbone = _load("src.backbones.vit.chada_vit", f"{REF}/src/backbones/vit/chada_vit.py")
    return types.SimpleNamespace(
        DINOLoss=losses.DINOLoss,
        MomentumUpdater=momentum.MomentumUpdater,
        initialize_momentum_params=momentum.initialize_momentum_params,
        LARS=lars.LARS,
        LinearWarmupCosineAnnealingLR=lr_sched.LinearWarmupCosineAnnealingLR,
        DINOHead=dino.DINOHead,
        DINO=dino.DINO,
        ChAdaViT=backbone.ChAdaViT,
    )
