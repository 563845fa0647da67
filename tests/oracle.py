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
