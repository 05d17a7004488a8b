"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (mirrors the driver's
dryrun_multichip environment)."""

import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by a sitecustomize hook that registered a TPU backend;
# jax.config.update works even then (backends are initialized lazily).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_module(rel_path: str, name: str):
    """Import a reference source file by path as a parity oracle.

    Missing optional deps of the reference (ipdb, ftfy, timm, ...) are shimmed with
    minimal stand-ins so the oracle modules import on this machine.
    """
    import importlib.util

    _install_shims()
    path = os.path.join(REFERENCE_ROOT, rel_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _shim_module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _install_shims():
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = _shim_module("torchvision")
            tvt = _shim_module("torchvision.transforms")
            tvf = _shim_module("torchvision.transforms.functional")
            tvt.functional = tvf
            tv.transforms = tvt
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tvt
            sys.modules["torchvision.transforms.functional"] = tvf
    # the reference's v1/downstream modules import their siblings as
    # top-level modules; shim the two aug deps (oracle tests only exercise
    # the deterministic tensor functions)
    if "functional" not in sys.modules:
        # v1/downstream/video_transforms.py's clip-class half delegates to a
        # sibling `functional` module; the oracle tests only use the tensor
        # functions, so an empty shim suffices
        sys.modules["functional"] = _shim_module("functional")
    if "rand_augment" not in sys.modules:
        ra = _shim_module("rand_augment")
        ra.rand_augment_transform = lambda *a, **k: (lambda x: x)
        sys.modules["rand_augment"] = ra
    if "random_erasing" not in sys.modules:
        re_mod = _shim_module("random_erasing")

        class RandomErasing:  # pragma: no cover - shim
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        re_mod.RandomErasing = RandomErasing
        sys.modules["random_erasing"] = re_mod
    if "ipdb" not in sys.modules:
        ipdb = _shim_module("ipdb")
        ipdb.set_trace = lambda: None
        sys.modules["ipdb"] = ipdb
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            ftfy = _shim_module("ftfy")
            ftfy.fix_text = lambda s: s
            ftfy.ftfy = lambda s: s
            sys.modules["ftfy"] = ftfy
    if "OpenCLIP" not in sys.modules:
        openclip = _shim_module("OpenCLIP")
        oc_utils = _shim_module("OpenCLIP.utils")

        def to_2tuple(x):
            return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

        oc_utils.to_2tuple = to_2tuple
        openclip.utils = oc_utils
        sys.modules["OpenCLIP"] = openclip
        sys.modules["OpenCLIP.utils"] = oc_utils
    if "timm" not in sys.modules:
        try:
            import timm  # noqa: F401
        except ImportError:
            import torch.nn as nn

            timm = _shim_module("timm")
            models = _shim_module("timm.models")
            layers = _shim_module("timm.models.layers")

            class DropPath(nn.Identity):
                def __init__(self, *a, **k):
                    super().__init__()

            def trunc_normal_(t, std=1.0, **k):
                with __import__("torch").no_grad():
                    t.normal_(0, std)
                return t

            def to_2tuple(x):
                return (x, x) if not isinstance(x, tuple) else x

            def drop_path(x, drop_prob=0.0, training=False):
                return x

            def register_model(fn):
                return fn

            registry = _shim_module("timm.models.registry")
            registry.register_model = register_model
            layers.DropPath = DropPath
            layers.trunc_normal_ = trunc_normal_
            layers.to_2tuple = to_2tuple
            layers.drop_path = drop_path
            layers.StdConv2dSame = nn.Conv2d
            models.layers = layers
            models.registry = registry
            timm.models = models
            sys.modules["timm"] = timm
            sys.modules["timm.models"] = models
            sys.modules["timm.models.layers"] = layers
            sys.modules["timm.models.registry"] = registry
