"""Load reference (torch) model modules for numerical parity checks.

The reference package's ``fastvideo/__init__`` imports every pipeline and
third-party dep; we bypass it by registering a bare package whose __path__
points at /root/reference/fastvideo, then stub the handful of unavailable
deps (torchvision, diffusers, ...) with permissive placeholder modules.

Parity-only utility: nothing here ships in fastvideo_tpu.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys
import types

REF_ROOT = "/root/reference"


class _StubMeta(type):
    def __iter__(cls):  # enums iterated at class level, e.g. Karras list
        return iter([])

    def __getattr__(cls, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _make_stub_class(name)


def _make_stub_class(name: str):
    return _StubMeta(name, (), {"__init__": lambda self, *a, **k: None})


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        obj = _make_stub_class(name)
        setattr(self, name, obj)
        return obj


def _stub(name: str) -> None:
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        mn = ".".join(parts[:i])
        if mn not in sys.modules:
            m = _StubModule(mn)
            m.__path__ = []
            m.__spec__ = importlib.machinery.ModuleSpec(mn, None,
                                                        is_package=True)
            sys.modules[mn] = m
        if i > 1:
            setattr(sys.modules[".".join(parts[:i - 1])], parts[i - 1],
                    sys.modules[mn])


_PRE_STUBS = [
    "torchvision.utils",
    "torchvision.transforms.functional",
    "diffusers.loaders.lora_base",
    "diffusers.configuration_utils",
    "diffusers.schedulers.scheduling_utils",
    "diffusers.utils.torch_utils",
    "diffusers.models.modeling_outputs",
    "diffusers.video_processor",
    "remote_pdb",
    "ftfy",
    "wandb",
    "ray",
]

_installed = False


def _install_concrete_diffusers_stubs() -> None:
    """Working mini-implementations of the diffusers pieces the reference
    schedulers actually exercise (ConfigMixin.register_to_config etc.)."""
    import enum
    import functools
    import types as _t

    cfg_mod = _t.ModuleType("diffusers.configuration_utils")

    class _FrozenConfig(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name) from None

    class ConfigMixin:
        config_name = "scheduler_config.json"

        def register_to_config(self, **kwargs):
            if not hasattr(self, "_internal_dict"):
                self._internal_dict = _FrozenConfig()
            self._internal_dict.update(kwargs)

        @property
        def config(self):
            return getattr(self, "_internal_dict", _FrozenConfig())

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            import inspect

            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            params = {k: v for k, v in bound.arguments.items()
                      if k not in ("self", "kwargs")}
            params.update(bound.arguments.get("kwargs", {}) or {})
            ConfigMixin.register_to_config(self, **params)
            init(self, *args, **kwargs)

        return wrapper

    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    cfg_mod.FrozenDict = _FrozenConfig

    sched_mod = _t.ModuleType("diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    class KarrasDiffusionSchedulers(enum.Enum):
        pass

    sched_mod.SchedulerMixin = SchedulerMixin
    sched_mod.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    sched_mod.SchedulerOutput = _FrozenConfig

    utils_mod = _t.ModuleType("diffusers.utils")
    utils_mod.__path__ = []
    utils_mod.deprecate = lambda *a, **k: None
    utils_mod.logging = _t.SimpleNamespace(
        get_logger=lambda *a, **k: __import__("logging").getLogger("stub"))

    class BaseOutput(dict):
        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            for k, v in kwargs.items():
                setattr(self, k, v)

        def __getitem__(self, k):
            if isinstance(k, int):
                return list(self.values())[k]
            return super().__getitem__(k)

    utils_mod.BaseOutput = BaseOutput

    for name, mod in [
        ("diffusers.configuration_utils", cfg_mod),
        ("diffusers.schedulers.scheduling_utils", sched_mod),
        ("diffusers.utils", utils_mod),
    ]:
        sys.modules[name] = mod
        parent, leaf = name.rsplit(".", 1)
        _stub(parent)
        setattr(sys.modules[parent], leaf, mod)


def install() -> None:
    global _installed
    if _installed:
        return
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_concrete_diffusers_stubs()
    for name in _PRE_STUBS:
        _stub(name)
    # Bare parent package bypassing fastvideo/__init__.py (which imports the
    # whole pipeline registry and its heavy deps).
    if "fastvideo" not in sys.modules:
        pkg = types.ModuleType("fastvideo")
        pkg.__path__ = [f"{REF_ROOT}/fastvideo"]
        pkg.__spec__ = importlib.machinery.ModuleSpec(
            "fastvideo", None, is_package=True)
        pkg.__spec__.submodule_search_locations = [f"{REF_ROOT}/fastvideo"]
        sys.modules["fastvideo"] = pkg
    _installed = True


def import_ref(module: str, retries: int = 40):
    """Import a reference submodule, stubbing missing deps on demand."""
    install()
    last = None
    for _ in range(retries):
        # Clear partially-initialized reference modules from failed attempts.
        for mn in [
                m for m in sys.modules if m.startswith("fastvideo.")
                and getattr(sys.modules[m], "__file__", "") and
                not getattr(sys.modules[m], "__fv_ok__", False)
        ]:
            del sys.modules[mn]
        try:
            mod = importlib.import_module(module)
            for mn, m in sys.modules.items():
                if mn.startswith("fastvideo"):
                    m.__fv_ok__ = True
            return mod
        except ModuleNotFoundError as e:
            last = e
            _stub(e.name)
    raise last


def patch_cpu_sdpa() -> None:
    """The reference CpuPlatform declares no attention backend; route it to
    its SDPA backend so parity runs hardware-free."""
    patch = classmethod(
        lambda cls, *a, **k: "fastvideo.attention.backends.sdpa.SDPABackend")
    platforms = import_ref("fastvideo.platforms.cpu")
    platforms.CpuPlatform.get_attn_backend_cls = patch
    # the live singleton may come from an earlier module instance; patch
    # its class too so already-resolved platforms pick up the route.
    try:
        from fastvideo.platforms import current_platform

        type(current_platform).get_attn_backend_cls = patch
    except Exception:
        pass


def init_ref_distributed() -> None:
    """Single-process gloo world, as the reference's test conftest does
    (/root/reference/fastvideo/tests/conftest.py:11-23)."""
    import os

    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    # pid-derived port so concurrent pytest processes don't collide
    os.environ.setdefault("MASTER_PORT", str(20000 + os.getpid() % 20000))
    os.environ["RANK"] = "0"
    os.environ["WORLD_SIZE"] = "1"
    os.environ["LOCAL_RANK"] = "0"
    ps = import_ref("fastvideo.distributed.parallel_state")
    if not ps.model_parallel_is_initialized():
        ps.init_distributed_environment(world_size=1, rank=0, local_rank=0,
                                        backend="gloo")
        ps.initialize_model_parallel(tensor_model_parallel_size=1,
                                     sequence_model_parallel_size=1)
