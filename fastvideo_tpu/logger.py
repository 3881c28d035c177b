"""Process-aware logger.

Analog of /root/reference/fastvideo/logger.py: per-module loggers with a
``local_main_process_only`` switch. On TPU there is a single controller
process per host, so "rank" is the JAX process index.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = ("%(levelname)s %(asctime)s [%(filename)s:%(lineno)d] %(message)s")
_DATEFMT = "%m-%d %H:%M:%S"

_root_configured = False


def _process_index() -> int:
    # Avoid importing jax at module import time (it is heavy); the env vars
    # cover multi-host launches before jax.distributed is initialized.
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.getenv("JAX_PROCESS_INDEX", "0"))


class _FastVideoLogger(logging.LoggerAdapter):
    """Adds ``local_main_process_only`` kwarg to every logging call."""

    def log(self, level, msg, *args, local_main_process_only: bool = True,
            **kwargs):
        if local_main_process_only and _process_index() != 0:
            return
        if self.isEnabledFor(level):
            self.logger.log(level, msg, *args, **kwargs,
                            stacklevel=kwargs.pop("stacklevel", 2))

    # LoggerAdapter in older stdlibs does not forward stacklevel through
    # convenience methods; define them explicitly.
    def debug(self, msg, *args, **kwargs):
        self.log(logging.DEBUG, msg, *args, **kwargs)

    def info(self, msg, *args, **kwargs):
        self.log(logging.INFO, msg, *args, **kwargs)

    def warning(self, msg, *args, **kwargs):
        self.log(logging.WARNING, msg, *args, **kwargs)

    def error(self, msg, *args, **kwargs):
        self.log(logging.ERROR, msg, *args, **kwargs)

    def exception(self, msg, *args, **kwargs):
        kwargs.setdefault("exc_info", True)
        self.log(logging.ERROR, msg, *args, **kwargs)


def _configure_root() -> None:
    global _root_configured
    if _root_configured:
        return
    from fastvideo_tpu import envs

    root = logging.getLogger("fastvideo_tpu")
    if not root.handlers:
        # resolve sys.stderr at EMIT time, not handler-creation time: a
        # plain StreamHandler(sys.stderr) binds whatever stream happened to
        # be installed when the first module logged — under pytest's
        # capture that was a prior test's redirected stream, making any
        # later stderr assertion order-dependent (round-4 watchdog flake)
        class _StderrProxy:
            def write(self, data):
                sys.stderr.write(data)

            def flush(self):
                sys.stderr.flush()

        handler = logging.StreamHandler(_StderrProxy())
        handler.setFormatter(logging.Formatter(_FORMAT, _DATEFMT))
        root.addHandler(handler)
    root.setLevel(getattr(logging, envs.FASTVIDEO_LOGGING_LEVEL.upper(),
                          logging.INFO))
    root.propagate = False
    _root_configured = True


def init_logger(name: str) -> _FastVideoLogger:
    _configure_root()
    if not name.startswith("fastvideo_tpu"):
        name = f"fastvideo_tpu.{name}"
    return _FastVideoLogger(logging.getLogger(name), {})
