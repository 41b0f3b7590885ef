"""Logging for vllm_ltr_tpu.

Behavioral counterpart of the reference's ``vllm/logger.py`` (env-configurable
logging plus an opt-in function-call tracer), re-implemented for this codebase.
"""
import datetime
import logging
import os
import sys
import threading
from functools import lru_cache

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_LOG_LEVEL = os.environ.get("LTR_TPU_LOG_LEVEL", "INFO").upper()
_DISABLE_LOGGING = os.environ.get("LTR_TPU_CONFIGURE_LOGGING", "1") == "0"


class _NewLineFormatter(logging.Formatter):
    """Adds logging prefix to newlines to align multi-line messages."""

    def format(self, record):
        msg = super().format(record)
        if record.message != "":
            parts = msg.split(record.message)
            msg = msg.replace("\n", "\r\n" + parts[0])
        return msg


_root_logger = logging.getLogger("vllm_ltr_tpu")
_default_handler = None


def _setup_logger():
    _root_logger.setLevel(logging.DEBUG)
    global _default_handler
    if _default_handler is None:
        _default_handler = logging.StreamHandler(sys.stdout)
        _default_handler.flush = sys.stdout.flush  # type: ignore
        _default_handler.setLevel(_LOG_LEVEL)
        _root_logger.addHandler(_default_handler)
    fmt = _NewLineFormatter(_FORMAT, datefmt=_DATE_FORMAT)
    _default_handler.setFormatter(fmt)
    _root_logger.propagate = False


if not _DISABLE_LOGGING:
    _setup_logger()


def init_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(_LOG_LEVEL)
    if _default_handler is not None and not logger.handlers:
        logger.addHandler(_default_handler)
    logger.propagate = False
    return logger


# ---------------------------------------------------------------------------
# Function-call tracing (analogue of VLLM_TRACE_FUNCTION, reference
# vllm/logger.py:99-119). Enabled with LTR_TPU_TRACE_FUNCTION=1.
# ---------------------------------------------------------------------------

_TRACE_DIR = os.environ.get(
    "LTR_TPU_TRACE_DIR",
    os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        "ltr_tpu",
        datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S"),
    ),
)


@lru_cache(maxsize=None)
def _trace_file_for_thread() -> str:
    os.makedirs(_TRACE_DIR, exist_ok=True)
    return os.path.join(
        _TRACE_DIR,
        f"trace_pid-{os.getpid()}_thread-{threading.get_ident()}.log",
    )


def _trace_calls(frame, event, arg=None):
    if event not in ("call", "return"):
        return _trace_calls
    try:
        code = frame.f_code
        last = frame.f_back
        where = ""
        if last is not None:
            where = f" <- {last.f_code.co_filename}:{last.f_lineno}"
        with open(_trace_file_for_thread(), "a") as f:
            ts = datetime.datetime.now().strftime("%H:%M:%S.%f")
            f.write(
                f"{ts} {event} {code.co_name} "
                f"{code.co_filename}:{frame.f_lineno}{where}\n")
    except NameError:
        # Interpreter shutting down.
        pass
    return _trace_calls


def enable_trace_function_call() -> None:
    """Install a sys.settrace call/return tracer writing per-thread logs."""
    sys.settrace(_trace_calls)


if os.environ.get("LTR_TPU_TRACE_FUNCTION", "0") == "1":
    enable_trace_function_call()
