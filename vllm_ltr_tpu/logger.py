"""Logging + opt-in function-call tracing.

Behavioral counterpart of the reference's ``vllm/logger.py``: a
package-scoped console logger configured from the environment
(``LTR_TPU_LOG_LEVEL``, ``LTR_TPU_CONFIGURE_LOGGING=0`` to opt out), and a
``sys.settrace`` call/return tracer (``LTR_TPU_TRACE_FUNCTION=1``,
reference vllm/logger.py:99-119) that writes one log per pid/thread under
``LTR_TPU_TRACE_DIR``.
"""
import datetime
import logging
import os
import sys
import threading
from functools import lru_cache

_PACKAGE = "vllm_ltr_tpu"
_LEVEL = os.environ.get("LTR_TPU_LOG_LEVEL", "INFO").upper()


class _AlignedFormatter(logging.Formatter):
    """Continuation lines of a multi-line message get the same prefix as
    the first line, so block output (tables, tracebacks we emit on
    purpose) stays visually attached to its log record."""

    def format(self, record):
        rendered = super().format(record)
        body = record.getMessage()
        if "\n" not in body:
            return rendered
        head = rendered.split(body, 1)[0]
        return rendered.replace("\n", "\r\n" + head)


def _console_handler() -> logging.Handler:
    h = logging.StreamHandler(sys.stdout)
    h.flush = sys.stdout.flush  # type: ignore[method-assign]
    h.setLevel(_LEVEL)
    h.setFormatter(_AlignedFormatter(
        "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s",
        datefmt="%m-%d %H:%M:%S"))
    return h


@lru_cache(maxsize=1)
def _bootstrap() -> logging.Handler:
    root = logging.getLogger(_PACKAGE)
    root.setLevel(logging.DEBUG)
    root.propagate = False
    handler = _console_handler()
    root.addHandler(handler)
    return handler


def init_logger(name: str) -> logging.Logger:
    """Module logger wired to the package console handler."""
    log = logging.getLogger(name)
    if os.environ.get("LTR_TPU_CONFIGURE_LOGGING", "1") != "0":
        handler = _bootstrap()
        log.setLevel(_LEVEL)
        if not log.handlers:
            log.addHandler(handler)
        log.propagate = False
    return log


# ---------------------------------------------------------------------------
# Function-call tracing (LTR_TPU_TRACE_FUNCTION=1)
# ---------------------------------------------------------------------------

_TRACE_DIR = os.environ.get(
    "LTR_TPU_TRACE_DIR",
    os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "ltr_tpu",
        datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")))


@lru_cache(maxsize=None)
def _trace_sink() -> str:
    os.makedirs(_TRACE_DIR, exist_ok=True)
    return os.path.join(
        _TRACE_DIR,
        f"trace_pid-{os.getpid()}_thread-{threading.get_ident()}.log")


def _trace_calls(frame, event, arg=None):
    if event in ("call", "return"):
        try:
            code = frame.f_code
            caller = frame.f_back
            origin = (f" <- {caller.f_code.co_filename}:{caller.f_lineno}"
                      if caller is not None else "")
            stamp = datetime.datetime.now().strftime("%H:%M:%S.%f")
            with open(_trace_sink(), "a") as sink:
                sink.write(f"{stamp} {event} {code.co_name} "
                           f"{code.co_filename}:{frame.f_lineno}{origin}\n")
        except NameError:
            pass  # interpreter shutdown
    return _trace_calls


def enable_trace_function_call() -> None:
    """Install a sys.settrace call/return tracer writing per-thread logs."""
    sys.settrace(_trace_calls)


if os.environ.get("LTR_TPU_TRACE_FUNCTION", "0") == "1":
    enable_trace_function_call()
