"""Anonymous usage reporting (counterpart of reference vllm/usage/usage_lib.py).

This build runs in hermetic/zero-egress environments, so reporting is a
local-file stub: opt-out via LTR_TPU_NO_USAGE_STATS=1 (or DO_NOT_TRACK=1),
records one JSON line per engine start under ~/.config/vllm_ltr_tpu/.
Nothing ever leaves the machine.
"""
from __future__ import annotations

import json
import os
import platform
import time

from vllm_ltr_tpu.version import __version__

_USAGE_DIR = os.path.expanduser("~/.config/vllm_ltr_tpu")


def is_usage_stats_enabled() -> bool:
    return not (os.environ.get("LTR_TPU_NO_USAGE_STATS") == "1"
                or os.environ.get("DO_NOT_TRACK") == "1"
                or os.path.exists(os.path.join(_USAGE_DIR, "do_not_track")))


def report_usage(model_architecture: str, usage_context: str) -> None:
    if not is_usage_stats_enabled():
        return
    try:
        os.makedirs(_USAGE_DIR, exist_ok=True)
        record = {
            "ts": time.time(),
            "version": __version__,
            "context": usage_context,
            "arch": model_architecture,
            "platform": platform.machine(),
        }
        with open(os.path.join(_USAGE_DIR, "usage_stats.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass
