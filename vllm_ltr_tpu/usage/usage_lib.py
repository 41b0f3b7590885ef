"""Anonymous usage reporting (counterpart of reference vllm/usage/usage_lib.py).

The reference posts one JSON record per engine start to a collection
endpoint from a background thread (usage_lib.py:27-40, UsageMessage).
This build targets hermetic/zero-egress deployments, so the transport is
a local JSONL spool instead: one record per engine start under
``~/.config/vllm_ltr_tpu/usage_stats.jsonl``; a deployment that wants
central collection ships the spool with its log pipeline.  The COLLECTED
FIELDS match the reference (hardware, platform, model arch, engine
context, version) so downstream dashboards can stay schema-compatible.

Opt-out: ``LTR_TPU_NO_USAGE_STATS=1``, ``DO_NOT_TRACK=1``, or touch
``~/.config/vllm_ltr_tpu/do_not_track``.  Nothing ever leaves the machine.
"""
from __future__ import annotations

import json
import os
import platform
import threading
import time
from typing import Any, Dict, Optional

from vllm_ltr_tpu.version import __version__

_USAGE_DIR = os.path.expanduser("~/.config/vllm_ltr_tpu")


def is_usage_stats_enabled() -> bool:
    return not (os.environ.get("LTR_TPU_NO_USAGE_STATS") == "1"
                or os.environ.get("DO_NOT_TRACK") == "1"
                or os.path.exists(os.path.join(_USAGE_DIR, "do_not_track")))


def _cloud_provider() -> Optional[str]:
    """Env-only detection (no network): the reference probes metadata
    servers; zero-egress builds rely on the env markers those platforms
    set anyway."""
    if os.environ.get("TPU_WORKER_ID") or os.environ.get("TPU_NAME"):
        return "GCP-TPU"
    if os.path.exists("/sys/class/dmi/id/product_name"):
        try:
            with open("/sys/class/dmi/id/product_name") as f:
                name = f.read().strip().lower()
            if "google" in name:
                return "GCP"
            if "amazon" in name:
                return "AWS"
        except OSError:
            pass
    return None


def _hardware_facts() -> Dict[str, Any]:
    facts: Dict[str, Any] = {
        "provider": _cloud_provider(),
        "architecture": platform.machine(),
        "platform": platform.platform(),
        "num_cpu": os.cpu_count(),
    }
    try:
        facts["total_memory"] = (os.sysconf("SC_PAGE_SIZE") *
                                 os.sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError):
        pass
    try:
        import jax
        devices = jax.devices()
        facts["device_count"] = len(devices)
        facts["device_type"] = devices[0].device_kind if devices else None
        facts["jax_backend"] = jax.default_backend()
    except Exception:
        pass
    return facts


def report_usage(model_architecture: str,
                 usage_context: str,
                 extra_kvs: Optional[Dict[str, Any]] = None) -> None:
    """Spool one usage record; fire-and-forget from a daemon thread (the
    reference's background-thread pattern) so engine startup never blocks
    on the filesystem."""
    if not is_usage_stats_enabled():
        return
    record = {
        "ts": time.time(),
        "version": __version__,
        "context": usage_context,
        "model_architecture": model_architecture,
        "source": os.environ.get("LTR_TPU_USAGE_SOURCE", "production"),
    }
    record.update(_hardware_facts())
    if extra_kvs:
        record.update(extra_kvs)
    threading.Thread(target=_write, args=(record, ), daemon=True).start()


def _write(record: Dict[str, Any]) -> None:
    try:
        os.makedirs(_USAGE_DIR, exist_ok=True)
        with open(os.path.join(_USAGE_DIR, "usage_stats.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass
