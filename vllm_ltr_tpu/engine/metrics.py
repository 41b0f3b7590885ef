"""Engine metrics: Prometheus registry + periodic local logging.

Behavioral counterpart of reference vllm/engine/metrics.py (237 LoC):
cache-usage gauges, queue depths, token-throughput counters, TTFT / TPOT /
end-to-end histograms, and a 5-second local log line.  The collector set
is declared as a spec table and built in one loop; Prometheus is optional
(local logging works without prometheus_client).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

try:
    from prometheus_client import (REGISTRY, Counter, Gauge, Histogram,
                                   disable_created_metrics)
    disable_created_metrics()
    _HAS_PROMETHEUS = True
except ImportError:  # pragma: no cover
    _HAS_PROMETHEUS = False


@dataclass
class Stats:
    """Per-step system snapshot fed to the logger."""
    now: float
    num_running: int
    num_swapped: int
    num_waiting: int
    gpu_cache_usage: float
    cpu_cache_usage: float
    num_prompt_tokens: int
    num_generation_tokens: int
    time_to_first_tokens: List[float] = field(default_factory=list)
    time_per_output_tokens: List[float] = field(default_factory=list)
    time_e2e_requests: List[float] = field(default_factory=list)
    # AUX predictor scoring calls completed this interval (seconds each);
    # scoring runs inside schedule() so this is scheduler-critical-path
    # latency.
    aux_score_times: List[float] = field(default_factory=list)


# Collector specs: (metric name, help text, Stats attribute).
_GAUGE_SPECS = [
    ("num_requests_running", "Requests currently running.", "num_running"),
    ("num_requests_swapped", "Requests swapped to host.", "num_swapped"),
    ("num_requests_waiting", "Requests waiting.", "num_waiting"),
    ("gpu_cache_usage_perc", "Device KV-cache usage (1 = full).",
     "gpu_cache_usage"),
    ("cpu_cache_usage_perc", "Host swap KV-cache usage (1 = full).",
     "cpu_cache_usage"),
]
_COUNTER_SPECS = [
    ("prompt_tokens_total", "Prefill tokens processed.",
     "num_prompt_tokens"),
    ("generation_tokens_total", "Generation tokens processed.",
     "num_generation_tokens"),
]
_HISTOGRAM_SPECS = [
    ("time_to_first_token_seconds", "Time to first token.",
     "time_to_first_tokens",
     (0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25, 0.5, 0.75,
      1.0, 2.5, 5.0, 7.5, 10.0)),
    ("time_per_output_token_seconds", "Time per output token.",
     "time_per_output_tokens",
     (0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.75, 1.0,
      2.5)),
    ("e2e_request_latency_seconds", "End-to-end request latency.",
     "time_e2e_requests",
     (1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0, 50.0, 60.0)),
    ("aux_score_seconds", "AUX predictor scoring latency per call "
     "(inside schedule(), critical path).", "aux_score_times",
     (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0)),
]
_PREFIX = "ltr_tpu:"


class Metrics:
    """Prometheus collector set, built from the spec tables."""

    def __init__(self, labelnames: List[str]):
        self.gauges = {}
        self.counters = {}
        self.histograms = {}
        if not _HAS_PROMETHEUS:
            return
        self._unregister_duplicates()
        for name, help_text, attr in _GAUGE_SPECS:
            self.gauges[attr] = Gauge(_PREFIX + name, help_text, labelnames)
        for name, help_text, attr in _COUNTER_SPECS:
            self.counters[attr] = Counter(_PREFIX + name, help_text,
                                          labelnames)
        for name, help_text, attr, buckets in _HISTOGRAM_SPECS:
            self.histograms[attr] = Histogram(_PREFIX + name, help_text,
                                              labelnames,
                                              buckets=list(buckets))

    def record(self, stats: Stats, labels: Dict[str, str]) -> None:
        if not _HAS_PROMETHEUS:
            return
        for attr, gauge in self.gauges.items():
            gauge.labels(**labels).set(getattr(stats, attr))
        for attr, counter in self.counters.items():
            counter.labels(**labels).inc(getattr(stats, attr))
        for attr, hist in self.histograms.items():
            h = hist.labels(**labels)
            for value in getattr(stats, attr):
                h.observe(value)

    @staticmethod
    def _unregister_duplicates():
        # Tests create several engines per process; drop stale collectors.
        for collector in list(REGISTRY._names_to_collectors.values()):
            if getattr(collector, "_name", "").startswith(_PREFIX):
                try:
                    REGISTRY.unregister(collector)
                except KeyError:
                    pass


class StatLogger:
    """Pushes each Stats to Prometheus and prints a rollup every
    ``local_interval`` seconds."""

    def __init__(self, local_interval: float, labels: Dict[str, str]):
        self.local_interval = local_interval
        self.labels = labels
        self.metrics = Metrics(labelnames=list(labels.keys()))
        self._mark = time.monotonic()
        self._prompt_tokens = 0
        self._generation_tokens = 0

    def log(self, stats: Stats) -> None:
        self.metrics.record(stats, self.labels)
        self._prompt_tokens += stats.num_prompt_tokens
        self._generation_tokens += stats.num_generation_tokens

        now = time.monotonic()
        window = now - self._mark
        if window < self.local_interval:
            return
        logger.info(
            "Avg prompt throughput: %.1f tokens/s, "
            "Avg generation throughput: %.1f tokens/s, "
            "Running: %d reqs, Swapped: %d reqs, Pending: %d reqs, "
            "Device KV cache usage: %.1f%%, Host KV cache usage: %.1f%%",
            self._prompt_tokens / window, self._generation_tokens / window,
            stats.num_running, stats.num_swapped, stats.num_waiting,
            stats.gpu_cache_usage * 100, stats.cpu_cache_usage * 100)
        self._mark = now
        self._prompt_tokens = 0
        self._generation_tokens = 0
