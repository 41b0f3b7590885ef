"""Engine metrics: Prometheus registry + periodic local logging.

Behavioral counterpart of reference ``vllm/engine/metrics.py`` (237 LoC):
cache usage gauges, queue depths, token throughput counters, TTFT/TPOT/e2e
histograms, 5-second local log summaries. Prometheus is optional — without
``prometheus_client`` installed, local logging still works.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

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
    """Per-step system snapshot."""
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


class Metrics:

    def __init__(self, labelnames: List[str]):
        if not _HAS_PROMETHEUS:
            return
        self._unregister_duplicates()
        self.gauge_scheduler_running = Gauge(
            "ltr_tpu:num_requests_running",
            "Number of requests currently running.", labelnames)
        self.gauge_scheduler_swapped = Gauge(
            "ltr_tpu:num_requests_swapped",
            "Number of requests swapped to host.", labelnames)
        self.gauge_scheduler_waiting = Gauge(
            "ltr_tpu:num_requests_waiting",
            "Number of requests waiting.", labelnames)
        self.gauge_gpu_cache_usage = Gauge(
            "ltr_tpu:gpu_cache_usage_perc",
            "Device KV-cache usage (1 = full).", labelnames)
        self.gauge_cpu_cache_usage = Gauge(
            "ltr_tpu:cpu_cache_usage_perc",
            "Host swap KV-cache usage (1 = full).", labelnames)
        self.counter_prompt_tokens = Counter(
            "ltr_tpu:prompt_tokens_total",
            "Number of prefill tokens processed.", labelnames)
        self.counter_generation_tokens = Counter(
            "ltr_tpu:generation_tokens_total",
            "Number of generation tokens processed.", labelnames)
        self.histogram_time_to_first_token = Histogram(
            "ltr_tpu:time_to_first_token_seconds",
            "Time to first token.", labelnames,
            buckets=[0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25,
                     0.5, 0.75, 1.0, 2.5, 5.0, 7.5, 10.0])
        self.histogram_time_per_output_token = Histogram(
            "ltr_tpu:time_per_output_token_seconds",
            "Time per output token.", labelnames,
            buckets=[0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4,
                     0.5, 0.75, 1.0, 2.5])
        self.histogram_e2e_request_latency = Histogram(
            "ltr_tpu:e2e_request_latency_seconds",
            "End-to-end request latency.", labelnames,
            buckets=[1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0, 50.0,
                     60.0])

    @staticmethod
    def _unregister_duplicates():
        # Allow multiple engines per process (tests).
        for collector in list(REGISTRY._names_to_collectors.values()):
            name = getattr(collector, "_name", "")
            if name.startswith("ltr_tpu:"):
                try:
                    REGISTRY.unregister(collector)
                except KeyError:
                    pass


class StatLogger:
    """Aggregates Stats and logs locally every `local_interval` seconds
    (+ pushes to Prometheus when available)."""

    def __init__(self, local_interval: float, labels: Dict[str, str]):
        self.last_local_log = time.monotonic()
        self.local_interval = local_interval
        self.labels = labels
        self.num_prompt_tokens: List[int] = []
        self.num_generation_tokens: List[int] = []
        self.metrics = Metrics(labelnames=list(labels.keys()))

    def _get_throughput(self, tracked: List[int], now: float) -> float:
        elapsed = now - self.last_local_log
        return float(sum(tracked) / elapsed) if elapsed > 0 else 0.0

    def _local_interval_elapsed(self, now: float) -> bool:
        return now - self.last_local_log >= self.local_interval

    def _log_prometheus(self, stats: Stats) -> None:
        if not _HAS_PROMETHEUS:
            return
        m = self.metrics
        m.gauge_scheduler_running.labels(**self.labels).set(
            stats.num_running)
        m.gauge_scheduler_swapped.labels(**self.labels).set(
            stats.num_swapped)
        m.gauge_scheduler_waiting.labels(**self.labels).set(
            stats.num_waiting)
        m.gauge_gpu_cache_usage.labels(**self.labels).set(
            stats.gpu_cache_usage)
        m.gauge_cpu_cache_usage.labels(**self.labels).set(
            stats.cpu_cache_usage)
        m.counter_prompt_tokens.labels(**self.labels).inc(
            stats.num_prompt_tokens)
        m.counter_generation_tokens.labels(**self.labels).inc(
            stats.num_generation_tokens)
        for ttft in stats.time_to_first_tokens:
            m.histogram_time_to_first_token.labels(**self.labels).observe(
                ttft)
        for tpot in stats.time_per_output_tokens:
            m.histogram_time_per_output_token.labels(**self.labels).observe(
                tpot)
        for e2e in stats.time_e2e_requests:
            m.histogram_e2e_request_latency.labels(**self.labels).observe(
                e2e)

    def log(self, stats: Stats) -> None:
        self._log_prometheus(stats)
        self.num_prompt_tokens.append(stats.num_prompt_tokens)
        self.num_generation_tokens.append(stats.num_generation_tokens)

        now = time.monotonic()
        if self._local_interval_elapsed(now):
            prompt_throughput = self._get_throughput(self.num_prompt_tokens,
                                                     now)
            generation_throughput = self._get_throughput(
                self.num_generation_tokens, now)
            logger.info(
                "Avg prompt throughput: %.1f tokens/s, "
                "Avg generation throughput: %.1f tokens/s, "
                "Running: %d reqs, Swapped: %d reqs, Pending: %d reqs, "
                "Device KV cache usage: %.1f%%, Host KV cache usage: %.1f%%",
                prompt_throughput, generation_throughput, stats.num_running,
                stats.num_swapped, stats.num_waiting,
                stats.gpu_cache_usage * 100, stats.cpu_cache_usage * 100)
            self.last_local_log = now
            self.num_prompt_tokens = []
            self.num_generation_tokens = []
