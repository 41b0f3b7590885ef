"""Asynchronous engine driver for online serving.

Behavioral counterpart of reference vllm/engine/async_llm_engine.py
(715 LoC), rebuilt around a single driver coroutine and per-request
output feeds:

* callers submit (request kwargs, feed) pairs into an inbox and iterate
  their feed;
* one `_drive` task drains the inbox, steps the engine (the device step
  runs in the default thread pool so the event loop stays responsive),
  and routes each RequestOutput to its feed;
* engine death closes every feed with the error (reference :26-48).
"""
from __future__ import annotations

import asyncio, concurrent.futures, functools, time
from typing import AsyncIterator

from vllm_ltr_tpu.config import EngineConfig
from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class AsyncEngineDeadError(RuntimeError):
    """The driver coroutine crashed; all pending requests were failed."""


class _OutputFeed:
    """Single-request output channel.

    Items are RequestOutputs; an Exception fails the consumer; ``None``
    is the end-of-stream sentinel.
    """

    def __init__(self, request_id: str):
        self.request_id, self.closed = request_id, False
        self._items: asyncio.Queue = asyncio.Queue()

    def push(self, item) -> None:
        if not self.closed:
            self._items.put_nowait(item)

    def close(self, error: BaseException | None = None) -> None:
        if self.closed:
            return
        self._items.put_nowait(error)  # error or None sentinel
        self.closed = True

    def __aiter__(self): return self  # noqa: E704

    async def __anext__(self) -> RequestOutput:
        item = await self._items.get()
        if item is None:
            raise StopAsyncIteration
        if isinstance(item, BaseException):
            raise item
        return item


class AsyncLLMEngine:
    """Event-loop front end over :class:`LLMEngine`.

    The inner engine's blocking step runs in the default executor; all
    request bookkeeping happens on the event loop, so no locks are
    needed.
    """

    def __init__(self, engine_config: EngineConfig,
                 log_requests: bool = True, log_stats: bool = True,
                 max_log_len: int | None = None,
                 start_engine_loop: bool = True,
                 pipeline_admission: bool = True,
                 prefetch_aux: bool = False) -> None:
        self.engine = LLMEngine(engine_config, log_stats=log_stats)
        self.log_requests, self.max_log_len = log_requests, max_log_len
        self._autostart = start_engine_loop
        # Admit mid-step arrivals behind the in-flight dispatch (TTFT).
        self.pipeline_admission = pipeline_admission
        # Score-at-arrival predictor prefetch (--prefetch-aux-scoring).
        self.prefetch_aux = prefetch_aux

        # Tokenizer pool (reference TokenizerPoolConfig /
        # RayTokenizerGroupPool): prompts encode off the event loop so
        # tokenization never stalls the serving step at high QPS.
        from vllm_ltr_tpu.transformers_utils.tokenizer_pool import (
            TokenizerPool)
        mc = engine_config.model_config
        # No max_input_length: the engine truncates over-long prompts
        # itself (add_request), matching the sync path.
        self.tokenizer_pool = (TokenizerPool(self.engine.tokenizer,
                                             mc.tokenizer_pool_size)
                               if self.engine.tokenizer is not None else
                               None)

        # All engine/scheduler host work (add_request, step_begin,
        # step_finish) runs on this single worker thread: the scheduler
        # is not thread-safe, and a first-seen step shape triggers a JIT
        # compile (20-140 s through a remote-compile relay) — on the
        # event-loop thread that froze /health, /metrics and every
        # in-flight SSE stream for the duration.  One worker serializes
        # scheduler access; the loop thread only routes feeds.
        self._host_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="engine-host")

        self._feeds: dict[str, _OutputFeed] = {}
        self._inbox: list[dict] = []
        self._cancelled: set[str] = set()
        self._wake: asyncio.Event | None = None
        self._driver: asyncio.Task | None = None
        self._loop: asyncio.AbstractEventLoop | None = None
        self._fatal: BaseException | None = None

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True) -> "AsyncLLMEngine":
        a = engine_args
        return cls(a.create_engine_config(),
                   log_requests=not a.disable_log_requests,
                   log_stats=not a.disable_log_stats,
                   max_log_len=a.max_log_len,
                   start_engine_loop=start_engine_loop,
                   pipeline_admission=not getattr(
                       a, "disable_pipeline_admission", False),
                   prefetch_aux=getattr(a, "prefetch_aux_scoring", False))

    # -- lifecycle -------------------------------------------------------------

    # fmt: off
    @property
    def is_running(self) -> bool:
        return self._driver is not None and not self._driver.done()
    @property
    def errored(self) -> bool: return self._fatal is not None
    @property
    def is_stopped(self) -> bool:
        return self.errored or (self._driver is not None and self._driver.done())
    # fmt: on

    def set_errored(self, exc: BaseException) -> None:
        self._fatal = exc

    def start_background_loop(self) -> None:
        if self._fatal is not None:
            raise AsyncEngineDeadError(
                "engine driver already crashed") from self._fatal
        if self.is_running:
            raise RuntimeError("engine driver already running")
        self._loop = asyncio.get_event_loop()
        self._wake = asyncio.Event()
        self._driver = self._loop.create_task(self._drive())
        self._driver.add_done_callback(self._on_driver_exit)

    def _ensure_driver(self) -> None:
        # A fresh asyncio.run() orphans the old task: restart on this loop.
        running = asyncio.get_running_loop()
        if self._loop is not None and self._loop is not running:
            self._driver = None
            self._loop = None
        if self.is_running:
            return
        if not self._autostart:
            raise AsyncEngineDeadError(
                "engine driver is not running (it may have crashed; see"
                " logs for the original error)")
        self.start_background_loop()

    def _on_driver_exit(self, task: asyncio.Task) -> None:
        try:
            _ = task.result()  # surfaces the driver's exception
            err: BaseException = AsyncEngineDeadError(
                "engine driver exited unexpectedly")
        except asyncio.CancelledError:
            return
        except BaseException as e:  # noqa: BLE001 - propagate everything
            logger.error("engine driver crashed", exc_info=e)
            err = e
        self.set_errored(err)
        for feed in self._feeds.values():
            feed.close(err)
        self._feeds.clear()

    # -- driver loop -------------------------------------------------------------

    def _run_host(self, fn, *args) -> asyncio.Future:
        """Run an engine host call on the dedicated serialized worker."""
        return asyncio.get_event_loop().run_in_executor(
            self._host_pool, functools.partial(fn, *args))

    def _fold_inbox_engine(self, inbox: list[dict],
                           cancels: list[str]) -> list:
        """Engine mutations only — runs on the host worker."""
        bad = []
        for sub in inbox:
            try:
                self.engine.add_request(**sub)
            except ValueError as bad_request:
                bad.append((sub["request_id"], bad_request))
        if inbox and self.prefetch_aux:
            # Score-at-arrival: one predictor dispatch covering this
            # drain's arrivals rides the device queue behind the
            # in-flight wave, so the next ranked pass finds the scores
            # landed (exact; see AuxScorer.prefetch).
            self.engine.prefetch_aux_scores()
        if cancels:
            self.engine.abort_request(cancels)
        return bad

    async def _fold_inbox(self) -> None:
        """Queued submissions / cancellations into the engine.  Feed
        bookkeeping stays on the loop thread; engine calls go through
        the serialized host worker."""
        inbox, self._inbox = self._inbox, []
        cancelled, self._cancelled = self._cancelled, set()
        inbox = [s for s in inbox if s["request_id"] not in cancelled]
        live_cancels = [r for r in cancelled if r in self._feeds]
        bad = await self._run_host(self._fold_inbox_engine, inbox,
                                   live_cancels)
        for rid, bad_request in bad:
            feed = self._feeds.pop(rid, None)
            if feed is not None:
                feed.close(bad_request)
        for rid in live_cancels:
            feed = self._feeds.pop(rid, None)
            if feed is not None:
                feed.close()

    def _emit(self, outputs) -> None:
        for out in outputs:
            feed = self._feeds.get(out.request_id)
            if feed is None:
                continue
            feed.push(out)
            if out.finished:
                if self.log_requests:
                    logger.info("request %s finished", out.request_id)
                del self._feeds[out.request_id]
                feed.close()

    async def _drive(self) -> None:
        """Pipelined engine loop.

        Each iteration schedules + dispatches one engine step (host-side,
        fast), then — while the device executes it — keeps servicing the
        event loop.  New requests that arrive mid-step are admitted
        immediately through :meth:`LLMEngine.admission_step_begin`: their
        prefill is dispatched behind the in-flight wave on the device
        queue, so TTFT no longer pays "finish the current multi-step
        decode wave, then a full scheduling round trip" (the round-2
        online numbers' dominant term).  All scheduler mutations run on
        one dedicated worker thread (``self._host_pool``) so a JIT
        compile inside a dispatch never blocks the event loop; the
        default pool only fetches device results.
        """
        assert self._wake is not None
        loop = asyncio.get_event_loop()
        max_sneaks = 4  # per in-flight step, bounds dispatch-queue growth
        while True:  # one iteration == one engine step (forever)
            if not (self._inbox or self._cancelled
                    or self.engine.has_unfinished_requests()):
                await self._wake.wait()
            self._wake.clear()
            await self._fold_inbox()

            fin, plan = await self._run_host(self.engine.step_begin)
            if fin is None:
                self._emit(await self._run_host(
                    self.engine.step_finish, [], plan))
                await asyncio.sleep(0.0)
                continue

            fetch = loop.run_in_executor(None, fin)
            sneaks = []
            if self.pipeline_admission:
                while not fetch.done() and len(sneaks) < max_sneaks:
                    wake_task = asyncio.ensure_future(self._wake.wait())
                    done, _ = await asyncio.wait(
                        {fetch, wake_task},
                        return_when=asyncio.FIRST_COMPLETED)
                    wake_task.cancel()
                    if fetch in done:
                        break
                    self._wake.clear()
                    await self._fold_inbox()
                    fin2, plan2 = await self._run_host(
                        self.engine.admission_step_begin)
                    if fin2 is not None:
                        sneaks.append(
                            (loop.run_in_executor(None, fin2), plan2))
                    elif (plan2.ignored_seq_groups
                          or not plan2.is_empty()):
                        # Admission can finalize requests without device
                        # work (over-long prompt, AllocStatus.NEVER):
                        # emit them now or the client hangs forever.
                        self._emit(await self._run_host(
                            self.engine.step_finish, [], plan2))

            raw = await fetch
            self._emit(await self._run_host(
                self.engine.step_finish, raw, plan))
            for sneak_fetch, sneak_plan in sneaks:
                raw2 = await sneak_fetch
                self._emit(await self._run_host(
                    self.engine.step_finish, raw2, sneak_plan))
            await asyncio.sleep(0.0)  # let client coroutines drain feeds

    # -- request API --------------------------------------------------------------

    async def add_request(
            self, request_id: str, prompt: str | None = None,
            sampling_params: SamplingParams | None = None,
            prompt_token_ids: list[int] | None = None,
            arrival_time: float | None = None,
            lora_request=None) -> _OutputFeed:
        if self.log_requests:
            cap = self.max_log_len
            logger.info(
                "request %s received: prompt %r params %s token_ids %s",
                request_id, prompt[:cap] if prompt else prompt,
                sampling_params,
                prompt_token_ids[:cap]
                if prompt_token_ids else prompt_token_ids)
        self._ensure_driver()
        if request_id in self._feeds:
            raise KeyError(f"request {request_id} already in flight")

        if (prompt_token_ids is None and prompt is not None
                and self.tokenizer_pool is not None):
            prompt_token_ids = await self.tokenizer_pool.encode_async(prompt)

        feed = _OutputFeed(request_id)
        self._feeds[request_id] = feed
        self._inbox.append(
            dict(request_id=request_id, prompt=prompt,
                 sampling_params=sampling_params,
                 prompt_token_ids=prompt_token_ids,
                 arrival_time=arrival_time or time.time(),
                 lora_request=lora_request))
        self._wake.set()
        return feed

    async def generate(
            self, prompt: str | None, sampling_params: SamplingParams,
            request_id: str, prompt_token_ids: list[int] | None = None,
            lora_request=None) -> AsyncIterator[RequestOutput]:
        try:
            feed = await self.add_request(
                request_id, prompt=prompt, sampling_params=sampling_params,
                prompt_token_ids=prompt_token_ids, lora_request=lora_request)
            async for out in feed:
                yield out
        except (Exception, asyncio.CancelledError):
            self._cancel(request_id)
            raise

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError("engine driver is not running")
        self._cancel(request_id)

    def _cancel(self, request_id: str) -> None:
        if request_id not in self._feeds:
            return
        if self.log_requests:
            logger.info("request %s aborted", request_id)
        self._cancelled.add(request_id)
        if self._wake is not None:
            self._wake.set()

    # -- info / health ---------------------------------------------------------------

    async def get_model_config(self):
        return self.engine.model_config

    async def do_log_stats(self) -> None: self.engine.do_log_stats()

    async def check_health(self) -> None:
        if self.is_stopped:
            raise AsyncEngineDeadError("engine driver is stopped")
        # Off the event loop: the liveness probe runs a device program,
        # which can take minutes on a congested remote-compile relay — a
        # synchronous call here froze every other HTTP request (incl.
        # /metrics and in-flight SSE streams) for that long.
        await asyncio.get_event_loop().run_in_executor(
            None, self.engine.check_health)
