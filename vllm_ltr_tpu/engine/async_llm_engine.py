"""Asynchronous engine for online serving.

Behavioral counterpart of reference ``vllm/engine/async_llm_engine.py``
(715 LoC): per-request AsyncStreams tracked by a RequestTracker, a
background asyncio loop driving engine steps, and dead-engine error
propagation to all pending streams (reference :26-48).
"""
from __future__ import annotations

import asyncio
import time
from functools import partial
from typing import (AsyncIterator, Callable, Dict, Iterable, List, Optional,
                    Set, Tuple, Union)

from vllm_ltr_tpu.config import EngineConfig
from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class AsyncEngineDeadError(RuntimeError):
    pass


def _raise_exception_on_finish(task: asyncio.Task,
                               error_callback: Callable) -> None:
    msg = ("Task finished unexpectedly. This should never happen! "
           "Please open an issue on Github.")
    exception = None
    try:
        task.result()
        raise AsyncEngineDeadError(
            msg + " See stack trace above for the actual cause.")
    except asyncio.exceptions.CancelledError:
        pass
    except KeyboardInterrupt:
        raise
    except Exception as e:
        exception = e
        logger.error("Engine background task failed", exc_info=e)
        error_callback(exception)
        raise AsyncEngineDeadError(
            msg + " See stack trace above for the actual cause.") from e


class AsyncStream:
    """A stream of RequestOutputs for one request."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item: Union[RequestOutput, Exception]) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._queue.put_nowait(StopAsyncIteration())
        self._finished = True

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        result = await self._queue.get()
        if isinstance(result, Exception):
            raise result
        return result


class RequestTracker:
    """Synchronous abstraction for tracking in-flight requests."""

    def __init__(self) -> None:
        self._request_streams: Dict[str, AsyncStream] = {}
        self._finished_requests: asyncio.Queue = asyncio.Queue()
        self._new_requests: asyncio.Queue = asyncio.Queue()
        self.new_requests_event = asyncio.Event()

    def __contains__(self, item):
        return item in self._request_streams

    def __len__(self) -> int:
        return len(self._request_streams)

    def propagate_exception(self,
                            exc: Exception,
                            request_id: Optional[str] = None) -> None:
        if request_id is not None:
            self.abort_request(request_id)
            if request_id in self._request_streams:
                self._request_streams[request_id].put(exc)
        else:
            for rid, stream in self._request_streams.items():
                stream.put(exc)
                self.abort_request(rid)

    def process_request_output(self,
                               request_output: RequestOutput,
                               *,
                               verbose: bool = False) -> None:
        request_id = request_output.request_id
        stream = self._request_streams.get(request_id)
        if stream is None:
            return
        stream.put(request_output)
        if request_output.finished:
            if verbose:
                logger.info("Finished request %s.", request_id)
            self.abort_request(request_id)

    def add_request(self, request_id: str,
                    **engine_add_request_kwargs) -> AsyncStream:
        if request_id in self._request_streams:
            raise KeyError(f"Request {request_id} already exists.")
        stream = AsyncStream(request_id)
        self._new_requests.put_nowait(
            (stream, {
                "request_id": request_id,
                **engine_add_request_kwargs
            }))
        self.new_requests_event.set()
        return stream

    def abort_request(self, request_id: str, *,
                      verbose: bool = False) -> None:
        if verbose:
            logger.info("Aborted request %s.", request_id)
        self._finished_requests.put_nowait(request_id)
        stream = self._request_streams.pop(request_id, None)
        if stream is not None:
            stream.finish()

    def get_new_and_finished_requests(
            self) -> Tuple[List[Dict], Set[str]]:
        new_requests: List[Dict] = []
        finished_requests: Set[str] = set()

        while not self._finished_requests.empty():
            request_id = self._finished_requests.get_nowait()
            finished_requests.add(request_id)

        while not self._new_requests.empty():
            stream, new_request = self._new_requests.get_nowait()
            if stream.request_id in finished_requests:
                # The request has already been aborted.
                stream.finish()
                continue
            self._request_streams[stream.request_id] = stream
            new_requests.append(new_request)

        return new_requests, finished_requests

    async def wait_for_new_requests(self):
        if not self.has_new_requests():
            await self.new_requests_event.wait()
        self.new_requests_event.clear()

    def has_new_requests(self):
        return not self._new_requests.empty()


class _AsyncLLMEngine(LLMEngine):
    """Extension of LLMEngine for the async driver loop."""

    async def step_async(self) -> List[RequestOutput]:
        seq_group_metadata_list, scheduler_outputs = self.scheduler.schedule()
        if not scheduler_outputs.is_empty():
            loop = asyncio.get_event_loop()
            sampler_outputs = await loop.run_in_executor(
                None,
                partial(self.model_executor.execute_model,
                        seq_group_metadata_list,
                        scheduler_outputs.blocks_to_swap_in,
                        scheduler_outputs.blocks_to_swap_out,
                        scheduler_outputs.blocks_to_copy,
                        scheduler_outputs.num_lookahead_slots))
        else:
            sampler_outputs = []
        return self._process_model_outputs(sampler_outputs,
                                           scheduler_outputs)

    async def add_request_async(self, request_id: str,
                                **kwargs) -> None:
        self.add_request(request_id, **kwargs)

    async def check_health_async(self) -> None:
        self.check_health()


class AsyncLLMEngine:
    """Asyncio wrapper: requests stream outputs; a background loop steps the
    engine while requests are pending."""

    def __init__(self,
                 engine_config: EngineConfig,
                 log_requests: bool = True,
                 log_stats: bool = True,
                 max_log_len: Optional[int] = None,
                 start_engine_loop: bool = True) -> None:
        self.engine = _AsyncLLMEngine(engine_config, log_stats=log_stats)
        self.log_requests = log_requests
        self.max_log_len = max_log_len
        self.background_loop: Optional[asyncio.Future] = None
        self._background_loop_unshielded: Optional[asyncio.Task] = None
        self.start_engine_loop = start_engine_loop
        self._errored_with: Optional[BaseException] = None
        self._request_tracker: Optional[RequestTracker] = None
        self._event_loop: Optional[asyncio.AbstractEventLoop] = None

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True) -> "AsyncLLMEngine":
        engine_config = engine_args.create_engine_config()
        return cls(engine_config,
                   log_requests=not engine_args.disable_log_requests,
                   log_stats=not engine_args.disable_log_stats,
                   max_log_len=engine_args.max_log_len,
                   start_engine_loop=start_engine_loop)

    @property
    def is_running(self) -> bool:
        return (self.background_loop is not None
                and self._background_loop_unshielded is not None
                and not self._background_loop_unshielded.done())

    @property
    def is_stopped(self) -> bool:
        return self.errored or (self.background_loop is not None and
                                self._background_loop_unshielded is not None
                                and self._background_loop_unshielded.done())

    @property
    def errored(self) -> bool:
        return self._errored_with is not None

    def set_errored(self, exc: Exception) -> None:
        self._errored_with = exc

    def _error_callback(self, exc: Exception) -> None:
        self.set_errored(exc)
        if self._request_tracker is not None:
            self._request_tracker.propagate_exception(exc)

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop has errored already.") from self._errored_with
        if self.is_running:
            raise RuntimeError("Background loop is already running.")
        # Initialize the RequestTracker here so it uses the right event loop.
        self._request_tracker = RequestTracker()
        self._event_loop = asyncio.get_event_loop()
        self._background_loop_unshielded = self._event_loop.create_task(
            self.run_engine_loop())
        self._background_loop_unshielded.add_done_callback(
            partial(_raise_exception_on_finish,
                    error_callback=self._error_callback))
        self.background_loop = asyncio.shield(
            self._background_loop_unshielded)

    async def engine_step(self) -> bool:
        """One engine step; returns True if there is in-flight work."""
        new_requests, finished_requests = (
            self._request_tracker.get_new_and_finished_requests())

        for new_request in new_requests:
            try:
                await self.engine.add_request_async(**new_request)
            except ValueError as e:
                self._request_tracker.propagate_exception(
                    e, new_request["request_id"])

        if finished_requests:
            self.engine.abort_request(finished_requests)

        request_outputs = await self.engine.step_async()
        for request_output in request_outputs:
            self._request_tracker.process_request_output(
                request_output, verbose=self.log_requests)

        return len(request_outputs) > 0

    async def run_engine_loop(self):
        has_requests_in_progress = False
        while True:
            if not has_requests_in_progress:
                await self._request_tracker.wait_for_new_requests()
            has_requests_in_progress = await self.engine_step()
            await asyncio.sleep(0)

    async def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
    ) -> AsyncStream:
        if self.log_requests:
            shortened_prompt = prompt
            shortened_token_ids = prompt_token_ids
            if self.max_log_len is not None:
                if shortened_prompt is not None:
                    shortened_prompt = shortened_prompt[:self.max_log_len]
                if shortened_token_ids is not None:
                    shortened_token_ids = shortened_token_ids[:self.
                                                              max_log_len]
            logger.info(
                "Received request %s: prompt: %r, params: %s, "
                "prompt_token_ids: %s.", request_id, shortened_prompt,
                sampling_params, shortened_token_ids)

        # If the event loop that hosted the background task is gone (e.g. a
        # fresh asyncio.run), restart the loop on the current one.
        running_loop = asyncio.get_running_loop()
        if (self._event_loop is not None
                and self._event_loop is not running_loop):
            self.background_loop = None
            self._background_loop_unshielded = None
            self._event_loop = None

        if not self.is_running:
            if self.start_engine_loop:
                self.start_background_loop()
            else:
                raise AsyncEngineDeadError(
                    "Background loop is not running. If it was running, "
                    "inspect the output to find the stacktrace of the "
                    "error that caused the background loop to stop "
                    "(AsyncEngineDeadError).")

        if arrival_time is None:
            arrival_time = time.time()

        return self._request_tracker.add_request(
            request_id,
            prompt=prompt,
            sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=arrival_time,
            lora_request=lora_request)

    async def generate(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        request_id: str,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
    ) -> AsyncIterator[RequestOutput]:
        arrival_time = time.time()
        try:
            stream = await self.add_request(
                request_id,
                prompt,
                sampling_params,
                prompt_token_ids=prompt_token_ids,
                arrival_time=arrival_time,
                lora_request=lora_request)
            async for request_output in stream:
                yield request_output
        except (Exception, asyncio.CancelledError) as e:
            self._abort(request_id)
            raise e

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError(
                "Background loop is not running.")
        return self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        if self._request_tracker is not None:
            self._request_tracker.abort_request(request_id,
                                                verbose=self.log_requests)

    async def get_model_config(self):
        return self.engine.model_config

    async def do_log_stats(self) -> None:
        self.engine.do_log_stats()

    async def check_health(self) -> None:
        t = time.perf_counter()
        logger.debug("Starting health check...")
        if self.is_stopped:
            raise AsyncEngineDeadError("Background loop is stopped.")
        await self.engine.check_health_async()
        logger.debug("Health check took %fs", time.perf_counter() - t)
