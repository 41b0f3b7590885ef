"""Streaming HTTP client used by the serving benchmark.

Behavioral counterpart of reference benchmarks/backend_request_func.py:
issue one streaming completion against an OpenAI-compatible server and
record TTFT plus every inter-token gap.
"""
from __future__ import annotations

import json, time, traceback
from dataclasses import dataclass, field
from typing import AsyncIterator

import aiohttp

# Benchmarks run for hours; never let the client time out first.
_NO_TIMEOUT = aiohttp.ClientTimeout(total=6 * 60 * 60)


@dataclass
class RequestFuncInput:
    prompt: str | list[int]
    endpoint: str
    prompt_tokens: int
    max_new_tokens: int
    model: str
    best_of: int = 1; beam_search: bool = False  # noqa: E702
    est_tokens: int = 16; ignore_eos: bool = True  # noqa: E702


@dataclass
class RequestFuncOutput:
    text: str = ""; error: str = ""  # noqa: E702
    success: bool = False; latency: float = 0.0; ttft: float = 0.0  # noqa: E702
    itl: list[float] = field(default_factory=list)
    prompt_tokens: int = 0; new_tokens: int = 0  # noqa: E702


async def _sse_frames(response) -> AsyncIterator[dict]:
    """Yield decoded JSON payloads from an SSE completion stream."""
    async for raw in response.content:
        line = raw.strip()
        if not line or not line.startswith(b"data: "):
            continue
        body = line[len(b"data: "):]
        if body == b"[DONE]":
            continue
        yield json.loads(body)


async def stream_openai_completion(
        spec: RequestFuncInput,
        session: aiohttp.ClientSession | None = None) -> RequestFuncOutput:
    assert spec.endpoint.endswith("completions"), (
        "expected an OpenAI completions URL")

    body = dict(model=spec.model, prompt=spec.prompt, temperature=0.0,
                best_of=spec.best_of, max_tokens=spec.max_new_tokens,
                stream=True, ignore_eos=spec.ignore_eos,
                est_tokens=spec.est_tokens,
                stream_options={"include_usage": True})
    result = RequestFuncOutput(prompt_tokens=spec.prompt_tokens)

    owned = session is None
    if owned:
        session = aiohttp.ClientSession(timeout=_NO_TIMEOUT)
    try:
        t_sent = t_last = time.perf_counter()
        pieces: list[str] = []
        usage_tokens = None
        async with session.post(url=spec.endpoint, json=body) as resp:
            if resp.status != 200:
                result.error = f"HTTP {resp.status}: {await resp.text()}"
                return result
            async for frame in _sse_frames(resp):
                usage = frame.get("usage")
                if usage:
                    # Final stream_options.include_usage frame: the exact
                    # token count.  A fused multi-step decode wave emits
                    # many tokens per SSE frame, so counting frames (the
                    # round-3 accounting) under-reports tokens ~K-fold.
                    usage_tokens = usage.get("completion_tokens")
                choices = frame.get("choices")
                if not choices:
                    continue
                now = time.perf_counter()
                if not pieces and result.ttft == 0.0:
                    result.ttft = now - t_sent
                else:
                    result.itl.append(now - t_last)
                t_last = now
                pieces.append(choices[0].get("text", ""))
        result.text = "".join(pieces)
        result.new_tokens = (usage_tokens if usage_tokens is not None else
                             len(pieces))
        result.latency, result.success = t_last - t_sent, True
    except Exception:
        result.error, result.success = traceback.format_exc(), False
    finally:
        if owned:
            await session.close()
    return result


# Backwards-compatible alias (pre-rename call sites).
async_request_openai_completions = stream_openai_completion

ASYNC_REQUEST_FUNCS = {
    "openai": stream_openai_completion,
    "vllm-ltr-tpu": stream_openai_completion,
}
