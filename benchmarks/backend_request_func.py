"""Streaming HTTP client used by the serving benchmark.

Behavioral counterpart of reference benchmarks/backend_request_func.py:
issue one streaming completion against an OpenAI-compatible server and
record TTFT plus every inter-token gap.
"""
from __future__ import annotations

import json, time, traceback
from dataclasses import dataclass, field
from typing import AsyncIterator, List, Optional, Union

import aiohttp

# Benchmarks run for hours; never let the client time out first.
_NO_TIMEOUT = aiohttp.ClientTimeout(total=6 * 60 * 60)


@dataclass
class RequestFuncInput:
    prompt: Union[str, List[int]]
    endpoint: str
    prompt_tokens: int
    max_new_tokens: int
    model: str
    best_of: int = 1
    beam_search: bool = False
    est_tokens: int = 16
    ignore_eos: bool = True


@dataclass
class RequestFuncOutput:
    text: str = ""
    success: bool = False
    latency: float = 0.0
    ttft: float = 0.0
    itl: List[float] = field(default_factory=list)
    prompt_tokens: int = 0
    new_tokens: int = 0
    error: str = ""


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


async def async_request_openai_completions(
    request_func_input: RequestFuncInput,
    session: Optional[aiohttp.ClientSession] = None,
) -> RequestFuncOutput:
    spec = request_func_input
    assert spec.endpoint.endswith("completions"), (
        "expected an OpenAI completions URL")

    body = {
        "model": spec.model,
        "prompt": spec.prompt,
        "temperature": 0.0,
        "best_of": spec.best_of,
        "max_tokens": spec.max_new_tokens,
        "stream": True,
        "ignore_eos": spec.ignore_eos,
        "est_tokens": spec.est_tokens,
    }
    result = RequestFuncOutput(prompt_tokens=spec.prompt_tokens)

    owned = session is None
    if owned:
        session = aiohttp.ClientSession(timeout=_NO_TIMEOUT)
    try:
        t_sent = time.perf_counter()
        t_last = t_sent
        pieces: List[str] = []
        async with session.post(url=spec.endpoint, json=body) as resp:
            if resp.status != 200:
                result.error = f"HTTP {resp.status}: {await resp.text()}"
                return result
            async for frame in _sse_frames(resp):
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
        result.new_tokens = len(pieces)
        result.latency = t_last - t_sent
        result.success = True
    except Exception:
        result.error = traceback.format_exc()
        result.success = False
    finally:
        if owned:
            await session.close()
    return result


ASYNC_REQUEST_FUNCS = {
    "openai": async_request_openai_completions,
    "vllm-ltr-tpu": async_request_openai_completions,
}
