"""Async request functions for the serving benchmark client.

Behavioral counterpart of reference ``benchmarks/backend_request_func.py``:
stream completions from an OpenAI-compatible server, recording TTFT and
inter-token latencies per request.
"""
from __future__ import annotations

import json
import sys
import time
import traceback
from dataclasses import dataclass, field
from typing import List, Optional, Union

import aiohttp

AIOHTTP_TIMEOUT = aiohttp.ClientTimeout(total=6 * 60 * 60)


@dataclass
class RequestFuncInput:
    prompt: Union[str, List[int]]
    api_url: str
    prompt_len: int
    output_len: int
    model: str
    best_of: int = 1
    use_beam_search: bool = False
    est_tokens: int = 16
    ignore_eos: bool = True


@dataclass
class RequestFuncOutput:
    generated_text: str = ""
    success: bool = False
    latency: float = 0.0
    ttft: float = 0.0  # Time to first token
    itl: List[float] = field(default_factory=list)  # Inter-token latencies
    prompt_len: int = 0
    output_len: int = 0
    error: str = ""


async def async_request_openai_completions(
    request_func_input: RequestFuncInput,
    session: Optional[aiohttp.ClientSession] = None,
) -> RequestFuncOutput:
    api_url = request_func_input.api_url
    assert api_url.endswith("completions"), (
        "OpenAI Completions API URL must end with 'completions'.")

    payload = {
        "model": request_func_input.model,
        "prompt": request_func_input.prompt,
        "temperature": 0.0,
        "best_of": request_func_input.best_of,
        "max_tokens": request_func_input.output_len,
        "stream": True,
        "ignore_eos": request_func_input.ignore_eos,
        "est_tokens": request_func_input.est_tokens,
    }
    output = RequestFuncOutput()
    output.prompt_len = request_func_input.prompt_len

    own_session = session is None
    if own_session:
        session = aiohttp.ClientSession(timeout=AIOHTTP_TIMEOUT)
    try:
        generated_text = ""
        ttft = 0.0
        st = time.perf_counter()
        most_recent_timestamp = st
        num_tokens = 0
        async with session.post(url=api_url, json=payload) as response:
            if response.status == 200:
                async for chunk_bytes in response.content:
                    chunk_bytes = chunk_bytes.strip()
                    if not chunk_bytes:
                        continue
                    chunk = chunk_bytes.decode("utf-8")
                    if not chunk.startswith("data: "):
                        continue
                    chunk = chunk[len("data: "):]
                    if chunk == "[DONE]":
                        continue
                    data = json.loads(chunk)
                    if not data.get("choices"):
                        continue
                    timestamp = time.perf_counter()
                    num_tokens += 1
                    if ttft == 0.0:
                        ttft = timestamp - st
                        output.ttft = ttft
                    else:
                        output.itl.append(timestamp -
                                          most_recent_timestamp)
                    most_recent_timestamp = timestamp
                    generated_text += data["choices"][0].get("text", "")
                output.generated_text = generated_text
                output.success = True
                output.latency = most_recent_timestamp - st
                output.output_len = num_tokens
            else:
                output.error = (f"HTTP {response.status}: "
                                f"{await response.text()}")
                output.success = False
    except Exception:
        output.success = False
        exc_info = sys.exc_info()
        output.error = "".join(traceback.format_exception(*exc_info))
    finally:
        if own_session:
            await session.close()
    return output


ASYNC_REQUEST_FUNCS = {
    "openai": async_request_openai_completions,
    "vllm-ltr-tpu": async_request_openai_completions,
}
