"""OpenAI-compatible API server.

Behavioral counterpart of reference
``vllm/entrypoints/openai/api_server.py`` (FastAPI app: /v1/completions,
/v1/chat/completions, /health, /v1/models, /version, /metrics —
api_server.py:35-102). Built on aiohttp (FastAPI is not available in this
hermetic image); same routes, same JSON/SSE wire format.

Run:
    python -m vllm_ltr_tpu.entrypoints.openai.api_server \
        --model <hf_dir_or_builtin> --schedule-type opt \
        --prefill-predictor-model-config usage_config.json
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
from typing import AsyncGenerator, Optional

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                    ".."))

from aiohttp import web

from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.entrypoints.openai.protocol import (ChatCompletionRequest,
                                                      CompletionRequest,
                                                      ErrorResponse)
from vllm_ltr_tpu.entrypoints.openai.serving_chat import OpenAIServingChat
from vllm_ltr_tpu.entrypoints.openai.serving_completion import (
    OpenAIServingCompletion)
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.version import __version__

logger = init_logger(__name__)

openai_serving_chat: Optional[OpenAIServingChat] = None
openai_serving_completion: Optional[OpenAIServingCompletion] = None
engine: Optional[AsyncLLMEngine] = None


def _json_response(model_obj, status: int = 200) -> web.Response:
    return web.Response(text=model_obj.model_dump_json(),
                        status=status,
                        content_type="application/json")


def _error_response(err: ErrorResponse) -> web.Response:
    return _json_response(err, status=err.code)


async def health(request: web.Request) -> web.Response:
    await engine.check_health()
    return web.Response(status=200)


async def version(request: web.Request) -> web.Response:
    return web.json_response({"version": __version__})


async def show_available_models(request: web.Request) -> web.Response:
    models = await openai_serving_completion.show_available_models()
    return _json_response(models)


async def debug_stats(request: web.Request) -> web.Response:
    """Engine-internal timing attribution (host scheduling vs dispatch vs
    output processing, per-kind dispatch counts/seconds) — the observability
    needed to localize serving regressions without a profiler attached."""
    eng = engine.engine
    ex = eng.model_executor
    sched = eng.scheduler
    aux = getattr(sched, "aux_model", None)
    aux_stats = None
    if aux is not None:
        aux_stats = {
            "total_scored": aux.total_scored,
            "total_seconds": round(aux.total_time, 4),
            "total_prefetched": getattr(aux, "total_prefetched", 0),
            "prefetch_hits": getattr(aux, "prefetch_hits", 0),
        }
    return web.json_response({
        "step_times": dict(eng.step_times),
        "dispatch_stats": dict(getattr(ex, "dispatch_stats", {})),
        "scheduler": {
            "lazy_score_skips": getattr(sched, "lazy_score_skips", 0),
            "aux": aux_stats,
        },
    })


async def metrics(request: web.Request) -> web.Response:
    try:
        from prometheus_client import REGISTRY, generate_latest
        return web.Response(body=generate_latest(REGISTRY),
                            content_type="text/plain")
    except ImportError:
        return web.Response(status=501,
                            text="prometheus_client not installed")


async def _stream_sse(request: web.Request,
                      gen: AsyncGenerator[str, None]) -> web.StreamResponse:
    resp = web.StreamResponse(
        status=200,
        headers={"Content-Type": "text/event-stream"})
    await resp.prepare(request)
    async for chunk in gen:
        await resp.write(chunk.encode())
    await resp.write_eof()
    return resp


async def create_completion(request: web.Request) -> web.StreamResponse:
    try:
        body = await request.json()
        completion_request = CompletionRequest(**body)
    except Exception as e:
        return _error_response(
            openai_serving_completion.create_error_response(str(e)))
    generator = await openai_serving_completion.create_completion(
        completion_request, request)
    if isinstance(generator, ErrorResponse):
        return _error_response(generator)
    if completion_request.stream:
        return await _stream_sse(request, generator)
    return _json_response(generator)


async def create_chat_completion(request: web.Request) -> web.StreamResponse:
    try:
        body = await request.json()
        chat_request = ChatCompletionRequest(**body)
    except Exception as e:
        return _error_response(
            openai_serving_chat.create_error_response(str(e)))
    generator = await openai_serving_chat.create_chat_completion(
        chat_request, request)
    if isinstance(generator, ErrorResponse):
        return _error_response(generator)
    if chat_request.stream:
        return await _stream_sse(request, generator)
    return _json_response(generator)


def build_app() -> web.Application:
    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_get("/version", version)
    app.router.add_get("/v1/models", show_available_models)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/debug/stats", debug_stats)
    app.router.add_post("/v1/completions", create_completion)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    return app


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="vllm-ltr-tpu OpenAI-compatible API server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--served-model-name", type=str, default=None)
    parser.add_argument("--chat-template", type=str, default=None)
    parser.add_argument("--response-role", type=str, default="assistant")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument(
        "--lora-modules", type=str, nargs="+", default=None,
        metavar="NAME=PATH",
        help="LoRA adapters served as their own model ids "
        "(reference api_server --lora-modules); requires --enable-lora")
    parser = AsyncEngineArgs.add_cli_args(parser)
    return parser


def parse_lora_modules(specs):
    """['name=path', ...] -> [LoRAModulePath]."""
    from vllm_ltr_tpu.entrypoints.openai.serving_engine import LoRAModulePath
    out = []
    for spec in specs or []:
        name, sep, path = spec.partition("=")
        if not sep or not name or not path:
            raise ValueError(
                f"--lora-modules entry {spec!r} is not NAME=PATH")
        out.append(LoRAModulePath(name=name, local_path=path))
    return out


def init_server(args) -> web.Application:
    global engine, openai_serving_chat, openai_serving_completion
    engine_args = AsyncEngineArgs.from_cli_args(args)
    lora_modules = parse_lora_modules(getattr(args, "lora_modules", None))
    if lora_modules and not engine_args.enable_lora:
        raise ValueError("--lora-modules requires --enable-lora")
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served_model = args.served_model_name or args.model
    openai_serving_completion = OpenAIServingCompletion(
        engine, served_model, lora_modules=lora_modules)
    openai_serving_chat = OpenAIServingChat(engine, served_model,
                                            args.response_role,
                                            args.chat_template,
                                            lora_modules=lora_modules)
    return build_app()


def main():
    args = make_arg_parser().parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    app = init_server(args)
    executor = engine.engine.model_executor
    if executor.multihost and not executor.is_leader:
        # Non-leader hosts mirror the leader's device dispatches instead of
        # serving HTTP (the reference's Ray worker loop equivalent).
        executor.serve_follower()
        return
    logger.info("Starting OpenAI-compatible server on %s:%d (model=%s)",
                args.host, args.port, args.model)
    try:
        web.run_app(app, host=args.host, port=args.port, print=None)
    finally:
        executor.shutdown_followers()


if __name__ == "__main__":
    main()
