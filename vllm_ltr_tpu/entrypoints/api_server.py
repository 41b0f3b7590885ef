"""Minimal demo REST server (counterpart of reference
vllm/entrypoints/api_server.py, 175 LoC): POST /generate with prompt or
prompt_token_ids; response includes the LTR pred_score/aux_model_score
(reference api_server.py:56-84). Use the OpenAI server for production."""
from __future__ import annotations

import argparse, json

from aiohttp import web

from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.utils import random_uuid

engine: AsyncLLMEngine = None


async def health(request: web.Request) -> web.Response:
    return web.Response(status=200)


async def generate(request: web.Request) -> web.Response:
    body = await request.json()
    prompt = body.pop("prompt", None)
    prompt_token_ids = body.pop("prompt_token_ids", None)
    stream = body.pop("stream", False)
    sampling_params = SamplingParams(**body)
    rid = random_uuid()
    results_generator = engine.generate(
        prompt, sampling_params, rid, prompt_token_ids=prompt_token_ids)

    if stream:
        resp = web.StreamResponse(status=200)
        await resp.prepare(request)
        async for step_out in results_generator:
            payload = dict(
                text=[o.text for o in step_out.outputs],
                token_ids=[o.token_ids for o in step_out.outputs])
            await resp.write((json.dumps(payload) + "\0").encode())
        await resp.write_eof()
        return resp

    final_output = None
    async for step_out in results_generator:
        final_output = step_out
    assert final_output is not None, "generator yielded nothing"
    return web.json_response({
        "text": [o.text for o in final_output.outputs],
        "token_ids": [o.token_ids for o in final_output.outputs],
        "pred_score": [o.pred_score for o in final_output.outputs],
        "aux_model_score":
        [o.aux_model_score for o in final_output.outputs],
    })


def main():
    parser = argparse.ArgumentParser("vllm-ltr-tpu demo server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--platform", type=str, default=None)
    parser = AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    global engine
    engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs.from_cli_args(args))

    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_post("/generate", generate)
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
