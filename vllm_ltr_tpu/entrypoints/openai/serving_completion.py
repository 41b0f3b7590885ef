"""/v1/completions endpoint.

Behavioral counterpart of reference
vllm/entrypoints/openai/serving_completion.py (349 LoC), including the
LTR score fields forwarded on every choice (:242-266,328-329).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import AsyncGenerator, List, Optional

from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionResponseStreamChoice, CompletionStreamResponse, UsageInfo)
from vllm_ltr_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.utils import random_uuid


@dataclass
class _PromptItem:
    """One prompt of a (possibly batched) completion request."""
    text: Optional[str] = None
    ids: Optional[List[int]] = None


def _normalize_prompts(prompt) -> List[_PromptItem]:
    """The OpenAI prompt field accepts: str | [str] | [int] | [[int]]."""
    if isinstance(prompt, str):
        return [_PromptItem(text=prompt)]
    if not isinstance(prompt, list) or not prompt:
        raise ValueError("please provide at least one prompt")
    head = prompt[0]
    if isinstance(head, str):
        return [_PromptItem(text=p) for p in prompt]
    if isinstance(head, int):
        return [_PromptItem(ids=prompt)]
    if isinstance(head, list):
        return [_PromptItem(ids=p) for p in prompt]
    raise ValueError("prompt must be a string, array of strings, array of "
                     "tokens, or array of token arrays")


@dataclass
class _StreamCursor:
    """Per-choice progress, for computing stream deltas."""
    chars: int = 0
    tokens: int = 0


class OpenAIServingCompletion(OpenAIServing):

    def __init__(self, engine: AsyncLLMEngine, served_model: str,
                 lora_modules=None):
        super().__init__(engine, served_model, lora_modules=lora_modules)

    async def create_completion(self, request: CompletionRequest,
                                raw_request=None):
        """Returns a CompletionResponse, an SSE async generator (stream
        mode), or an ErrorResponse."""
        err = await self._check_model(request)
        if err is not None:
            return err
        if request.suffix is not None:
            return self.create_error_response(
                "suffix is not currently supported")
        if request.echo and request.stream:
            return self.create_error_response(
                "echo is not supported with streaming")

        request_id = f"cmpl-{random_uuid()}"
        created = int(time.time())
        try:
            zero_echo = request.echo and request.max_tokens == 0
            if zero_echo:
                # Prompt-scoring mode: the engine needs one generated
                # token to drive the step; _final_choice sees the original
                # max_tokens=0 and returns only the echoed prompt
                # (+ prompt logprobs), dropping the throwaway token.
                request.max_tokens = 1
            params = request.to_sampling_params()
            if zero_echo:
                request.max_tokens = 0
            items = _normalize_prompts(request.prompt)
            feeds = []
            for i, item in enumerate(items):
                ids = self._validate_prompt_and_tokenize(
                    request, prompt=item.text, prompt_ids=item.ids)
                feeds.append(
                    self.engine.generate(
                        None, params, f"{request_id}-{i}",
                        prompt_token_ids=ids,
                        lora_request=self._maybe_get_lora(request)))
        except ValueError as e:
            return self.create_error_response(str(e))

        if request.stream:
            return self._stream(request, feeds, request_id, created)
        return await self._collect(request, feeds, request_id, created)

    # -- streaming -------------------------------------------------------------

    async def _stream(self, request: CompletionRequest, feeds,
                      request_id: str,
                      created: int) -> AsyncGenerator[str, None]:
        fanout = request.n or 1
        cursors = [_StreamCursor() for _ in range(fanout * len(feeds))]
        prompt_tokens = 0
        try:
            for p, feed in enumerate(feeds):
                async for res in feed:
                    if res.finished:
                        prompt_tokens += len(res.prompt_token_ids or ())
                    for out in res.outputs:
                        slot = p * fanout + out.index
                        cur = cursors[slot]
                        delta_text = out.text[cur.chars:]
                        delta_ids = out.token_ids[cur.tokens:]
                        view = None
                        if request.logprobs is not None:
                            steps = (out.logprobs[cur.tokens:]
                                     if out.logprobs else [])
                            view = self._create_logprobs(
                                token_ids=delta_ids,
                                top_logprobs=steps,
                                num_output_top_logprobs=request.logprobs,
                                initial_text_offset=cur.chars)
                        cur.chars = len(out.text)
                        cur.tokens = len(out.token_ids)

                        frame = CompletionStreamResponse(
                            id=request_id,
                            created=created,
                            model=self.served_model,
                            choices=[
                                CompletionResponseStreamChoice(
                                    index=slot,
                                    text=delta_text,
                                    logprobs=view,
                                    finish_reason=out.finish_reason,
                                    stop_reason=out.stop_reason,
                                    pred_score=out.pred_score,
                                    aux_model_score=out.aux_model_score)
                            ])
                        data = frame.model_dump_json(exclude_unset=False)
                        yield f"data: {data}\n\n"
        except ValueError as e:
            err = self.create_error_response(str(e))
            yield f"data: {err.model_dump_json()}\n\n"
        if request.stream_options and request.stream_options.include_usage:
            # OpenAI stream_options.include_usage: final frame with exact
            # token counts (streaming clients can't count tokens from text
            # deltas — a fused multi-step wave emits many tokens per frame).
            completion_tokens = sum(c.tokens for c in cursors)
            usage_frame = CompletionStreamResponse(
                id=request_id, created=created, model=self.served_model,
                choices=[],
                usage=UsageInfo(
                    prompt_tokens=prompt_tokens,
                    completion_tokens=completion_tokens,
                    total_tokens=prompt_tokens + completion_tokens))
            yield f"data: {usage_frame.model_dump_json()}\n\n"
        yield "data: [DONE]\n\n"

    # -- non-streaming -------------------------------------------------------------

    async def _collect(self, request: CompletionRequest, feeds,
                       request_id: str, created: int):
        finals: List[Optional[RequestOutput]] = [None] * len(feeds)
        try:
            for i, feed in enumerate(feeds):
                async for res in feed:
                    finals[i] = res
        except ValueError as e:
            return self.create_error_response(str(e))

        choices: List[CompletionResponseChoice] = []
        prompt_tokens = 0
        output_tokens = 0
        for res in finals:
            assert res is not None
            for out in res.outputs:
                choices.append(
                    self._final_choice(request, res, out, len(choices)))
            prompt_tokens += len(res.prompt_token_ids)
            if not (request.echo and request.max_tokens == 0):
                # Prompt-scoring mode generates one throwaway token that
                # never reaches the client; don't bill it.
                output_tokens += sum(len(o.token_ids) for o in res.outputs)

        return CompletionResponse(
            id=request_id,
            created=created,
            model=self.served_model,
            choices=choices,
            usage=UsageInfo(prompt_tokens=prompt_tokens,
                            completion_tokens=output_tokens,
                            total_tokens=prompt_tokens + output_tokens))

    def _final_choice(self, request: CompletionRequest, res: RequestOutput,
                      out, index: int) -> CompletionResponseChoice:
        # echo folds the prompt back into the returned text/logprobs.
        if request.echo and request.max_tokens == 0:
            ids = res.prompt_token_ids
            steps = res.prompt_logprobs
            text = res.prompt or ""
        elif request.echo:
            ids = res.prompt_token_ids + out.token_ids
            steps = (res.prompt_logprobs or []) + (out.logprobs or [])
            text = (res.prompt or "") + out.text
        else:
            ids, steps, text = out.token_ids, out.logprobs, out.text

        view = None
        if request.logprobs is not None:
            view = self._create_logprobs(
                token_ids=ids,
                top_logprobs=steps or [],
                num_output_top_logprobs=request.logprobs)
        return CompletionResponseChoice(
            index=index,
            text=text,
            logprobs=view,
            finish_reason=out.finish_reason,
            stop_reason=out.stop_reason,
            pred_score=out.pred_score,
            aux_model_score=out.aux_model_score)
