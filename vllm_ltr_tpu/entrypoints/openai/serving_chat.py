"""/v1/chat/completions endpoint.

Behavioral counterpart of reference
vllm/entrypoints/openai/serving_chat.py (343 LoC).  Renders the
conversation with the tokenizer's chat template when one exists,
otherwise a plain role-prefixed fallback.
"""
from __future__ import annotations

import time
from typing import AsyncGenerator

from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionResponseChoice, ChatCompletionResponseStreamChoice,
    ChatCompletionStreamResponse, ChatMessage, DeltaMessage, UsageInfo)
from vllm_ltr_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.utils import random_uuid

logger = init_logger(__name__)


class OpenAIServingChat(OpenAIServing):

    def __init__(self, engine: AsyncLLMEngine, served_model: str,
                 response_role: str = "assistant",
                 chat_template: str | None = None,
                 lora_modules=None):
        super().__init__(engine, served_model, lora_modules=lora_modules)
        self.response_role = response_role  # role stamped on replies
        if chat_template is not None and self.tokenizer is not None:
            # Accept either a template file path or an inline template.
            try:
                template_text = open(chat_template).read()
            except OSError:
                template_text = chat_template
            self.tokenizer.chat_template = template_text

    def _render_conversation(self, request: ChatCompletionRequest) -> str:
        if (self.tokenizer is not None
                and getattr(self.tokenizer, "chat_template", None)):
            return self.tokenizer.apply_chat_template(
                conversation=[m.model_dump() for m in request.messages],
                tokenize=False,
                add_generation_prompt=bool(request.add_generation_prompt))
        lines = [f"{m.role}: {m.content}" for m in request.messages]
        if request.add_generation_prompt:  # open the assistant turn
            lines.append("assistant:")
        return "\n".join(lines)

    async def create_chat_completion(self, request: ChatCompletionRequest,
                                     raw_request=None):
        err = await self._check_model(request)
        if err is not None:
            return err

        try:
            prompt = self._render_conversation(request)
        except Exception as template_err:
            return self.create_error_response(
                f"Error in applying chat template: {template_err}")

        request_id = f"chatcmpl-{random_uuid()}"
        created = int(time.time())
        try:
            params = request.to_sampling_params()
            ids = self._validate_prompt_and_tokenize(request, prompt=prompt)
            feed = self.engine.generate(
                prompt, params, request_id, prompt_token_ids=ids,
                lora_request=self._maybe_get_lora(request))
        except ValueError as bad:
            return self.create_error_response(str(bad))

        if request.stream:  # SSE frames
            return self._stream(request, feed, request_id, created)
        return await self._collect(request, feed, request_id, created)

    # -- streaming ------------------------------------------------------------

    def _frame(self, request_id: str, created: int,
               choice: ChatCompletionResponseStreamChoice) -> str:
        frame = ChatCompletionStreamResponse(id=request_id,
                                             created=created,
                                             model=self.served_model,
                                             choices=[choice])
        return f"data: {frame.model_dump_json()}\n\n"

    async def _stream(self, request: ChatCompletionRequest, feed,
                      request_id: str, created: int,
                      ) -> AsyncGenerator[str, None]:
        sent_chars = [0] * request.n
        role_announced = False
        prompt_tokens = completion_tokens = 0
        try:
            async for res in feed:
                if res.finished:
                    prompt_tokens = len(res.prompt_token_ids or ())
                    completion_tokens = sum(
                        len(o.token_ids) for o in res.outputs)
                if not role_announced:
                    # First frame per choice names the assistant role.
                    for idx in range(request.n):
                        role_delta = DeltaMessage(role=self.response_role)
                        yield self._frame(
                            request_id, created,
                            ChatCompletionResponseStreamChoice(
                                index=idx, delta=role_delta,
                                finish_reason=None))
                    role_announced = True
                for out in res.outputs:
                    delta = out.text[sent_chars[out.index]:]
                    sent_chars[out.index] = len(out.text)
                    yield self._frame(
                        request_id, created,
                        ChatCompletionResponseStreamChoice(
                            index=out.index,
                            delta=DeltaMessage(content=delta),
                            finish_reason=out.finish_reason,
                            stop_reason=out.stop_reason))
        except ValueError as bad:
            err = self.create_error_response(str(bad))
            yield f"data: {err.model_dump_json()}\n\n"
        if request.stream_options and request.stream_options.include_usage:
            usage_frame = ChatCompletionStreamResponse(
                id=request_id, created=created, model=self.served_model,
                choices=[],
                usage=UsageInfo(
                    prompt_tokens=prompt_tokens,
                    completion_tokens=completion_tokens,
                    total_tokens=prompt_tokens + completion_tokens))
            yield f"data: {usage_frame.model_dump_json()}\n\n"
        yield "data: [DONE]\n\n"

    # -- non-streaming ------------------------------------------------------------

    async def _collect(self, request: ChatCompletionRequest, feed,
                       request_id: str, created: int):
        final: RequestOutput | None = None
        async for res in feed:
            final = res
        assert final is not None, "feed closed without a final output"

        choices: list[ChatCompletionResponseChoice] = []
        for out in final.outputs:
            choices.append(
                ChatCompletionResponseChoice(
                    index=out.index,
                    message=ChatMessage(role=self.response_role,
                                        content=out.text),
                    finish_reason=out.finish_reason,
                    stop_reason=out.stop_reason,
                    pred_score=out.pred_score,
                    aux_model_score=out.aux_model_score))

        prompt_tokens = len(final.prompt_token_ids)
        output_tokens = sum(len(o.token_ids) for o in final.outputs)
        return ChatCompletionResponse(
            id=request_id, created=created, model=self.served_model,
            choices=choices,
            usage=UsageInfo(prompt_tokens=prompt_tokens,
                            completion_tokens=output_tokens,
                            total_tokens=prompt_tokens + output_tokens))
