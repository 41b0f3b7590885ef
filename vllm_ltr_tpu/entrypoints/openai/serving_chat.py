"""/v1/chat/completions handler.

Behavioral counterpart of reference
``vllm/entrypoints/openai/serving_chat.py`` (343 LoC). Uses the tokenizer's
chat template when present, with a plain role-prefixed fallback.
"""
from __future__ import annotations

import time
from typing import AsyncGenerator, List, Optional, Union

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

    def __init__(self,
                 engine: AsyncLLMEngine,
                 served_model: str,
                 response_role: str = "assistant",
                 chat_template: Optional[str] = None):
        super().__init__(engine, served_model)
        self.response_role = response_role
        self._load_chat_template(chat_template)

    def _load_chat_template(self, chat_template: Optional[str]) -> None:
        if chat_template is not None and self.tokenizer is not None:
            try:
                with open(chat_template) as f:
                    self.tokenizer.chat_template = f.read()
            except OSError:
                self.tokenizer.chat_template = chat_template

    def _apply_chat_template(self, request: ChatCompletionRequest) -> str:
        if (self.tokenizer is not None
                and getattr(self.tokenizer, "chat_template", None)):
            return self.tokenizer.apply_chat_template(
                conversation=[m.model_dump() for m in request.messages],
                tokenize=False,
                add_generation_prompt=request.add_generation_prompt)
        # Fallback template.
        parts = [f"{m.role}: {m.content}" for m in request.messages]
        if request.add_generation_prompt:
            parts.append("assistant:")
        return "\n".join(parts)

    async def create_chat_completion(self, request: ChatCompletionRequest,
                                     raw_request=None):
        error_check_ret = await self._check_model(request)
        if error_check_ret is not None:
            return error_check_ret

        try:
            prompt = self._apply_chat_template(request)
        except Exception as e:
            return self.create_error_response(
                f"Error in applying chat template: {e}")

        request_id = f"chatcmpl-{random_uuid()}"
        created_time = int(time.time())
        try:
            sampling_params = request.to_sampling_params()
            token_ids = self._validate_prompt_and_tokenize(request,
                                                           prompt=prompt)
            result_generator = self.engine.generate(
                prompt,
                sampling_params,
                request_id,
                prompt_token_ids=token_ids)
        except ValueError as e:
            return self.create_error_response(str(e))

        if request.stream:
            return self.chat_completion_stream_generator(
                request, result_generator, request_id, created_time)
        return await self.chat_completion_full_generator(
            request, result_generator, request_id, created_time)

    async def chat_completion_stream_generator(
            self, request: ChatCompletionRequest, result_generator,
            request_id: str,
            created_time: int) -> AsyncGenerator[str, None]:
        model_name = self.served_model
        first_iteration = True
        previous_texts = [""] * request.n
        previous_num_tokens = [0] * request.n
        try:
            async for res in result_generator:
                if first_iteration:
                    for i in range(request.n):
                        chunk = ChatCompletionStreamResponse(
                            id=request_id,
                            created=created_time,
                            model=model_name,
                            choices=[
                                ChatCompletionResponseStreamChoice(
                                    index=i,
                                    delta=DeltaMessage(
                                        role=self.response_role),
                                    finish_reason=None)
                            ])
                        yield f"data: {chunk.model_dump_json()}\n\n"
                    first_iteration = False
                for output in res.outputs:
                    i = output.index
                    delta_text = output.text[len(previous_texts[i]):]
                    previous_texts[i] = output.text
                    previous_num_tokens[i] = len(output.token_ids)
                    chunk = ChatCompletionStreamResponse(
                        id=request_id,
                        created=created_time,
                        model=model_name,
                        choices=[
                            ChatCompletionResponseStreamChoice(
                                index=i,
                                delta=DeltaMessage(content=delta_text),
                                finish_reason=output.finish_reason,
                                stop_reason=output.stop_reason)
                        ])
                    yield f"data: {chunk.model_dump_json()}\n\n"
        except ValueError as e:
            err = self.create_error_response(str(e))
            yield f"data: {err.model_dump_json()}\n\n"
        yield "data: [DONE]\n\n"

    async def chat_completion_full_generator(
            self, request: ChatCompletionRequest, result_generator,
            request_id: str, created_time: int
    ) -> Union[ChatCompletionResponse, "ErrorResponse"]:
        model_name = self.served_model
        final_res: Optional[RequestOutput] = None
        async for res in result_generator:
            final_res = res
        assert final_res is not None

        choices: List[ChatCompletionResponseChoice] = []
        for output in final_res.outputs:
            choices.append(
                ChatCompletionResponseChoice(
                    index=output.index,
                    message=ChatMessage(role=self.response_role,
                                        content=output.text),
                    finish_reason=output.finish_reason,
                    stop_reason=output.stop_reason,
                    pred_score=output.pred_score,
                    aux_model_score=output.aux_model_score))

        num_prompt_tokens = len(final_res.prompt_token_ids)
        num_generated_tokens = sum(
            len(output.token_ids) for output in final_res.outputs)
        usage = UsageInfo(prompt_tokens=num_prompt_tokens,
                          completion_tokens=num_generated_tokens,
                          total_tokens=num_prompt_tokens +
                          num_generated_tokens)
        return ChatCompletionResponse(id=request_id,
                                      created=created_time,
                                      model=model_name,
                                      choices=choices,
                                      usage=usage)
