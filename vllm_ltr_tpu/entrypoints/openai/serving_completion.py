"""/v1/completions handler.

Behavioral counterpart of reference
``vllm/entrypoints/openai/serving_completion.py`` (349 LoC), incl. the LTR
score fields forwarded on responses (:242-266,328-329).
"""
from __future__ import annotations

import time
from typing import AsyncGenerator, AsyncIterator, List, Optional, Tuple

from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionResponseStreamChoice, CompletionStreamResponse, LogProbs,
    UsageInfo)
from vllm_ltr_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_ltr_tpu.outputs import RequestOutput
from vllm_ltr_tpu.utils import merge_dicts, random_uuid


def parse_prompt_format(prompt) -> Tuple[bool, list]:
    """Returns (prompt_is_tokens, prompts): supports str, [str], [int],
    [[int]]."""
    prompt_is_tokens = False
    prompts = [prompt]  # case 1: a string
    if isinstance(prompt, list):
        if len(prompt) == 0:
            raise ValueError("please provide at least one prompt")
        elif isinstance(prompt[0], str):
            prompt_is_tokens = False
            prompts = prompt  # case 2: array of strings
        elif isinstance(prompt[0], int):
            prompt_is_tokens = True
            prompts = [prompt]  # case 3: array of tokens
        elif isinstance(prompt[0], list):
            prompt_is_tokens = True
            prompts = prompt  # case 4: array of token arrays
        else:
            raise ValueError(
                "prompt must be a string, array of strings, array of "
                "tokens, or array of token arrays")
    return prompt_is_tokens, prompts


class OpenAIServingCompletion(OpenAIServing):

    def __init__(self, engine: AsyncLLMEngine, served_model: str):
        super().__init__(engine, served_model)

    async def create_completion(self, request: CompletionRequest,
                                raw_request=None):
        """Returns CompletionResponse, an async generator of SSE strings
        (when streaming), or ErrorResponse."""
        error_check_ret = await self._check_model(request)
        if error_check_ret is not None:
            return error_check_ret

        if request.suffix is not None:
            return self.create_error_response(
                "suffix is not currently supported")
        if request.echo and request.stream:
            return self.create_error_response(
                "echo is not supported with streaming")

        request_id = f"cmpl-{random_uuid()}"
        created_time = int(time.time())

        try:
            sampling_params = request.to_sampling_params()
            prompt_is_tokens, prompts = parse_prompt_format(request.prompt)

            generators = []
            for i, prompt in enumerate(prompts):
                if prompt_is_tokens:
                    input_ids = self._validate_prompt_and_tokenize(
                        request, prompt_ids=prompt)
                else:
                    input_ids = self._validate_prompt_and_tokenize(
                        request, prompt=prompt)
                generators.append(
                    self.engine.generate(
                        None,
                        sampling_params,
                        f"{request_id}-{i}",
                        prompt_token_ids=input_ids))
        except ValueError as e:
            return self.create_error_response(str(e))

        if request.stream:
            return self.completion_stream_generator(request, generators,
                                                    request_id, created_time,
                                                    len(prompts))

        # Non-streaming: gather all final outputs.
        final_res_batch: List[Optional[RequestOutput]] = [None] * len(
            prompts)
        try:
            for i, generator in enumerate(generators):
                async for res in generator:
                    final_res_batch[i] = res
        except ValueError as e:
            return self.create_error_response(str(e))
        return self.request_output_to_completion_response(
            final_res_batch, request, request_id, created_time)

    async def completion_stream_generator(
            self, request: CompletionRequest, generators,
            request_id: str, created_time: int,
            num_prompts: int) -> AsyncGenerator[str, None]:
        model_name = self.served_model
        num_choices = 1 if request.n is None else request.n
        previous_texts = [""] * num_choices * num_prompts
        previous_num_tokens = [0] * num_choices * num_prompts

        try:
            for prompt_idx, generator in enumerate(generators):
                async for res in generator:
                    for output in res.outputs:
                        i = output.index + prompt_idx * num_choices
                        delta_text = output.text[len(previous_texts[i]):]
                        delta_token_ids = output.token_ids[
                            previous_num_tokens[i]:]
                        top_logprobs = (output.logprobs[
                            previous_num_tokens[i]:]
                                        if output.logprobs else None)
                        logprobs = None
                        if request.logprobs is not None:
                            logprobs = self._create_logprobs(
                                token_ids=delta_token_ids,
                                top_logprobs=top_logprobs or [],
                                num_output_top_logprobs=request.logprobs,
                                initial_text_offset=len(previous_texts[i]))
                        previous_texts[i] = output.text
                        previous_num_tokens[i] = len(output.token_ids)

                        chunk = CompletionStreamResponse(
                            id=request_id,
                            created=created_time,
                            model=model_name,
                            choices=[
                                CompletionResponseStreamChoice(
                                    index=i,
                                    text=delta_text,
                                    logprobs=logprobs,
                                    finish_reason=output.finish_reason,
                                    stop_reason=output.stop_reason,
                                    pred_score=output.pred_score,
                                    aux_model_score=output.aux_model_score)
                            ])
                        yield (f"data: "
                               f"{chunk.model_dump_json(exclude_unset=False)}"
                               f"\n\n")
        except ValueError as e:
            err = self.create_error_response(str(e))
            yield f"data: {err.model_dump_json()}\n\n"
        yield "data: [DONE]\n\n"

    def request_output_to_completion_response(
            self, final_res_batch: List[RequestOutput],
            request: CompletionRequest, request_id: str,
            created_time: int) -> CompletionResponse:
        model_name = self.served_model
        choices: List[CompletionResponseChoice] = []
        num_prompt_tokens = 0
        num_generated_tokens = 0
        for final_res in final_res_batch:
            assert final_res is not None
            prompt_token_ids = final_res.prompt_token_ids
            prompt_text = final_res.prompt

            for output in final_res.outputs:
                if request.echo and request.max_tokens == 0:
                    token_ids = prompt_token_ids
                    top_logprobs = final_res.prompt_logprobs
                    output_text = prompt_text or ""
                elif request.echo and request.max_tokens > 0:
                    token_ids = prompt_token_ids + output.token_ids
                    top_logprobs = ((final_res.prompt_logprobs or []) +
                                    (output.logprobs or []))
                    output_text = (prompt_text or "") + output.text
                else:
                    token_ids = output.token_ids
                    top_logprobs = output.logprobs
                    output_text = output.text

                logprobs = None
                if request.logprobs is not None:
                    logprobs = self._create_logprobs(
                        token_ids=token_ids,
                        top_logprobs=top_logprobs or [],
                        num_output_top_logprobs=request.logprobs)

                choices.append(
                    CompletionResponseChoice(
                        index=len(choices),
                        text=output_text,
                        logprobs=logprobs,
                        finish_reason=output.finish_reason,
                        stop_reason=output.stop_reason,
                        pred_score=output.pred_score,
                        aux_model_score=output.aux_model_score))

            num_prompt_tokens += len(prompt_token_ids)
            num_generated_tokens += sum(
                len(output.token_ids) for output in final_res.outputs)

        usage = UsageInfo(prompt_tokens=num_prompt_tokens,
                          completion_tokens=num_generated_tokens,
                          total_tokens=num_prompt_tokens +
                          num_generated_tokens)
        return CompletionResponse(id=request_id,
                                  created=created_time,
                                  model=model_name,
                                  choices=choices,
                                  usage=usage)
