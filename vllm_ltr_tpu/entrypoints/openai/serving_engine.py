"""Shared serving logic (counterpart of reference
vllm/entrypoints/openai/serving_engine.py, 214 LoC)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Union

from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.entrypoints.openai.protocol import (ErrorResponse,
                                                      LogProbs, ModelCard,
                                                      ModelList,
                                                      ModelPermission)
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import Logprob

logger = init_logger(__name__)


@dataclass
class LoRAModulePath:
    name: str
    local_path: str


class OpenAIServing:

    def __init__(self, engine: AsyncLLMEngine, served_model: str) -> None:
        self.engine = engine
        self.served_model = served_model
        self.tokenizer = engine.engine.tokenizer
        self.max_model_len = engine.engine.model_config.max_model_len

    async def show_available_models(self) -> ModelList:
        model_cards = [
            ModelCard(id=self.served_model,
                      root=self.served_model,
                      permission=[ModelPermission()])
        ]
        return ModelList(data=model_cards)

    def create_error_response(
            self,
            message: str,
            err_type: str = "BadRequestError",
            status_code: int = 400) -> ErrorResponse:
        return ErrorResponse(message=message,
                             type=err_type,
                             code=status_code)

    async def _check_model(self, request) -> Optional[ErrorResponse]:
        if request.model != self.served_model:
            return self.create_error_response(
                message=f"The model `{request.model}` does not exist.",
                err_type="NotFoundError",
                status_code=404)
        return None

    def _validate_prompt_and_tokenize(
        self,
        request,
        prompt: Optional[str] = None,
        prompt_ids: Optional[List[int]] = None,
    ) -> List[int]:
        if (prompt is None) == (prompt_ids is None):
            raise ValueError(
                "Either prompt or prompt_ids should be provided.")
        if prompt_ids is not None:
            input_ids = prompt_ids
        else:
            if self.tokenizer is None:
                raise ValueError(
                    "This server has no tokenizer; send token-id prompts.")
            input_ids = self.tokenizer(prompt).input_ids
        token_num = len(input_ids)

        max_tokens = getattr(request, "max_tokens", None)
        if max_tokens is None:
            request.max_tokens = self.max_model_len - token_num
        if token_num + (request.max_tokens or 0) > self.max_model_len:
            raise ValueError(
                f"This model's maximum context length is "
                f"{self.max_model_len} tokens. However, you requested "
                f"{(request.max_tokens or 0) + token_num} tokens "
                f"({token_num} in the messages, "
                f"{request.max_tokens} in the completion).")
        return input_ids

    def _create_logprobs(
        self,
        token_ids: List[int],
        top_logprobs: List[Optional[Dict[int, Logprob]]],
        num_output_top_logprobs: Optional[int] = None,
        initial_text_offset: int = 0,
    ) -> LogProbs:
        logprobs = LogProbs()
        last_token_len = 0
        if num_output_top_logprobs:
            logprobs.top_logprobs = []
        for i, token_id in enumerate(token_ids):
            step_top_logprobs = top_logprobs[i] if i < len(
                top_logprobs) else None
            if step_top_logprobs is None:
                token = str(token_id)
                logprobs.tokens.append(token)
                logprobs.token_logprobs.append(None)
                if logprobs.top_logprobs is not None:
                    logprobs.top_logprobs.append(None)
            else:
                token_logprob = step_top_logprobs[token_id].logprob
                token = (self.tokenizer.convert_ids_to_tokens(token_id)
                         if self.tokenizer is not None else str(token_id))
                logprobs.tokens.append(token)
                logprobs.token_logprobs.append(token_logprob)
                if logprobs.top_logprobs is not None:
                    logprobs.top_logprobs.append({
                        (self.tokenizer.convert_ids_to_tokens(tid)
                         if self.tokenizer is not None else str(tid)):
                        lp.logprob
                        for tid, lp in step_top_logprobs.items()
                    })
            if len(logprobs.text_offset) == 0:
                logprobs.text_offset.append(initial_text_offset)
            else:
                logprobs.text_offset.append(logprobs.text_offset[-1] +
                                            last_token_len)
            last_token_len = len(token)
        return logprobs
