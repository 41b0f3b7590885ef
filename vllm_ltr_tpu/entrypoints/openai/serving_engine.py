"""Shared OpenAI-endpoint plumbing.

Behavioral counterpart of reference
vllm/entrypoints/openai/serving_engine.py (214 LoC): model checks, prompt
validation/tokenization, and logprob view construction.
"""
from __future__ import annotations

from dataclasses import dataclass

from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_ltr_tpu.entrypoints.openai.protocol import (
    ErrorResponse, LogProbs, ModelCard, ModelList, ModelPermission)
from vllm_ltr_tpu.logger import init_logger
from vllm_ltr_tpu.sequence import Logprob

logger = init_logger(__name__)


@dataclass
class LoRAModulePath:
    name: str; local_path: str  # adapter name / weights dir  # noqa: E702


class OpenAIServing:
    """Base for the /v1 endpoint handlers."""

    def __init__(self, engine: AsyncLLMEngine, served_model: str,
                 lora_modules: list[LoRAModulePath] | None = None) -> None:
        self.engine, self.served_model = engine, served_model
        self.tokenizer = engine.engine.tokenizer
        self.max_model_len = engine.engine.model_config.max_model_len
        # --lora-modules name=path: each adapter is addressable as its own
        # model id (reference serving_engine.py multi-LoRA contract).
        from vllm_ltr_tpu.lora.request import LoRARequest
        self.lora_requests = {
            m.name: LoRARequest(lora_name=m.name, lora_int_id=i + 1,
                                lora_local_path=m.local_path)
            for i, m in enumerate(lora_modules or [])
        }

    async def show_available_models(self) -> ModelList:
        cards = [ModelCard(id=self.served_model, root=self.served_model,
                           permission=[ModelPermission()])]
        cards.extend(
            ModelCard(id=name, root=req.lora_local_path,
                      permission=[ModelPermission()])
            for name, req in self.lora_requests.items())
        return ModelList(data=cards)

    def create_error_response(self, message: str,
                              err_type: str = "BadRequestError",
                              status_code: int = 400) -> ErrorResponse:
        return ErrorResponse(message=message, type=err_type,
                             code=status_code)

    async def _check_model(self, request) -> ErrorResponse | None:
        if request.model == self.served_model:
            return None
        if request.model in self.lora_requests:
            return None
        return self.create_error_response(
            f"model '{request.model}' is not served here",
            err_type="NotFoundError", status_code=404)

    def _maybe_get_lora(self, request):
        """LoRARequest for adapter-addressed requests (model == adapter
        name), else None (base model)."""
        return self.lora_requests.get(request.model)

    # -- prompt handling ----------------------------------------------------

    def _validate_prompt_and_tokenize(
            self,
            request,
            prompt: str | None = None,
            prompt_ids: list[int] | None = None) -> list[int]:
        """Tokenize (if needed), default max_tokens to the remaining window,
        and enforce the context limit."""
        if (prompt is None) == (prompt_ids is None):
            raise ValueError("provide exactly one of prompt / prompt_ids")
        trunc = getattr(request, "truncate_prompt_tokens", None)
        if trunc is not None and trunc < 1:
            raise ValueError("truncate_prompt_tokens must be >= 1")
        if prompt_ids is None:
            if self.tokenizer is None:
                raise ValueError("server started without a tokenizer; "
                                 "send token ids")
            # Reference semantics (serving_engine.py:188-194): tokenizer
            # truncation for text, last-N for explicit token ids.
            kwargs = ({} if trunc is None else
                      {"truncation": True, "max_length": trunc})
            prompt_ids = self.tokenizer(prompt, **kwargs).input_ids
        elif trunc is not None:
            prompt_ids = prompt_ids[-trunc:]

        prompt_len = len(prompt_ids)
        if getattr(request, "max_tokens", None) is None:
            request.max_tokens = self.max_model_len - prompt_len
        budget = prompt_len + (request.max_tokens or 0)
        if budget > self.max_model_len:
            # Keep the "maximum context length" phrase: OpenAI clients
            # pattern-match it to detect context overflow.
            raise ValueError(
                f"This model's maximum context length is {self.max_model_len}"
                f" tokens, but {budget} were requested ({prompt_len} prompt"
                f" + {request.max_tokens} completion).")
        return prompt_ids

    # -- logprob views ----------------------------------------------------------

    def _token_text(self, token_id: int) -> str:
        if self.tokenizer is None:
            return str(token_id)
        return self.tokenizer.convert_ids_to_tokens(token_id)

    def _create_logprobs(
            self, token_ids: list[int],
            top_logprobs: list[dict[int, Logprob] | None],
            num_output_top_logprobs: int | None = None,
            initial_text_offset: int = 0) -> LogProbs:
        """Build the OpenAI logprobs view for a run of tokens."""
        view = LogProbs()
        if num_output_top_logprobs:  # requested depth > 0
            view.top_logprobs = []
        offset = initial_text_offset
        for pos, token_id in enumerate(token_ids):
            step = top_logprobs[pos] if pos < len(top_logprobs) else None
            if step is None:
                # No logprob data for this position (e.g. echoed prompt
                # head): report the raw id.
                text = str(token_id)
                view.token_logprobs.append(None)
                if view.top_logprobs is not None:
                    view.top_logprobs.append(None)
            else:
                text = self._token_text(token_id)
                view.token_logprobs.append(step[token_id].logprob)
                if view.top_logprobs is not None:
                    view.top_logprobs.append({
                        self._token_text(tid): lp.logprob
                        for tid, lp in step.items()
                    })
            view.tokens.append(text)
            view.text_offset.append(offset)
            offset += len(text)
        return view
