"""OpenAI wire-protocol schemas.

Behavioral counterpart of reference vllm/entrypoints/openai/protocol.py
(464 LoC) including the LTR extensions: ``est_tokens`` on requests
(protocol.py:102,256) and ``pred_score`` / ``aux_model_score`` on
response choices (:385-386,410-411).

Field names/defaults follow the OpenAI wire format (plus the vLLM
extension set) by necessity; the structure here is factored around
mixins so each knob is declared once, with descriptions that FastAPI
surfaces at /docs:

* :class:`SamplingKnobs` — generation parameters both request types
  share, plus the single ``to_sampling_params`` conversion;
* :class:`StampedResponse` — created/model envelope;
* :class:`ScoredChoice` — finish/stop reasons + the LTR score pair.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Union

from pydantic import BaseModel, Field

from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.utils import random_uuid


def _now() -> int:
    return int(time.time())


class ErrorResponse(BaseModel):
    object: str = Field("error", description="payload kind discriminator")
    message: str = Field(..., description="human-readable error text")
    type: str = Field(..., description="error class name")
    param: Optional[str] = Field(None, description="offending parameter")
    code: int = Field(400, description="HTTP status code")


# ---------------------------------------------------------------------------
# /v1/models
# ---------------------------------------------------------------------------


class ModelPermission(BaseModel):
    id: str = Field(default_factory=lambda: f"modelperm-{random_uuid()}")
    object: str = Field("model_permission")
    created: int = Field(default_factory=_now)
    allow_create_engine: bool = Field(False)
    allow_sampling: bool = Field(True)
    allow_logprobs: bool = Field(True)
    allow_search_indices: bool = Field(False)
    allow_view: bool = Field(True)
    allow_fine_tuning: bool = Field(False)
    organization: str = Field("*")
    group: Optional[str] = Field(None)
    is_blocking: bool = Field(False)


class ModelCard(BaseModel):
    id: str = Field(..., description="served model name")
    object: str = Field("model")
    created: int = Field(default_factory=_now)
    owned_by: str = Field("vllm-ltr-tpu")
    root: Optional[str] = Field(None)
    parent: Optional[str] = Field(None)
    permission: List[ModelPermission] = Field(default_factory=list)


class ModelList(BaseModel):
    object: str = Field("list")
    data: List[ModelCard] = Field(default_factory=list)


class ResponseFormat(BaseModel):
    type: str = Field(
        "text", description='"text" or "json_object" (the latter guides '
        "generation to valid JSON via the native token-FSM engine)")


class StreamOptions(BaseModel):
    include_usage: bool = Field(
        False, description="emit a final SSE frame with empty choices and "
        "a usage object (exact token counts for streaming clients)")


class UsageInfo(BaseModel):
    prompt_tokens: int = Field(0, description="tokens in the prompt(s)")
    total_tokens: int = Field(0, description="prompt + completion tokens")
    completion_tokens: Optional[int] = Field(
        0, description="generated tokens across all choices")


# ---------------------------------------------------------------------------
# Requests
# ---------------------------------------------------------------------------


class SamplingKnobs(BaseModel):
    """Generation parameters common to completion and chat requests,
    including the vLLM-style extensions and the LTR ``est_tokens`` hint."""
    model: str = Field(..., description="must match the served model")
    n: int = Field(1, description="number of choices to return")
    best_of: Optional[int] = Field(
        None, description="candidates sampled per choice (>= n)")
    temperature: Optional[float] = Field(
        1.0, description="softmax temperature; 0 selects greedy decoding")
    top_p: Optional[float] = Field(
        1.0, description="nucleus sampling probability mass")
    top_k: Optional[int] = Field(
        -1, description="top-k cutoff; -1 disables")
    min_p: Optional[float] = Field(
        0.0, description="minimum probability relative to the mode")
    seed: Optional[int] = Field(
        None, description="per-request RNG seed for reproducible sampling")
    presence_penalty: Optional[float] = Field(
        0.0, description="flat penalty on already-seen tokens, in [-2, 2]")
    frequency_penalty: Optional[float] = Field(
        0.0, description="count-scaled penalty on seen tokens, in [-2, 2]")
    repetition_penalty: Optional[float] = Field(
        1.0, description="multiplicative repeat penalty, in (0, 2]")
    logit_bias: Optional[Dict[str, float]] = Field(
        None, description="additive per-token-id logit bias (OpenAI "
        "semantics); applied as a per-request logits processor")
    max_tokens: Optional[int] = Field(
        16, description="generation cap; None = rest of the model window")
    min_tokens: Optional[int] = Field(
        0, description="suppress EOS until this many tokens are produced")
    stop: Optional[Union[str, List[str]]] = Field(
        default_factory=list, description="stop string(s)")
    stop_token_ids: Optional[List[int]] = Field(
        default_factory=list, description="stop token ids")
    ignore_eos: bool = Field(
        False, description="keep generating past EOS (benchmarking aid)")
    include_stop_str_in_output: bool = Field(
        False, description="keep the matched stop string in the text")
    use_beam_search: bool = Field(False, description="beam search decoding")
    length_penalty: Optional[float] = Field(
        1.0, description="beam-search length normalization exponent")
    early_stopping: Optional[bool] = Field(
        False, description="beam-search early stopping")
    skip_special_tokens: bool = Field(
        True, description="drop special tokens during detokenization")
    spaces_between_special_tokens: bool = Field(
        True, description="space-join special tokens when rendering")
    truncate_prompt_tokens: Optional[int] = Field(
        None, ge=1, description="keep only this many prompt tokens "
        "(tokenizer truncation for text prompts, the LAST N for "
        "token-id prompts — reference semantics)")
    stream: bool = Field(False, description="SSE streaming mode")
    stream_options: Optional[StreamOptions] = Field(
        None, description="streaming extras (include_usage: emit a final "
        "frame with token usage, per the OpenAI streaming API)")
    user: Optional[str] = Field(
        None, description="end-user id (accepted, unused)")
    est_tokens: Optional[int] = Field(
        16,
        description="LTR oracle hint: estimated output length, consumed "
        "by the sjf/srtf/PO scheduler policies")
    # Guided decoding (reference protocol.py:129-151); compiled to a
    # token-level FSM served as a device-side logits mask (guided/).
    guided_choice: Optional[List[str]] = Field(
        None, description="constrain the output to one of these strings")
    guided_regex: Optional[str] = Field(
        None, description="constrain the output to match this regex")
    guided_json: Optional[Union[dict, str]] = Field(
        None, description="constrain the output to this JSON schema")
    guided_grammar: Optional[str] = Field(
        None, description="Lark-style EBNF grammar constraint "
        "(scannerless pushdown guide, guided/cfg.py)")
    response_format: Optional[ResponseFormat] = Field(
        None, description="OpenAI response_format; {'type': "
        "'json_object'} constrains output to arbitrary JSON via the "
        "unbounded JSON grammar (guided/cfg.py JSON_GRAMMAR)")
    guided_decoding_backend: Optional[str] = Field(
        None, description="per-request backend override (reference "
        "protocol parity): native/outlines = strict compact guided_json, "
        "lm-format-enforcer = whitespace-tolerant guided_json; None uses "
        "the server's --guided-decoding-backend default")

    # Knobs copied verbatim into SamplingParams (same name both sides).
    _FORWARDED = ("n", "best_of", "presence_penalty", "frequency_penalty",
                  "repetition_penalty", "temperature", "top_p", "top_k",
                  "min_p", "seed", "use_beam_search", "length_penalty",
                  "early_stopping", "stop", "stop_token_ids",
                  "include_stop_str_in_output", "ignore_eos", "max_tokens",
                  "min_tokens", "skip_special_tokens",
                  "spaces_between_special_tokens", "est_tokens",
                  "guided_choice", "guided_regex", "guided_json",
                  "guided_grammar", "guided_decoding_backend")

    def _effective_logprobs(self) -> Optional[int]:
        raise NotImplementedError

    def to_sampling_params(self) -> SamplingParams:
        knobs = {name: getattr(self, name) for name in self._FORWARDED}
        if (self.response_format is not None
                and self.response_format.type == "json_object"
                and not (knobs.get("guided_choice")
                         or knobs.get("guided_regex")
                         or knobs.get("guided_json")
                         or knobs.get("guided_grammar"))):
            # Reference maps response_format json_object to its JSON
            # grammar (outlines_decoding.py:110-113); the pushdown guide
            # serves the same unbounded-nesting CFG.
            from vllm_ltr_tpu.guided.cfg import JSON_OBJECT_GRAMMAR
            knobs["guided_grammar"] = JSON_OBJECT_GRAMMAR
        processors = None
        if self.logit_bias:
            bias = {int(k): float(v) for k, v in self.logit_bias.items()}

            def apply_logit_bias(past_ids, logits, _bias=bias):
                out = logits.copy()
                for tok, b in _bias.items():
                    if 0 <= tok < out.shape[-1]:
                        out[tok] += b
                return out

            processors = [apply_logit_bias]
        return SamplingParams(logprobs=self._effective_logprobs(),
                              prompt_logprobs=self._effective_prompt_lps(),
                              logits_processors=processors, **knobs)

    def _effective_prompt_lps(self) -> Optional[int]:
        return None  # only completions with echo request prompt logprobs


class CompletionRequest(SamplingKnobs):
    prompt: Union[List[int], List[List[int]], str, List[str]] = Field(
        ..., description="string(s) or token-id array(s)")
    echo: bool = Field(False,
                       description="prepend the prompt to the completion")
    suffix: Optional[str] = Field(
        None, description="accepted for API compatibility (unsupported)")
    logprobs: Optional[int] = Field(
        None, description="return this many top logprobs per token")

    def _effective_logprobs(self) -> Optional[int]:
        return self.logprobs

    def _effective_prompt_lps(self) -> Optional[int]:
        # echo + logprobs asks for per-position prompt logprobs, the
        # reference's serving_completion echo contract.
        return self.logprobs if self.echo else None


class ChatMessage(BaseModel):
    role: str = Field(..., description="system / user / assistant")
    content: str = Field(..., description="message text")


class ChatCompletionRequest(SamplingKnobs):
    messages: List[ChatMessage] = Field(..., description="the conversation")
    temperature: Optional[float] = Field(0.7)
    max_tokens: Optional[int] = Field(None)
    logprobs: bool = Field(False, description="whether to return logprobs")
    top_logprobs: Optional[int] = Field(
        None, description="top logprobs per token (requires logprobs)")
    add_generation_prompt: bool = Field(
        True, description="append the assistant turn header to the prompt")

    def _effective_logprobs(self) -> Optional[int]:
        return self.top_logprobs if self.logprobs else None


# ---------------------------------------------------------------------------
# Responses
# ---------------------------------------------------------------------------


class LogProbs(BaseModel):
    text_offset: List[int] = Field(default_factory=list)
    token_logprobs: List[Optional[float]] = Field(default_factory=list)
    tokens: List[str] = Field(default_factory=list)
    top_logprobs: Optional[List[Optional[Dict[str, float]]]] = Field(None)


class ScoredChoice(BaseModel):
    """Choice envelope carrying the LTR score surface."""
    index: int = Field(..., description="choice index")
    logprobs: Optional[LogProbs] = Field(None)
    finish_reason: Optional[str] = Field(
        None, description="stop | length | abort")
    stop_reason: Union[int, str, None] = Field(
        None, description="matched stop string or token id")
    pred_score: Optional[float] = Field(
        None, description="LTR: embedded mid-layer predictor score")
    aux_model_score: Optional[float] = Field(
        None, description="LTR: AUX ranking-predictor score")


class CompletionResponseChoice(ScoredChoice):
    text: str = Field(..., description="generated text")


class CompletionResponseStreamChoice(ScoredChoice):
    text: str = Field(..., description="text delta")


class ChatCompletionResponseChoice(ScoredChoice):
    message: ChatMessage


class DeltaMessage(BaseModel):
    role: Optional[str] = Field(None)
    content: Optional[str] = Field(None)


class ChatCompletionResponseStreamChoice(BaseModel):
    index: int = Field(..., description="choice index")
    delta: DeltaMessage
    logprobs: Optional[LogProbs] = Field(None)
    finish_reason: Optional[str] = Field(None)
    stop_reason: Union[int, str, None] = Field(None)


class StampedResponse(BaseModel):
    created: int = Field(default_factory=_now)
    model: str = Field(..., description="served model name")


class CompletionResponse(StampedResponse):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = Field("text_completion")
    choices: List[CompletionResponseChoice]
    usage: UsageInfo


class CompletionStreamResponse(StampedResponse):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = Field("text_completion")
    choices: List[CompletionResponseStreamChoice]
    usage: Optional[UsageInfo] = Field(None)


class ChatCompletionResponse(StampedResponse):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = Field("chat.completion")
    choices: List[ChatCompletionResponseChoice]
    usage: UsageInfo


class ChatCompletionStreamResponse(StampedResponse):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = Field("chat.completion.chunk")
    choices: List[ChatCompletionResponseStreamChoice]
    usage: Optional[UsageInfo] = Field(None)
