"""Tokenizer pool: parallel prompt encoding matches inline encoding and
the async engine path uses it (reference tokenizer_group pool behavior)."""
import asyncio

import pytest
import torch

from vllm_ltr_tpu.transformers_utils.config import get_hf_config

from .test_chat_and_detokenize import tok_model_dir  # noqa: F401 (fixture)


def test_pool_encode_matches_inline(tok_model_dir):  # noqa: F811
    from vllm_ltr_tpu.transformers_utils.tokenizer import get_tokenizer
    from vllm_ltr_tpu.transformers_utils.tokenizer_pool import TokenizerPool

    tok = get_tokenizer(tok_model_dir)
    pool = TokenizerPool(tok, pool_size=4)
    prompts = ["the quick brown fox", "hello world how are you",
               "pack my box"] * 8

    async def encode_all():
        return await asyncio.gather(
            *[pool.encode_async(p) for p in prompts])

    got = asyncio.run(encode_all())
    assert got == [tok.encode(p) for p in prompts]
    # Inline (pool_size=0) still works and enforces max_input_length.
    inline = TokenizerPool(tok, pool_size=0, max_input_length=2)
    with pytest.raises(ValueError):
        inline.encode("the quick brown fox jumps")
    pool.shutdown()


def test_async_engine_uses_pool(tok_model_dir):  # noqa: F811
    from vllm_ltr_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_ltr_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_ltr_tpu.sampling_params import SamplingParams

    engine = AsyncLLMEngine.from_engine_args(
        AsyncEngineArgs(model=tok_model_dir,
                        dtype="float32",
                        max_model_len=128,
                        max_num_seqs=4,
                        num_gpu_blocks_override=64,
                        block_size=16,
                        swap_space=0.01,
                        tokenizer_pool_size=2,
                        disable_log_requests=True,
                        disable_log_stats=True))
    assert engine.tokenizer_pool is not None
    assert engine.tokenizer_pool._pool is not None

    async def run():
        outs = []
        async for out in engine.generate(
                "the quick brown fox",
                SamplingParams(temperature=0.0, max_tokens=4,
                               ignore_eos=True), "req-1"):
            outs.append(out)
        return outs

    outs = asyncio.run(run())
    assert outs and outs[-1].finished
    assert len(outs[-1].outputs[0].token_ids) == 4
