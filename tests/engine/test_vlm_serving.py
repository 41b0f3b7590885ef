"""End-to-end LLaVA serving: image features flow through the engine
(scheduler -> metadata -> executor vision pre-pass -> merged embeddings)
and change the generation (reference llava image_input path)."""
import numpy as np

from vllm_ltr_tpu import LLM, SamplingParams


def test_llava_generates_and_images_matter():
    llm = LLM(model="test-llava-tiny",
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=64,
              max_num_seqs=4,
              max_num_batched_tokens=64,
              num_gpu_blocks_override=32,
              swap_space=0.01)
    image_token = 127
    prompt = [image_token] * 16 + [5, 6, 7]
    rng = np.random.RandomState(0)
    img_a = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    img_b = (rng.normal(size=(1, 3, 32, 32)) * 5 + 3).astype(np.float32)

    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out_a = llm.generate(prompt_token_ids=[list(prompt)],
                         sampling_params=params, use_tqdm=False,
                         multi_modal_data={"pixel_values": img_a})
    out_b = llm.generate(prompt_token_ids=[list(prompt)],
                         sampling_params=params, use_tqdm=False,
                         multi_modal_data={"pixel_values": img_b})
    toks_a = out_a[0].outputs[0].token_ids
    toks_b = out_b[0].outputs[0].token_ids
    assert len(toks_a) == 6 and len(toks_b) == 6
    # Different images must produce different greedy generations for a
    # random-weight model (the embeds actually reach the LM).
    assert toks_a != toks_b

    # Precomputed image_features path (reference image_input_type
    # "image_features").
    from vllm_ltr_tpu.models.llava import LlavaForConditionalGeneration
    import jax.numpy as jnp
    executor = llm.llm_engine.model_executor
    feats = LlavaForConditionalGeneration.encode_images(
        executor.params, jnp.asarray(img_a), executor.hf_config)
    out_c = llm.generate(prompt_token_ids=[list(prompt)],
                         sampling_params=params, use_tqdm=False,
                         multi_modal_data={
                             "image_features": np.asarray(feats)})
    assert out_c[0].outputs[0].token_ids == toks_a
