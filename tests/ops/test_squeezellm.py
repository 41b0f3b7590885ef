"""SqueezeLLM NUQ4: kernel vs XLA reference parity (interpret mode),
quantizer accuracy vs uniform INT4, and end-to-end serving."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_ltr_tpu.layers.quantization.squeezellm import (
    SqueezeLLMWeight, load_squeezellm_proj, quantize_squeezellm,
    squeezellm_linear)
from vllm_ltr_tpu.ops.pallas.squeezellm_matmul import (
    lut_plane_major, squeezellm_matmul_pallas, squeezellm_matmul_reference)


def test_kernel_matches_reference():
    rng = np.random.RandomState(0)
    K, N, M = 128, 256, 16
    idx = rng.randint(0, 16, size=(K, N)).astype(np.uint8)
    lut = rng.normal(size=(N, 16)).astype(np.float32)
    packed, lut_pm = lut_plane_major(idx, lut)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    ref = squeezellm_matmul_reference(x, jnp.asarray(packed),
                                      jnp.asarray(lut_pm), N)
    out = squeezellm_matmul_pallas(x, jnp.asarray(packed),
                                   jnp.asarray(lut_pm), logical_n=N,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # Exact dequant check: x = one-hot row k picks out w[k, :].
    e = jnp.zeros((1, K), jnp.float32).at[0, 3].set(1.0)
    row = squeezellm_matmul_reference(e, jnp.asarray(packed),
                                      jnp.asarray(lut_pm), N)
    expect = lut[np.arange(N), idx[3]]
    np.testing.assert_allclose(np.asarray(row)[0], expect, rtol=1e-6,
                               atol=1e-6)


def test_nuq4_beats_uniform_int4_on_nonuniform_weights():
    """The SqueezeLLM value proposition: on heavy-tailed weights,
    per-channel k-means centroids reconstruct better than uniform
    group-128 INT4."""
    from vllm_ltr_tpu.layers.quantization.int4 import (quantize_array,
                                                       quantized_linear)
    rng = np.random.RandomState(1)
    K, N = 256, 128
    w = (rng.standard_t(df=2, size=(K, N)) * 0.05).astype(np.float32)

    sq = quantize_squeezellm(w)
    eye = jnp.eye(K, dtype=jnp.float32)
    w_sq = np.asarray(squeezellm_linear(eye, sq))
    q4 = quantize_array(w, group_size=128)
    w_q4 = np.asarray(quantized_linear(eye, q4))
    err_sq = np.abs(w_sq - w).mean()
    err_q4 = np.abs(w_q4 - w).mean()
    assert err_sq < err_q4, (err_sq, err_q4)


def test_checkpoint_format_conversion():
    rng = np.random.RandomState(2)
    K, N = 64, 16
    idx = rng.randint(0, 16, size=(K, N)).astype(np.uint8)
    lut = rng.normal(size=(N, 16)).astype(np.float32)
    qweight = np.zeros((K // 8, N), np.int64)
    for j in range(8):
        qweight |= idx[j::8].astype(np.int64) << (4 * j)
    sd = {"proj.qweight": qweight.astype(np.int32),
          "proj.lookup_table": lut}
    w = load_squeezellm_proj(sd, "proj", jnp.float32)
    assert w.in_features == K and w.out_features == N
    eye = jnp.eye(K, dtype=jnp.float32)
    got = np.asarray(squeezellm_linear(eye, w))
    expect = lut[np.arange(N)[None, :], idx]
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_squeezellm_serving_e2e():
    from vllm_ltr_tpu import LLM, SamplingParams
    llm = LLM(model="test-llama-tiny",
              skip_tokenizer_init=True,
              dtype="float32",
              quantization="squeezellm",
              max_model_len=128,
              max_num_seqs=4,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01)
    out = llm.generate(prompt_token_ids=[[1, 5, 9, 13]],
                       sampling_params=SamplingParams(temperature=0.0,
                                                      max_tokens=8,
                                                      ignore_eos=True),
                       use_tqdm=False)
    assert len(out[0].outputs[0].token_ids) == 8
