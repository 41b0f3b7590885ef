"""TP execution of the quantized matmuls via shard_map.

The INT4 / SqueezeLLM plane-major layouts become per-shard concatenations
when quantized on a TP mesh (int4.shard_plan), so a NamedSharding over
the concatenation axis hands each device a self-contained layout and
``quantized_linear`` runs the unchanged kernel per shard under
``jax.shard_map`` (column-parallel: outputs shard over N; row-parallel:
psum of partials).  Reference bar: per-rank Marlin/AWQ/GPTQ GEMMs under
Megatron TP (vllm/model_executor/layers/linear.py + quantization/*).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_ltr_tpu.layers.quantization.int4 import (QuantizedWeight,
                                                   quantize_array,
                                                   quantized_linear)
from vllm_ltr_tpu.layers.quantization.squeezellm import (
    quantize_squeezellm, squeezellm_linear)
from vllm_ltr_tpu.parallel.mesh import (build_mesh, get_global_mesh,
                                        set_global_mesh)


@pytest.fixture
def tp2_mesh():
    prev = get_global_mesh()
    mesh = build_mesh(tensor_parallel_size=2, data_parallel_size=1)
    set_global_mesh(mesh)
    yield mesh
    set_global_mesh(prev)


@pytest.fixture
def tp1_mesh():
    prev = get_global_mesh()
    set_global_mesh(build_mesh(1, 1))
    yield
    set_global_mesh(prev)


def test_int4_col_parallel_shards_match_unsharded(tp2_mesh):
    rng = np.random.RandomState(0)
    K, N, G = 256, 512, 64
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = rng.normal(size=(4, K)).astype(np.float32)
    q1 = quantize_array(w, G)  # unsharded layout
    q2 = quantize_array(w, G, shards=2, shard_axis="n")
    set_global_mesh(build_mesh(1, 1))
    ref = quantized_linear(jnp.asarray(x), q1)
    set_global_mesh(tp2_mesh)
    out = quantized_linear(jnp.asarray(x), q2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int4_row_parallel_shards_match_unsharded(tp2_mesh):
    rng = np.random.RandomState(1)
    K, N, G = 256, 256, 64
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = rng.normal(size=(3, K)).astype(np.float32)
    q1 = quantize_array(w, G)
    q2 = quantize_array(w, G, shards=2, shard_axis="k")
    set_global_mesh(build_mesh(1, 1))
    ref = quantized_linear(jnp.asarray(x), q1)
    set_global_mesh(tp2_mesh)
    out = quantized_linear(jnp.asarray(x), q2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int4_unsharded_layout_on_tp_mesh_falls_back(tp2_mesh):
    """A weight whose shape didn't divide keeps the single layout; on a
    TP mesh it must route through the GSPMD-partitionable XLA path and
    still be correct."""
    rng = np.random.RandomState(2)
    K, N, G = 128, 128, 64
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = rng.normal(size=(2, K)).astype(np.float32)
    q = quantize_array(w, G)  # shards == 1
    assert q.shards == 1
    out = quantized_linear(jnp.asarray(x), q)
    set_global_mesh(build_mesh(1, 1))
    ref = quantized_linear(jnp.asarray(x), q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_squeezellm_col_and_row_shards_match_unsharded(tp2_mesh):
    rng = np.random.RandomState(3)
    K, N = 128, 256
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = rng.normal(size=(2, K)).astype(np.float32)
    q1 = quantize_squeezellm(w)
    set_global_mesh(build_mesh(1, 1))
    ref = squeezellm_linear(jnp.asarray(x), q1)
    set_global_mesh(tp2_mesh)
    for axis in ("n", "k"):
        q2 = quantize_squeezellm(w, shards=2, shard_axis=axis)
        out = squeezellm_linear(jnp.asarray(x), q2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=axis)


def test_shard_plan_uses_mesh(tp2_mesh):
    from vllm_ltr_tpu.layers.quantization.int4 import shard_plan
    assert shard_plan("q_w", 256, 512, 64) == (2, "n")
    assert shard_plan("down_w", 256, 512, 64) == (2, "k")
    # Non-divisible shapes fall back to the single layout.
    assert shard_plan("q_w", 256, 24, 64) == (1, "n")
    assert shard_plan("down_w", 100, 512, 64) == (1, "k")


def test_stacked_quantize_carries_shards(tp2_mesh):
    from vllm_ltr_tpu.layers.quantization.int4 import maybe_quantize_params
    rng = np.random.RandomState(4)
    params = {"layers": {"q_w": jnp.asarray(
        rng.normal(size=(2, 128, 256)).astype(np.float32))}}
    qp = maybe_quantize_params(params, "int4", group_size=64)
    qw = qp["layers"]["q_w"]
    assert isinstance(qw, QuantizedWeight)
    assert qw.shards == 2 and qw.shard_axis == "n"
    # Constant-index layer slice (run_layers contract) keeps the aux.
    lw = jax.tree.map(lambda a: a[0], qw)
    assert isinstance(lw, QuantizedWeight) and lw.shards == 2


# ---------------------------------------------------------------------------
# End-to-end: INT4-quantized engine at tp=2 (kernels forced through the
# shard_map interpret path) matches the tp=1 engine token-for-token.
# ---------------------------------------------------------------------------


def _run_engine(model, tp, env):
    import os
    for k, v in env.items():
        os.environ[k] = v
    try:
        from vllm_ltr_tpu import LLM, SamplingParams
        llm = LLM(model=model,
                  skip_tokenizer_init=True,
                  dtype="float32",
                  quantization="int4",
                  max_model_len=128,
                  max_num_seqs=4,
                  num_gpu_blocks_override=64,
                  block_size=16,
                  swap_space=0.01,
                  tensor_parallel_size=tp)
        rng = np.random.RandomState(0)
        prompts = [list(map(int, rng.randint(1, 400, size=n)))
                   for n in (7, 12)]
        params = SamplingParams(temperature=0.0, max_tokens=5,
                                ignore_eos=True)
        outs = llm.generate(prompt_token_ids=prompts,
                            sampling_params=params, use_tqdm=False)
        return [o.outputs[0].token_ids for o in outs]
    finally:
        for k in env:
            os.environ.pop(k, None)
        set_global_mesh(build_mesh(1, 1))


def test_engine_int4_tp2_matches_tp1(tp1_mesh):
    ref = _run_engine("test-llama-tiny", 1, {})
    got = _run_engine("test-llama-tiny", 2,
                      {"LTR_TPU_PALLAS_INTERPRET": "1"})
    assert got == ref
