"""Two-process multi-host test over localhost (CPU backend).

Counterpart of the reference's 2-GPU distributed tests
(tests/distributed/test_basic_distributed_correctness.py), but with real
separate processes joined by jax.distributed — the mesh spans both
processes' devices, the leader schedules, the follower mirrors the device
dispatches (executor.serve_follower).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["LTR_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, ModelConfig, ParallelConfig,
                                 SchedulerConfig)
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.sampling_params import SamplingParams
from transformers import LlamaConfig

hf_config = LlamaConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=1,
                        num_attention_heads=4, num_key_value_heads=4,
                        max_position_embeddings=128)
hf_config.architectures = ["LlamaForCausalLM"]

engine_config = EngineConfig(
    model_config=ModelConfig(model="mh-llama", skip_tokenizer_init=True,
                             dtype="float32", max_model_len=64,
                             hf_config=hf_config),
    cache_config=CacheConfig(block_size=16, swap_space=0.01,
                             num_device_blocks_override=32),
    parallel_config=ParallelConfig(
        tensor_parallel_size=4,
        distributed_coordinator=os.environ["MH_COORD"],
        distributed_num_processes=2,
        distributed_process_id=int(os.environ["MH_PID"])),
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=64,
                                     schedule_type="srtf"),
    device_config=DeviceConfig("cpu"),
    load_config=LoadConfig(load_format="dummy"),
)
engine = LLMEngine(engine_config)
ex = engine.model_executor
assert ex.multihost, "expected a 2-process runtime"

if ex.is_leader:
    engine.add_request("a", prompt_token_ids=[3, 1, 4, 1, 5],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=3, ignore_eos=True,
                           est_tokens=4))
    engine.add_request("b", prompt_token_ids=[2, 7, 1],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=3, ignore_eos=True,
                           est_tokens=2))
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    ex.shutdown_followers()
    print("RESULT " + json.dumps(done))
else:
    ex.serve_follower()
    print("RESULT {}")
"""


_WORKER_MULTI_STEP = r"""
import json, os, sys
sys.path.insert(0, os.environ["LTR_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, LoRAConfig, ModelConfig,
                                 ParallelConfig, SchedulerConfig)
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.lora import LoRARequest
from vllm_ltr_tpu.sampling_params import SamplingParams
from transformers import LlamaConfig

hf_config = LlamaConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=1,
                        num_attention_heads=4, num_key_value_heads=4,
                        max_position_embeddings=128)
hf_config.architectures = ["LlamaForCausalLM"]

# Multi-step decode (K=4 -> _mh_broadcast_multi_step) + a LoRA adapter
# (OP_ADD_LORA mirror; the adapter dir is shared via the filesystem).
engine_config = EngineConfig(
    model_config=ModelConfig(model="mh-llama-ms", skip_tokenizer_init=True,
                             dtype="float32", max_model_len=64,
                             hf_config=hf_config),
    cache_config=CacheConfig(block_size=16, swap_space=0.01,
                             num_device_blocks_override=32),
    parallel_config=ParallelConfig(
        tensor_parallel_size=4,
        distributed_coordinator=os.environ["MH_COORD"],
        distributed_num_processes=2,
        distributed_process_id=int(os.environ["MH_PID"])),
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=64,
                                     schedule_type="fcfs",
                                     decode_steps_per_dispatch=4),
    device_config=DeviceConfig("cpu"),
    load_config=LoadConfig(load_format="dummy"),
    lora_config=LoRAConfig(max_loras=2, max_lora_rank=4),
)
engine = LLMEngine(engine_config)
ex = engine.model_executor
assert ex.multihost and ex._multi_step_fn is not None

if ex.is_leader:
    engine.add_request("plain", prompt_token_ids=[3, 1, 4, 1, 5],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=8, ignore_eos=True))
    engine.add_request("lora", prompt_token_ids=[2, 7, 1, 8],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=8, ignore_eos=True),
                       lora_request=LoRARequest(
                           "a1", 1, os.environ["MH_ADAPTER"]))
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    stats = ex.dispatch_stats
    assert stats["decode_fused_dispatches"] > 0, stats
    ex.shutdown_followers()
    print("RESULT " + json.dumps(done))
else:
    ex.serve_follower()
    assert 1 in ex.lora_bank.slot_of, "follower never mirrored the adapter"
    print("RESULT {}")
"""


_WORKER_SPEC = r"""
import json, os, sys
sys.path.insert(0, os.environ["LTR_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, ModelConfig, ParallelConfig,
                                 SchedulerConfig, SpeculativeConfig)
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

hf_config = get_hf_config("test-llama-tiny")
hf_config.architectures = ["LlamaForCausalLM"]

engine_config = EngineConfig(
    model_config=ModelConfig(model=os.environ["MH_TARGET"],
                             skip_tokenizer_init=True,
                             dtype="float32", max_model_len=64,
                             hf_config=hf_config),
    cache_config=CacheConfig(block_size=16, swap_space=0.01,
                             num_device_blocks_override=32),
    parallel_config=ParallelConfig(
        tensor_parallel_size=2,
        distributed_coordinator=os.environ["MH_COORD"],
        distributed_num_processes=2,
        distributed_process_id=int(os.environ["MH_PID"])),
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=64,
                                     schedule_type="fcfs"),
    device_config=DeviceConfig("cpu"),
    load_config=LoadConfig(load_format="auto"),
    speculative_config=SpeculativeConfig(
        draft_model=os.environ["MH_DRAFT"], num_speculative_tokens=2),
)
engine = LLMEngine(engine_config)
ex = engine.model_executor
assert ex.multihost and ex._spec_fn is not None

if ex.is_leader:
    engine.add_request("s", prompt_token_ids=[3, 1, 4, 1, 5],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=6, ignore_eos=True))
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    ex.shutdown_followers()
    print("RESULT " + json.dumps(done))
else:
    ex.serve_follower()
    print("RESULT {}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(420)
def test_two_process_serving_step(tmp_path):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "LTR_REPO": os.path.abspath(
                os.path.join(os.path.dirname(__file__), "..", "..")),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "MH_COORD": f"localhost:{port}",
            "MH_PID": str(pid),
            "LTR_TPU_DISABLE_NATIVE": "0",
        })
        procs.append(
            subprocess.Popen([sys.executable, "-c", _WORKER],
                             env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE,
                             text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        if rc != 0 and ("Unimplemented" in err or "UNIMPLEMENTED" in err
                        or "cross-host" in err):
            pytest.skip("CPU backend lacks cross-process collectives here")
        assert rc == 0, f"worker failed:\n{err[-4000:]}"

    leader_line = [
        l for l in outs[0][1].splitlines() if l.startswith("RESULT ")
    ]
    assert leader_line, outs[0][1]
    done = json.loads(leader_line[-1][len("RESULT "):])
    assert set(done) == {"a", "b"}
    assert all(len(v) == 3 for v in done.values())


def _run_pair(script: str, extra_env: dict, device_count: int = 2):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "LTR_REPO": os.path.abspath(
                os.path.join(os.path.dirname(__file__), "..", "..")),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={device_count}",
            "MH_COORD": f"localhost:{port}",
            "MH_PID": str(pid),
        })
        env.update(extra_env)
        procs.append(
            subprocess.Popen([sys.executable, "-c", script],
                             env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE,
                             text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0 and ("Unimplemented" in err or "UNIMPLEMENTED" in err
                        or "cross-host" in err):
            pytest.skip("CPU backend lacks cross-process collectives here")
        assert rc == 0, f"worker failed:\n{err[-4000:]}"
    return outs


@pytest.mark.timeout(420)
def test_two_process_multi_step_and_lora(tmp_path):
    """Exercises _mh_broadcast_multi_step (K=4 fused decode) and the
    OP_ADD_LORA adapter mirror on a real 2-process runtime (VERDICT r2
    item 7)."""
    import json as _json
    import numpy as np
    from safetensors.numpy import save_file
    # Build a rank-4 peft adapter for the 1-layer worker model.
    d = tmp_path / "adapter"
    d.mkdir()
    (d / "adapter_config.json").write_text(
        _json.dumps({"r": 4, "lora_alpha": 8,
                     "target_modules": ["q_proj", "v_proj"]}))
    rng = np.random.RandomState(5)
    sd = {}
    for t, out_dim in (("q_proj", 64), ("v_proj", 64)):
        base = f"base_model.model.model.layers.0.self_attn.{t}"
        sd[base + ".lora_A.weight"] = rng.normal(size=(4, 64)).astype(
            np.float32) * 0.05
        sd[base + ".lora_B.weight"] = rng.normal(size=(out_dim, 4)).astype(
            np.float32) * 0.05
    save_file(sd, str(d / "adapter_model.safetensors"))

    outs = _run_pair(_WORKER_MULTI_STEP, {"MH_ADAPTER": str(d)})
    leader_line = [
        l for l in outs[0][1].splitlines() if l.startswith("RESULT ")
    ]
    assert leader_line, outs[0][1]
    done = json.loads(leader_line[-1][len("RESULT "):])
    assert set(done) == {"plain", "lora"}
    assert all(len(v) == 8 for v in done.values())


@pytest.mark.timeout(420)
def test_two_process_spec_decode(tmp_path):
    """Exercises OP_SPEC_STEP (draft propose + verify mirrored on the
    follower) and the follower-side draft-cache prefill sync."""
    import torch
    from transformers import LlamaForCausalLM as HFLlama
    from vllm_ltr_tpu.transformers_utils.config import get_hf_config
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    target_dir = tmp_path / "target"
    HFLlama(cfg).eval().float().save_pretrained(target_dir)
    torch.manual_seed(123)
    draft_dir = tmp_path / "draft"
    HFLlama(cfg).eval().float().save_pretrained(draft_dir)

    outs = _run_pair(_WORKER_SPEC, {"MH_TARGET": str(target_dir),
                                    "MH_DRAFT": str(draft_dir)},
                     device_count=1)
    leader_line = [
        l for l in outs[0][1].splitlines() if l.startswith("RESULT ")
    ]
    assert leader_line, outs[0][1]
    done = json.loads(leader_line[-1][len("RESULT "):])
    assert set(done) == {"s"} and len(done["s"]) == 6


_WORKER_VLM = r"""
import json, os, sys
sys.path.insert(0, os.environ["LTR_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, ModelConfig, ParallelConfig,
                                 SchedulerConfig)
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.transformers_utils.config import get_hf_config

hf_config = get_hf_config("test-llava-tiny")

engine_config = EngineConfig(
    model_config=ModelConfig(model="test-llava-tiny",
                             skip_tokenizer_init=True, dtype="float32",
                             max_model_len=64, hf_config=hf_config),
    cache_config=CacheConfig(block_size=16, swap_space=0.01,
                             num_device_blocks_override=32),
    parallel_config=ParallelConfig(
        tensor_parallel_size=2,
        distributed_coordinator=os.environ["MH_COORD"],
        distributed_num_processes=2,
        distributed_process_id=int(os.environ["MH_PID"])),
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=64),
    device_config=DeviceConfig("cpu"),
    load_config=LoadConfig(load_format="dummy"),
)
engine = LLMEngine(engine_config)
ex = engine.model_executor
assert ex.multihost, "expected a 2-process runtime"

if ex.is_leader:
    image_token = 127
    prompt = [image_token] * 16 + [5, 6, 7]
    rng = np.random.RandomState(0)
    img_a = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    img_b = (rng.normal(size=(1, 3, 32, 32)) * 5 + 3).astype(np.float32)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    engine.add_request("a", prompt_token_ids=list(prompt),
                       sampling_params=sp,
                       multi_modal_data={"pixel_values": img_a})
    engine.add_request("b", prompt_token_ids=list(prompt),
                       sampling_params=sp,
                       multi_modal_data={"pixel_values": img_b})
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    ex.shutdown_followers()
    print("RESULT " + json.dumps(done))
else:
    ex.serve_follower()
    print("RESULT {}")
"""


@pytest.mark.timeout(420)
def test_two_process_vlm_serving():
    """Multi-host VLM: the leader's vision tower runs once and the
    projected [T, H] image features are mirrored to followers through
    the OP_STEP broadcast (round 4; closes the round-3 known gap)."""
    outs = _run_pair(_WORKER_VLM, {})
    leader_line = [
        l for l in outs[0][1].splitlines() if l.startswith("RESULT ")
    ]
    assert leader_line, outs[0][1]
    done = json.loads(leader_line[-1][len("RESULT "):])
    assert set(done) == {"a", "b"}
    assert all(len(v) == 5 for v in done.values())
    # Different images must produce different greedy generations — the
    # mirrored embeds actually reach both processes' shards of the LM.
    assert done["a"] != done["b"]


_WORKER_GUIDED = r"""
import json, os, sys
sys.path.insert(0, os.environ["LTR_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, ModelConfig, ParallelConfig,
                                 SchedulerConfig)
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.guided.manager import GuidedDecodingManager
from vllm_ltr_tpu.sampling_params import SamplingParams
from transformers import LlamaConfig

hf_config = LlamaConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=1,
                        num_attention_heads=4, num_key_value_heads=4,
                        max_position_embeddings=128)
hf_config.architectures = ["LlamaForCausalLM"]

engine_config = EngineConfig(
    model_config=ModelConfig(model="mh-guided", skip_tokenizer_init=True,
                             dtype="float32", max_model_len=64,
                             hf_config=hf_config),
    cache_config=CacheConfig(block_size=16, swap_space=0.01,
                             num_device_blocks_override=32),
    parallel_config=ParallelConfig(
        tensor_parallel_size=2,
        distributed_coordinator=os.environ["MH_COORD"],
        distributed_num_processes=2,
        distributed_process_id=int(os.environ["MH_PID"])),
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=64),
    device_config=DeviceConfig("cpu"),
    load_config=LoadConfig(load_format="dummy"),
)
engine = LLMEngine(engine_config)
ex = engine.model_executor
assert ex.multihost, "expected a 2-process runtime"

if ex.is_leader:
    class _Vocab:
        eos_token_id = 2
        all_special_ids = [0, 1, 2]
        def get_vocab(self):
            return {f"t{i}": i for i in range(256)}

    guide = GuidedDecodingManager(_Vocab()).guide_for("choice", ["t5t6"])
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
    engine.add_request("g", prompt_token_ids=[9, 8, 7], sampling_params=sp)
    engine.scheduler.waiting[-1].guide = guide
    engine.add_request("free", prompt_token_ids=[3, 4],
                       sampling_params=sp)
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    ex.shutdown_followers()
    print("RESULT " + json.dumps(done))
else:
    ex.serve_follower()
    print("RESULT {}")
"""


@pytest.mark.timeout(420)
def test_two_process_guided_mask():
    """Guided decoding on multi-host: the packed allowed-token mask is
    mirrored through the OP_STEP broadcast so leader and follower run
    the identical has_logits_mask program; the guide (choice 't5t6'
    over a synthetic vocab) must force tokens [5, 6]."""
    outs = _run_pair(_WORKER_GUIDED, {})
    leader_line = [
        l for l in outs[0][1].splitlines() if l.startswith("RESULT ")
    ]
    assert leader_line, outs[0][1]
    done = json.loads(leader_line[-1][len("RESULT "):])
    assert done["g"] == [5, 6], done
    assert len(done["free"]) == 2


_WORKER_LOGITS_PROC = r"""
import json, os, sys
sys.path.insert(0, os.environ["LTR_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from vllm_ltr_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                 LoadConfig, ModelConfig, ParallelConfig,
                                 SchedulerConfig)
from vllm_ltr_tpu.engine.llm_engine import LLMEngine
from vllm_ltr_tpu.sampling_params import SamplingParams
from transformers import LlamaConfig

hf_config = LlamaConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=1,
                        num_attention_heads=4, num_key_value_heads=4,
                        max_position_embeddings=128)
hf_config.architectures = ["LlamaForCausalLM"]

engine_config = EngineConfig(
    model_config=ModelConfig(model="mh-logproc", skip_tokenizer_init=True,
                             dtype="float32", max_model_len=64,
                             hf_config=hf_config),
    cache_config=CacheConfig(block_size=16, swap_space=0.01,
                             num_device_blocks_override=32),
    parallel_config=ParallelConfig(
        tensor_parallel_size=4,
        distributed_coordinator=os.environ["MH_COORD"],
        distributed_num_processes=2,
        distributed_process_id=int(os.environ["MH_PID"])),
    scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                     max_num_seqs=4, max_model_len=64,
                                     schedule_type="fcfs"),
    device_config=DeviceConfig("cpu"),
    load_config=LoadConfig(load_format="dummy"),
)
engine = LLMEngine(engine_config)
ex = engine.model_executor
assert ex.multihost, "expected a 2-process runtime"

if ex.is_leader:
    # OpenAI logit_bias semantics: a host logits processor that forces
    # token 42 on every step.  The follower must mirror the forward-only
    # (return_logits) program variant; phase 2 samples on the leader.
    def force_42(out_ids, logits):
        logits = np.asarray(logits).copy()
        logits[42] += 1000.0
        return logits

    engine.add_request("biased", prompt_token_ids=[3, 1, 4, 1, 5],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=3, ignore_eos=True,
                           logits_processors=[force_42]))
    # A plain request in the same batch: regular and two-phase steps
    # interleave through the same broadcast stream.
    engine.add_request("plain", prompt_token_ids=[2, 7, 1],
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=3, ignore_eos=True))
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    ex.shutdown_followers()
    print("RESULT " + json.dumps(done))
else:
    ex.serve_follower()
    print("RESULT {}")
"""


@pytest.mark.timeout(420)
def test_two_process_logits_processors():
    """Per-request logits_processors on multi-host: followers mirror the
    forward-only program variant via the OP_STEP header (return_logits),
    the leader applies the host callables and samples leader-locally.
    The +1000 bias on token 42 must dominate greedy sampling on every
    step of the biased request, while an unbiased request decodes
    normally in the same batch."""
    outs = _run_pair(_WORKER_LOGITS_PROC, {})
    leader_line = [
        l for l in outs[0][1].splitlines() if l.startswith("RESULT ")
    ]
    assert leader_line, outs[0][1]
    done = json.loads(leader_line[-1][len("RESULT "):])
    assert done["biased"] == [42, 42, 42], done
    assert len(done["plain"]) == 3
