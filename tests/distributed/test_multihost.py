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
