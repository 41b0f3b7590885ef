"""Embedded mid-layer predictor tests (the pred_score path,
reference predictor.py + model hooks)."""
import json

import numpy as np
import pytest
import torch

from vllm_ltr_tpu import LLM, SamplingParams
from vllm_ltr_tpu.config import PredictorConfig
from vllm_ltr_tpu.transformers_utils.config import get_hf_config


def test_predictor_score_matches_reference_mlp():
    """Our functional MLP must match the reference torch LTRModel given the
    same weights."""
    import torch.nn as nn
    import jax
    import jax.numpy as jnp
    from vllm_ltr_tpu.layers.embedded_predictor import (
        load_predictor_params, predictor_score)

    n_features, sizes, d_output = 16, [8, 4], 1

    class FCModel(nn.Module):

        def __init__(self):
            super().__init__()
            dims = [n_features] + sizes
            self.input_norm = nn.LayerNorm(n_features)
            self.layers = nn.ModuleList(
                [nn.Linear(i, o) for i, o in zip(dims[:-1], dims[1:])])

        def forward(self, x):
            x = self.input_norm(x)
            for l in self.layers:
                x = torch.relu(l(x))
            return x

    class LTRModel(nn.Module):

        def __init__(self):
            super().__init__()
            self.input_layer = FCModel()

            class Out(nn.Module):

                def __init__(self):
                    super().__init__()
                    self.w_1 = nn.Linear(sizes[-1], d_output)

            self.output_layer = Out()

        def score(self, x):
            return self.output_layer.w_1(self.input_layer(x))

    torch.manual_seed(0)
    ref = LTRModel().eval()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pred.pt")
        torch.save(ref.state_dict(), path)
        config = PredictorConfig(fc_model={
            "sizes": sizes,
            "input_norm": True,
            "activation": "ReLU",
            "dropout": 0.0
        },
                                 post_model={"d_output": d_output},
                                 n_features=n_features,
                                 pred_layer_idx=1,
                                 weights=path)
        params = load_predictor_params(config, path)

    x = np.random.RandomState(0).normal(size=(5, n_features)).astype(
        np.float32)
    with torch.no_grad():
        expected = ref.score(torch.from_numpy(x)).numpy()[:, 0]
    got = np.asarray(predictor_score(params, jnp.asarray(x), config))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_engine_emits_pred_scores(tmp_path):
    from transformers import LlamaForCausalLM as HFLlama
    cfg = get_hf_config("test-llama-tiny")
    torch.manual_seed(0)
    hf = HFLlama(cfg).eval().float()
    model_dir = tmp_path / "model"
    hf.save_pretrained(model_dir)

    pred_cfg_path = tmp_path / "pred_config.json"
    pred_cfg_path.write_text(
        json.dumps({
            "fc_model": {
                "sizes": [32],
                "input_norm": True,
                "activation": "ReLU",
                "dropout": 0.0
            },
            "post_model": {
                "d_output": 1
            },
            "n_features": cfg.hidden_size,
            "pred_layer_idx": 1,
        }))

    llm = LLM(model=str(model_dir),
              skip_tokenizer_init=True,
              dtype="float32",
              max_model_len=128,
              max_num_seqs=8,
              num_gpu_blocks_override=64,
              block_size=16,
              swap_space=0.01,
              predictor_model_config=str(pred_cfg_path))
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=[[5, 6, 7], [8, 9, 10, 11]],
                        sampling_params=params,
                        use_tqdm=False)
    for out in outs:
        assert out.outputs[0].pred_score is not None
        assert np.isfinite(out.outputs[0].pred_score)
    # Generation itself must be unaffected by the predictor graft.
    with torch.no_grad():
        expected = hf.generate(torch.tensor([[5, 6, 7]]),
                               max_new_tokens=4,
                               do_sample=False)[0].tolist()[3:]
    assert outs[0].outputs[0].token_ids == expected
