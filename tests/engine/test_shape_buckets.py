"""Step-shape bucketing invariants (executor/input_batch.py).

The jit shape space is the product of what prepare_batch can emit; the
online compile storm (each fresh shape = 20-140 s through the remote
compile relay) is bounded ONLY by these invariants:
  - prefill: S is a function of the token bucket alone, so the shape
    count is |token_buckets|, not |token_buckets| x |seq_buckets|;
  - decode: T == S, one shape per seq bucket.
"""
import numpy as np

from vllm_ltr_tpu.executor.input_batch import make_buckets, prepare_batch
from vllm_ltr_tpu.sampling_params import SamplingParams
from vllm_ltr_tpu.sequence import Logprob, Sequence, SequenceGroupMetadata

BS = 16
TOKENS = make_buckets(16, 2048)
SEQS = make_buckets(8, 32)


def prompt_meta(rid: int, length: int):
    seq = Sequence(rid, None, [1] * length, BS)
    return SequenceGroupMetadata(
        request_id=str(rid), is_prompt=True, seq_data={rid: seq},
        sampling_params=SamplingParams(),
        block_tables={rid: list(range(seq.num_blocks()))})


def decode_meta(rid: int):
    seq = Sequence(rid, None, [1] * (BS - 1), BS)
    seq.update_num_computed_tokens(BS - 1)
    seq.append_token_id(1, {1: Logprob(0.0)})
    return SequenceGroupMetadata(
        request_id=str(rid), is_prompt=False, seq_data={rid: seq},
        sampling_params=SamplingParams(), block_tables={rid: [0]})


def shapes_of(metas, tile=1):
    b = prepare_batch(metas, BS, 64, TOKENS, SEQS, vocab_size=128,
                      prefill_tile=tile)
    return len(b.tokens), b.block_tables.shape[0]


def test_prefill_seq_dim_is_pinned_per_token_bucket():
    # One 100-token prompt and five 20-token prompts both land in the
    # 128-token bucket -> identical (T, S) -> one compiled shape.
    one = shapes_of([prompt_meta(0, 100)])
    five = shapes_of([prompt_meta(i, 20) for i in range(5)])
    assert one == five
    assert one[0] == 128


def test_prefill_shape_count_is_bounded_by_token_buckets():
    seen = set()
    rng = np.random.RandomState(0)
    for _ in range(200):
        n = int(rng.randint(1, 9))
        lens = rng.randint(1, 300, size=n)
        seen.add(shapes_of([prompt_meta(i, int(l))
                            for i, l in enumerate(lens)]))
    assert len(seen) <= len(TOKENS)
    ts = [t for t, _ in seen]
    assert len(set(ts)) == len(seen), "S must be a function of T"


def test_prefill_tile_alignment_respects_pinning():
    # Tile-aligned prefill (the Pallas kernel contract): still one shape
    # per token bucket.
    a = shapes_of([prompt_meta(0, 100)], tile=128)
    b = shapes_of([prompt_meta(0, 60), prompt_meta(1, 60)], tile=128)
    assert a[0] == 128 and b[0] == 256
    assert a[1] == min(SEQS[-1], a[0])
    assert b[1] == min(SEQS[-1], b[0])


def test_decode_t_equals_s_per_seq_bucket():
    for n, want in [(1, 8), (8, 8), (9, 16), (30, 32)]:
        t, s = shapes_of([decode_meta(i) for i in range(n)])
        assert (t, s) == (want, want)


def test_scheduler_budget_charges_prefills_tile_aligned():
    """With a 128-token tile, 65-token prompts cost 128 budget tokens each,
    so a 2048 budget admits exactly 16 — the padded step can never
    overflow the largest compiled bucket into a coarse jit shape."""
    from vllm_ltr_tpu.config import CacheConfig, SchedulerConfig
    from vllm_ltr_tpu.core.scheduler import Scheduler
    from tests.core.utils import create_dummy_prompt

    cfg = SchedulerConfig(max_num_batched_tokens=2048, max_num_seqs=64,
                          max_model_len=1024)
    cfg.prefill_token_align = 128
    cache = CacheConfig(block_size=16, swap_space=0.01)
    cache.num_gpu_blocks, cache.num_cpu_blocks = 512, 16
    sched = Scheduler(cfg, cache)
    for i in range(20):
        sched.add_seq_group(create_dummy_prompt(str(i), 65)[1])
    metas, out = sched.schedule()
    prefills = [sg for sg in out.scheduled_seq_groups
                if sg.seq_group.is_prefill()]
    assert len(prefills) == 16
    padded = sum(-(-sg.token_chunk_size // 128) * 128 for sg in prefills)
    assert padded <= 2048

    # Without alignment the same population admits more than 16 (the
    # overflow the alignment exists to prevent).
    cfg2 = SchedulerConfig(max_num_batched_tokens=2048, max_num_seqs=64,
                           max_model_len=1024)
    sched2 = Scheduler(cfg2, cache)
    for i in range(20):
        sched2.add_seq_group(create_dummy_prompt(str(i), 65)[1])
    _, out2 = sched2.schedule()
    assert len(out2.scheduled_seq_groups) == 20
