// Native batch packer: flattens the scheduler's per-step plan into the
// padded device arrays consumed by the jitted step function.
//
// TPU-native counterpart of the reference's host-side input preparation
// (vllm/worker/model_runner.py _prepare_prompt/_prepare_decode, whose
// per-token Python loops are the engine's per-step host hot path; the
// reference offloads its device hot loops to csrc/ CUDA — here the compute
// hot loops are Pallas/XLA and the HOST hot loop moves to C++).
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in image).
//
// Build: make -C csrc_tpu  (see Makefile; auto-built on first import by
// vllm_ltr_tpu/executor/native.py, with a numpy fallback when unavailable).

#include <cstdint>

extern "C" {

// Fill the flattened token arrays for one step.
//   all_tokens   [total]  concatenated new token ids, row-major by row
//   row_start    [R]      offset of each row's tokens in all_tokens
//   out_start    [R]      destination offset of the row in the flat layout
//                         (tile-aligned when the Pallas prefill kernel will
//                         consume the batch; gaps stay padding)
//   row_len      [R]      number of new tokens in the row
//   row_pos0     [R]      absolute position of the row's first new token
//   block_tables [R*mb]   physical block numbers per row (-1 = none)
// Outputs (caller-allocated, length T):
//   tokens (pad 0), positions (pad 0), token_seq (pad -1), slots (pad -1)
// Returns the number of real tokens written, or -1 on overflow.
int32_t pack_batch(const int32_t* all_tokens,
                   const int32_t* row_start,
                   const int32_t* out_start,
                   const int32_t* row_len,
                   const int32_t* row_pos0,
                   const int32_t* block_tables,
                   int32_t num_rows,
                   int32_t mb,
                   int32_t block_size,
                   int32_t T,
                   int32_t* tokens,
                   int32_t* positions,
                   int32_t* token_seq,
                   int32_t* slots) {
    for (int32_t t = 0; t < T; ++t) {
        tokens[t] = 0;
        positions[t] = 0;
        token_seq[t] = -1;
        slots[t] = -1;
    }
    int32_t written = 0;
    for (int32_t r = 0; r < num_rows; ++r) {
        const int32_t len = row_len[r];
        const int32_t src = row_start[r];
        const int32_t dst = out_start[r];
        const int32_t pos0 = row_pos0[r];
        if (dst + len > T) return -1;
        const int32_t* bt = block_tables + (int64_t)r * mb;
        for (int32_t i = 0; i < len; ++i) {
            const int32_t pos = pos0 + i;
            const int32_t t = dst + i;
            tokens[t] = all_tokens[src + i];
            positions[t] = pos;
            token_seq[t] = r;
            const int32_t b = pos / block_size;
            const int32_t blk = (b < mb) ? bt[b] : -1;
            slots[t] = (blk < 0) ? -1
                                 : blk * block_size + pos % block_size;
        }
        written += len;
    }
    return written;
}

// Saturating token-count histogram for sampling penalties:
//   token_ids [total] row-major; row_start/row_len as above;
//   counts [R*vocab] uint8 (caller-zeroed), saturates at 255.
void count_tokens(const int32_t* token_ids,
                  const int32_t* row_start,
                  const int32_t* row_len,
                  int32_t num_rows,
                  int32_t vocab,
                  uint8_t* counts) {
    for (int32_t r = 0; r < num_rows; ++r) {
        uint8_t* row = counts + (int64_t)r * vocab;
        const int32_t start = row_start[r];
        for (int32_t i = 0; i < row_len[r]; ++i) {
            const int32_t tok = token_ids[start + i];
            if (tok >= 0 && tok < vocab && row[tok] < 255) row[tok]++;
        }
    }
}

}  // extern "C"
