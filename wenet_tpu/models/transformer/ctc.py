"""CTC head. ref: wenet/models/transformer/ctc.py:22-92.

Loss uses the unrolled alpha recursion in ops/ctc_loss.py (optax
semantics, K recursion steps fused per launched kernel — the per-step
scan was a measured 4.8 ms serial tail of the train step) instead of
torch.nn.CTCLoss; semantics match the reference's sum-reduction /
batch-size averaging.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.ops.ctc_loss import ctc_loss
from wenet_tpu.ops.dropout import Dropout
from wenet_tpu.utils.mask import make_pad_mask


class CTC(nn.Module):
    odim: int
    encoder_output_size: int
    dropout_rate: float = 0.0
    blank_id: int = 0

    def setup(self):
        self.ctc_lo = nn.Dense(self.odim, name='ctc_lo')
        self.dropout = Dropout(self.dropout_rate)

    def __call__(self, hs_pad: jax.Array, hlens: jax.Array,
                 ys_pad: jax.Array, ys_lens: jax.Array,
                 train: bool = False,
                 row_valid: jax.Array = None) -> Tuple[jax.Array, jax.Array]:
        """Returns (batch-averaged ctc loss, log-probs (B, T, V)).

        ys_pad may be IGNORE_ID padded; pads are masked via ys_lens.
        row_valid: optional (B,) bool — rows marked False (ragged-tail
        dummy padding, executor.py) are excluded from numerator and
        denominator so tail padding is exactly unbiased."""
        h = self.dropout(hs_pad, deterministic=not train)
        logits = self.ctc_lo(h)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        logit_paddings = make_pad_mask(hlens, hs_pad.shape[1]).astype(
            jnp.float32)
        label_paddings = make_pad_mask(ys_lens, ys_pad.shape[1]).astype(
            jnp.float32)
        labels = jnp.where(label_paddings > 0, self.blank_id,
                           ys_pad).astype(jnp.int32)
        per_seq = ctc_loss(logits.astype(jnp.float32), logit_paddings,
                           labels, label_paddings,
                           blank_id=self.blank_id)
        # zero_infinity=True analog (ref ctc.py:48): torch zeroes the
        # loss of infeasible sequences (T < U + adjacent-repeat count).
        # optax doesn't return inf for those — it clamps the alpha
        # recursion at log_epsilon=-1e5 and returns a huge finite value
        # — so feasibility must be tested explicitly.
        same = (labels[:, 1:] == labels[:, :-1]) & \
            (label_paddings[:, 1:] == 0)
        repeats = jnp.sum(same, axis=1)
        feasible = hlens >= ys_lens + repeats
        per_seq = jnp.where(feasible & jnp.isfinite(per_seq), per_seq,
                            0.0)
        if row_valid is not None:
            per_seq = jnp.where(row_valid, per_seq, 0.0)
            denom = jnp.maximum(jnp.sum(row_valid), 1)
        else:
            denom = hs_pad.shape[0]
        loss = jnp.sum(per_seq) / denom
        return loss, logprobs

    def log_softmax(self, hs_pad: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(self.ctc_lo(hs_pad), axis=-1)

    def logits(self, hs_pad: jax.Array) -> jax.Array:
        return self.ctc_lo(hs_pad)

    # -- chunked heads: never materialize the (B, T, V) posterior -------
    #
    # V is 16-50x larger than D for ASR vocabularies, so the dense
    # posterior dominates a fused decode program's working set (B=64,
    # T'=375, V=4233 -> 406 MB fp32, the VMEM-spill cliff measured in
    # BENCH_NOTES' batch sweep).  Greedy/top-k decode only ever needs
    # per-frame argmax/top-k, which is computable per T-chunk inside a
    # lax.scan: each step projects (B, chunk, D) -> (B, chunk, V),
    # reduces, and discards the logits.  Peak live posterior is
    # B*chunk*V regardless of T.
    #
    # DISPATCH (argmax/topk below): chunking only pays once the dense
    # posterior actually spills — below that it serializes one large
    # MXU-friendly (B*T, D)x(D, V) contraction into n sequential scan
    # steps and LOSES throughput (measured on v5e, flagship dims:
    # B=16/T'=375/V=4233 dense 29.6k vs chunk=16 28.5k audio-sec/s;
    # B=64 dense 18.9k vs chunked 28.1k — BENCH_NOTES batch sweep).
    # So, exactly like the flash-attention `score_elems` gate
    # (attention.py), the head is dense while B*T*V is HBM-comfortable
    # and chunked past the spill point.

    # Dense/chunked gate in posterior ELEMENTS (fp32 posterior bytes =
    # 4x this).  64M sits between the measured flagship B=32 (50.8M,
    # dense fine) and B=64 (101.6M, spills) points.
    DENSE_MAX_ELEMS = 64 * 1024 * 1024
    # T-chunk used when the gated paths fall past the spill point.
    # Larger chunks keep the per-step GEMM MXU-shaped: at B=64/V=4233,
    # chunk=128 is a (8192, D)x(D, 4233) contraction per step.
    AUTO_CHUNK = 128

    def _head_params(self):
        p = self.ctc_lo.variables['params']
        return p['kernel'], p['bias']

    def _chunk_scan(self, hs_pad: jax.Array, chunk: int, step_fn):
        """scan `step_fn(logits_chunk) -> pytree of (B, chunk, ...)`
        over T-chunks of the projected head; returns the pytree with
        leading (B, T)."""
        kernel, bias = self._head_params()
        B, T, _ = hs_pad.shape
        n = -(-T // chunk)
        x = jnp.pad(hs_pad, ((0, 0), (0, n * chunk - T), (0, 0)))
        x = x.reshape(B, n, chunk, -1).transpose(1, 0, 2, 3)

        def step(_, xc):
            return 0., step_fn(xc @ kernel + bias)

        _, out = jax.lax.scan(step, 0., x)  # leaves: (n, B, chunk, ...)
        return jax.tree_util.tree_map(
            lambda a: a.transpose(1, 0, *range(2, a.ndim)).reshape(
                B, n * chunk, *a.shape[3:])[:, :T], out)

    def argmax_chunked(self, hs_pad: jax.Array,
                       blank_penalty: float = 0.0, blank_id: int = 0,
                       chunk: int = 16) -> jax.Array:
        """(B, T) greedy ids == argmax of ctc_logprobs (asr_model.py
        ctc_logprobs; ref wenet/transformer/asr_model.py:253-265):
        log_softmax is a per-frame monotone shift, so argmax over the
        (penalized) logits is identical and no softmax is needed."""

        def step_fn(logits):
            if blank_penalty > 0.0:
                logits = logits.at[:, :, blank_id].add(-blank_penalty)
            return jnp.argmax(logits, axis=-1)

        return self._chunk_scan(hs_pad, chunk, step_fn)

    def argmax(self, hs_pad: jax.Array, blank_penalty: float = 0.0,
               blank_id: int = 0) -> jax.Array:
        """Size-gated greedy head: dense argmax while the (B, T, V)
        posterior fits comfortably in HBM, chunked past the spill
        point.  Ids are identical either way (test_ctc_chunked)."""
        B, T, _ = hs_pad.shape
        if B * T * self.odim <= CTC.DENSE_MAX_ELEMS:
            logits = self.ctc_lo(hs_pad)
            if blank_penalty > 0.0:
                logits = logits.at[:, :, blank_id].add(-blank_penalty)
            return jnp.argmax(logits, axis=-1)
        return self.argmax_chunked(hs_pad, blank_penalty, blank_id,
                                   CTC.AUTO_CHUNK)

    def topk(self, hs_pad: jax.Array, k: int,
             blank_penalty: float = 0.0, blank_id: int = 0):
        """Size-gated per-frame top-k of the CTC log-posterior: dense
        below the gate, chunked past it.  (values, ids) each
        (B, T, k), identical either way (test_ctc_chunked)."""
        B, T, _ = hs_pad.shape
        if B * T * self.odim <= CTC.DENSE_MAX_ELEMS:
            logits = self.ctc_lo(hs_pad)
            if blank_penalty > 0.0:
                logits = logits.at[:, :, blank_id].add(-blank_penalty)
            return jax.lax.top_k(jax.nn.log_softmax(logits, axis=-1), k)
        return self.topk_chunked(hs_pad, k, blank_penalty, blank_id,
                                 CTC.AUTO_CHUNK)

    def topk_chunked(self, hs_pad: jax.Array, k: int,
                     blank_penalty: float = 0.0, blank_id: int = 0,
                     chunk: int = 16):
        """Per-frame (log-prob values, ids) top-k of the CTC posterior,
        each (B, T, k).  Values are true log-softmax probabilities (the
        prefix beam scores with them), computed per chunk — per-frame
        math is unchanged, only the T-tiling differs."""

        def step_fn(logits):
            if blank_penalty > 0.0:
                logits = logits.at[:, :, blank_id].add(-blank_penalty)
            return jax.lax.top_k(jax.nn.log_softmax(logits, axis=-1), k)

        return self._chunk_scan(hs_pad, chunk, step_fn)
