"""Transducer model (RNN-T + optional CTC/attention aux losses).

ref: wenet/models/transducer/transducer.py:20-572.  The greedy search
runs as a fixed-shape lax.scan with an inner no-blank budget (the
reference is a python while loop over frames, search/greedy_search.py),
batched over utterances.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wenet_tpu.models.transformer.asr_model import ASRModel
from wenet_tpu.ops.rnnt_loss import rnnt_loss_logits
from wenet_tpu.utils.common import IGNORE_ID, add_blank


class Transducer(ASRModel):
    """Fields beyond ASRModel: predictor / joint / weights."""
    predictor: Optional[nn.Module] = None
    joint: Optional[nn.Module] = None
    blank: int = 0
    transducer_weight: float = 1.0
    attention_weight: float = 0.0

    default_decode_method: str = 'rnnt_greedy_search'

    @property
    def attention_decoder_weight(self) -> float:
        return 1 - self.transducer_weight - self.ctc_weight

    def __call__(self,
                 feats: jax.Array,
                 feats_lengths: jax.Array,
                 target: jax.Array,
                 target_lengths: jax.Array,
                 train: bool = False,
                 chunk_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """ref: transducer.py:96-183."""
        encoder_out, encoder_mask = self.encoder(feats, feats_lengths,
                                                 train=train,
                                                 chunk_rng=chunk_rng)
        encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)

        loss_rnnt = self._compute_rnnt_loss(encoder_out,
                                            encoder_out_lens, target,
                                            target_lengths, train)
        loss = self.transducer_weight * loss_rnnt
        loss_att = None
        if self.attention_decoder_weight != 0.0 and \
                self.decoder is not None:
            loss_att, acc_att = self._calc_att_loss(
                encoder_out, encoder_mask, target, target_lengths,
                train=train)
            loss = loss + self.attention_decoder_weight * loss_att
        else:
            acc_att = None
        loss_ctc = None
        if self.ctc_weight != 0.0 and self.ctc is not None:
            loss_ctc, _ = self.ctc(encoder_out, encoder_out_lens, target,
                                   target_lengths, train=train)
            loss = loss + self.ctc_weight * loss_ctc
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'loss_rnnt': loss_rnnt, 'th_accuracy': acc_att}

    def _compute_rnnt_loss(self, encoder_out, encoder_out_lens, target,
                           target_lengths, train: bool):
        """ref: transducer.py:139-162."""
        # labels padded with blank for the predictor input
        ys_in = add_blank(target, self.blank, self.ignore_id)  # (B, U+1)
        pred_out = self.predictor(ys_in, train=train)  # (B, U+1, P)
        logits = self.joint(encoder_out, pred_out, train=train)
        labels = jnp.where(target == self.ignore_id, self.blank,
                           target).astype(jnp.int32)
        return rnnt_loss_logits(logits, labels,
                                encoder_out_lens.astype(jnp.int32),
                                target_lengths.astype(jnp.int32),
                                blank=self.blank, reduction='mean')

    # ------------------------------------------------------------------
    def greedy_search(self, encoder_out: jax.Array,
                      encoder_out_lens: jax.Array,
                      n_steps: int = 64) -> jax.Array:
        """Batched scan greedy decode -> (B, T*?) token matrix padded
        with blank.  ref: search/greedy_search.py:6-54.

        Each scan step consumes either one encoder frame (blank emitted
        or budget exhausted) or emits one token; total steps bounded by
        T * 2 for budget sanity (budget counts per-frame non-blanks)."""
        B, T, _ = encoder_out.shape
        max_steps = T * 2

        pred_state = self.predictor.init_state(B, encoder_out.dtype)
        padding = jnp.zeros((B, 1), encoder_out.dtype)
        first_in = jnp.full((B, 1), self.blank, jnp.int32)
        pred_out, pred_state = self.predictor.forward_step(
            first_in, padding, pred_state)

        tokens0 = jnp.full((B, max_steps), self.blank, jnp.int32)

        def step(carry, _):
            t, noblk, n_emit, pred_out, state, tokens = carry
            frame = jnp.take_along_axis(
                encoder_out, jnp.minimum(t, T - 1)[:, None, None],
                axis=1)  # (B, 1, E)
            joint = self.joint(frame, pred_out)  # (B, 1, 1, V)
            best = jnp.argmax(joint[:, 0, 0, :], axis=-1).astype(
                jnp.int32)  # (B,)
            active = t < encoder_out_lens
            emit = (best != self.blank) & (noblk < n_steps) & active
            # write emitted tokens
            tokens = tokens.at[jnp.arange(B), n_emit].set(
                jnp.where(emit, best, self.blank))
            n_emit = n_emit + emit.astype(jnp.int32)
            # update predictor for emitting rows
            new_pred_out, new_state = self.predictor.forward_step(
                best[:, None], padding, state)
            sel = emit[:, None, None]
            pred_out = jnp.where(sel, new_pred_out, pred_out)
            state = self.predictor.select_state(new_state, state, emit)
            # advance frame when not emitting
            adv = (~emit) & active
            t = t + adv.astype(jnp.int32)
            noblk = jnp.where(emit, noblk + 1, 0)
            return (t, noblk, n_emit, pred_out, state, tokens), None

        init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), jnp.int32), pred_out, pred_state,
                tokens0)
        (t, _, n_emit, _, _, tokens), _ = jax.lax.scan(
            step, init, None, length=max_steps)
        return tokens, n_emit

    def beam_search(self, encoder_out: jax.Array,
                    encoder_out_lens: jax.Array,
                    beam_size: int = 4,
                    max_sym_per_frame: int = 2,
                    max_len: int = 64):
        """Batched RNN-T prefix beam search, fully on-device.

        ref: wenet/models/transducer/search/prefix_beam_search.py:22-139
        (same semantics: per frame, hyps may emit up to
        `max_sym_per_frame` symbols then take blank; equal prefixes are
        probability-merged).  Fixed shapes: beam K, prefix buffer
        `max_len`, rolling-hash dedup with pairwise logsumexp merge —
        one lax.scan over frames, no host loop.

        Returns (tokens (B,K,U), lens (B,K), scores (B,K)) sorted by
        score descending.
        """
        B, T, E = encoder_out.shape
        K, U = beam_size, max_len
        NEG = -1.0e30
        MUL = jnp.uint32(1000003)

        def _state_axis(x):
            # predictor state batch axis: RNN keeps (L, B*K, H) (torch
            # LSTM layout, axis 1); embedding/conv keep (B*K, ...)
            if x.ndim >= 2 and x.shape[1] == B * K and \
                    x.shape[0] != B * K:
                return 1
            return 0

        def gather_state(tree, idx_flat):
            return jax.tree_util.tree_map(
                lambda x: jnp.take(x, idx_flat, axis=_state_axis(x))
                if hasattr(x, 'ndim') and x.ndim else x, tree)

        pred_state0 = self.predictor.init_state(B * K,
                                                encoder_out.dtype)
        padding = jnp.zeros((B * K, 1), encoder_out.dtype)
        first_in = jnp.full((B * K, 1), self.blank, jnp.int32)
        pred_out0, pred_state0 = self.predictor.forward_step(
            first_in, padding, pred_state0)  # (B*K,1,P)

        tokens0 = jnp.full((B, K, U), self.blank, jnp.int32)
        lens0 = jnp.zeros((B, K), jnp.int32)
        scores0 = jnp.full((B, K), NEG).at[:, 0].set(0.0)
        # distinct dummy hashes keep dead init rows from merging
        hash0 = (jnp.arange(K, dtype=jnp.uint32) + 2).at[0].set(
            1)[None, :].repeat(B, 0)

        base = (jnp.arange(B)[:, None] * K)  # (B,1) row offset

        def joint_logp(frame, pred_out):
            # frame (B,E); pred_out (B*K,1,P) -> (B,K,V) log-probs
            enc = jnp.repeat(frame[:, None, :], K, axis=0).reshape(
                B * K, 1, E)
            logits = self.joint(enc, pred_out)  # (B*K,1,1,V)
            return jax.nn.log_softmax(
                logits[:, 0, 0, :].astype(jnp.float32), -1).reshape(
                    B, K, -1)

        def frame_step(carry, inp):
            frame, t_idx = inp
            tokens, lens, scores, hashes, pred_out, pred_state = carry
            pool_scores, pool_ref = [], []
            cur = (tokens, lens, scores, hashes, pred_out, pred_state)
            rounds = []
            for e in range(max_sym_per_frame + 1):
                (c_tok, c_len, c_sc, c_h, c_po, c_ps) = cur
                logp = joint_logp(frame, c_po)  # (B,K,V)
                V = logp.shape[-1]
                rounds.append(cur)
                pool_scores.append(c_sc + logp[..., self.blank])
                pool_ref.append(
                    (jnp.full((B, K), e, jnp.int32),
                     jnp.arange(K)[None, :].repeat(B, 0)))
                if e == max_sym_per_frame:
                    break
                tok_logp = logp.at[..., self.blank].set(NEG)
                tok_logp = jnp.where((c_len >= U)[..., None], NEG,
                                     tok_logp)
                flat = (c_sc[..., None] + tok_logp).reshape(B, K * V)
                top_v, top_i = jax.lax.top_k(flat, K)
                src = (top_i // V).astype(jnp.int32)  # (B,K)
                tok = (top_i % V).astype(jnp.int32)
                n_tok = jnp.take_along_axis(c_tok, src[..., None],
                                            axis=1)
                n_len = jnp.take_along_axis(c_len, src, axis=1)
                n_tok = jnp.where(
                    (jnp.arange(U)[None, None, :] ==
                     n_len[..., None]), tok[..., None], n_tok)
                n_h = (jnp.take_along_axis(c_h, src, axis=1) * MUL +
                       tok.astype(jnp.uint32) + 1)
                idx_flat = (base + src).reshape(-1)  # (B*K,)
                g_state = gather_state(c_ps, idx_flat)
                n_po, n_ps = self.predictor.forward_step(
                    tok.reshape(-1, 1), padding, g_state)
                cur = (n_tok, n_len + 1, top_v, n_h, n_po, n_ps)

            P = len(pool_scores)
            p_sc = jnp.concatenate(pool_scores, axis=1)  # (B, P*K)
            p_round = jnp.concatenate([r for r, _ in pool_ref], axis=1)
            p_slot = jnp.concatenate([s for _, s in pool_ref], axis=1)
            p_h = jnp.concatenate(
                [rounds[e][3] for e in range(P)], axis=1)
            # merge equal prefixes: logsumexp over equal hashes, keep
            # the first occurrence only
            eq = p_h[:, :, None] == p_h[:, None, :]
            merged = jax.nn.logsumexp(
                jnp.where(eq, p_sc[:, None, :], NEG), axis=-1)
            N = p_h.shape[1]
            first = jnp.min(
                jnp.where(eq, jnp.arange(N)[None, None, :], N),
                axis=-1) == jnp.arange(N)[None, :]
            final = jnp.where(first, merged, NEG)
            top_v, top_i = jax.lax.top_k(final, K)  # (B,K)
            sel_round = jnp.take_along_axis(p_round, top_i, axis=1)
            sel_slot = jnp.take_along_axis(p_slot, top_i, axis=1)

            def pick(field_idx):
                stacked = jnp.stack(
                    [rounds[e][field_idx] for e in range(P)], axis=1)
                # stacked (B, P, K, ...): select [b, round, slot]
                br = jnp.arange(B)[:, None]
                return stacked[br, sel_round, sel_slot]

            n_tokens = pick(0)
            n_lens = pick(1)
            n_hash = pick(3)
            # states are (B*K, ...) per round: gather leafwise
            sel_flat = (base + sel_slot).reshape(-1)

            def pick_state(field_idx):
                trees = [rounds[e][field_idx] for e in range(P)]
                def leaf(*xs):
                    ax = _state_axis(xs[0])
                    xs = [jnp.moveaxis(x, ax, 0) for x in xs]
                    stacked = jnp.stack(
                        [x.reshape((B, K) + x.shape[1:]) for x in xs],
                        axis=1)  # (B, P, K, ...)
                    br = jnp.arange(B)[:, None]
                    out = stacked[br, sel_round, sel_slot]
                    out = out.reshape((B * K,) + out.shape[2:])
                    return jnp.moveaxis(out, 0, ax)
                return jax.tree_util.tree_map(leaf, trees[0],
                                              *trees[1:])

            n_po = pick_state(4)
            n_ps = pick_state(5)

            active = (t_idx < encoder_out_lens)  # (B,)

            def keep(new, old):
                def leaf(n, o):
                    if n.shape[0] == B:
                        a = active.reshape((B,) + (1,) * (n.ndim - 1))
                    else:
                        ax = _state_axis(n)
                        af = active.repeat(K)  # (B*K,)
                        shape = [1] * n.ndim
                        shape[ax] = B * K
                        a = af.reshape(shape)
                    return jnp.where(a, n, o)
                return jax.tree_util.tree_map(leaf, new, old)

            out = (keep(n_tokens, tokens), keep(n_lens, lens),
                   keep(top_v, scores), keep(n_hash, hashes),
                   keep(n_po, pred_out), keep(n_ps, pred_state))
            return out, None

        init = (tokens0, lens0, scores0, hash0, pred_out0, pred_state0)
        frames = jnp.moveaxis(encoder_out, 0, 1)  # (T, B, E)
        (tokens, lens, scores, _, _, _), _ = jax.lax.scan(
            frame_step, init, (frames, jnp.arange(T)))
        order = jnp.argsort(-scores, axis=1)
        tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
        lens = jnp.take_along_axis(lens, order, axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        return tokens, lens, scores
