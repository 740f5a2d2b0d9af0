"""CTC post-processing + forced alignment. ref: wenet/utils/ctc_utils.py.

Forced alignment is a jittable viterbi over the blank-interleaved label
lattice (the reference delegates to torchaudio.functional.forced_align,
ctc_utils.py:106-119).
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


def remove_duplicates_and_blank(hyp: List[int],
                                blank_id: int = 0) -> List[int]:
    """ref: ctc_utils.py:23-33."""
    out: List[int] = []
    prev = None
    for t in hyp:
        if t != prev and t != blank_id:
            out.append(int(t))
        prev = t
    return out


def replace_duplicates_with_blank(hyp: List[int],
                                  blank_id: int = 0) -> List[int]:
    """ref: ctc_utils.py:36-48."""
    out: List[int] = []
    cur = 0
    while cur < len(hyp):
        out.append(int(hyp[cur]))
        prev = cur
        cur += 1
        while cur < len(hyp) and hyp[cur] == hyp[prev] \
                and hyp[cur] != blank_id:
            out.append(blank_id)
            cur += 1
    return out


def gen_ctc_peak_time(hyp: List[int], blank_id: int = 0) -> List[int]:
    """ref: ctc_utils.py:51-60."""
    times: List[int] = []
    prev = None
    for i, t in enumerate(hyp):
        if t != prev and t != blank_id:
            times.append(i)
        prev = t
    return times


def gen_timestamps_from_peak(
    peaks: List[int],
    max_duration: float,
    frame_rate: float = 0.04,
    max_token_duration: float = 1.0,
) -> List[Tuple[float, float]]:
    """ref: ctc_utils.py:63-93."""
    times = []
    half_max = max_token_duration / 2
    for i in range(len(peaks)):
        if i == 0:
            start = max(0, peaks[0] * frame_rate - half_max)
        else:
            start = max((peaks[i - 1] + peaks[i]) / 2 * frame_rate,
                        peaks[i] * frame_rate - half_max)
        if i == len(peaks) - 1:
            end = min(max_duration, peaks[-1] * frame_rate + half_max)
        else:
            end = min((peaks[i] + peaks[i + 1]) / 2 * frame_rate,
                      peaks[i] * frame_rate + half_max)
        times.append((start, end))
    return times


def insert_blank(label: np.ndarray, blank_id: int = 0) -> np.ndarray:
    """blank-interleave: [a, b] -> [blank, a, blank, b, blank].

    ref: ctc_utils.py:96-103."""
    label = np.asarray(label).reshape(-1, 1)
    blanks = np.full((label.shape[0], 1), blank_id, np.int64)
    lattice = np.concatenate([blanks, label], axis=1).reshape(-1)
    return np.append(lattice, blank_id)


@jax.jit
def _viterbi_align(logp: jax.Array, lattice: jax.Array,
                   T: jax.Array, S: jax.Array):
    """Viterbi over the 2L+1 blank-interleaved lattice.

    logp: (Tmax, V) log-probs; lattice: (Smax,) interleaved labels;
    T / S: actual frame / lattice lengths.  Returns per-frame state ids
    (Tmax,) of the best path (valid for t < T)."""
    Tmax = logp.shape[0]
    Smax = lattice.shape[0]
    can_skip = jnp.concatenate([
        jnp.zeros((2,), bool),
        (lattice[2:] != lattice[:-2]) & (lattice[2:] != lattice[0])
    ]) & (lattice != lattice[0])

    emit = logp[:, lattice]  # (Tmax, Smax)
    alpha0 = jnp.full((Smax,), NEG_INF).at[0].set(emit[0, 0]).at[1].set(
        jnp.where(S > 1, emit[0, 1], NEG_INF))

    def step(alpha, inp):
        e, valid = inp
        stay = alpha
        diag = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        skip = jnp.where(can_skip,
                         jnp.concatenate([jnp.full((2,), NEG_INF),
                                          alpha[:-2]]), NEG_INF)
        best = jnp.maximum(jnp.maximum(stay, diag), skip)
        bp = jnp.where(best == stay, 0, jnp.where(best == diag, 1, 2))
        new_alpha = jnp.where(valid, best + e, alpha)
        return new_alpha, bp

    valid = jnp.arange(1, Tmax) < T
    alpha, bps = jax.lax.scan(step, alpha0, (emit[1:], valid))
    # end state: argmax of (S-1, S-2)
    last_t = T - 1
    endscore_last = jnp.where(jnp.arange(Smax) == S - 1, alpha, NEG_INF)
    endscore_prev = jnp.where(jnp.arange(Smax) == S - 2, alpha, NEG_INF)
    end_state = jnp.where(
        jnp.max(endscore_last) >= jnp.max(endscore_prev), S - 1, S - 2)

    def back(state, t):
        # t runs Tmax-2 .. 0 ; bps[t] moves t+1 -> t
        bp = bps[t, state]
        prev = jnp.where(t + 1 > last_t, state, state - bp)
        return prev, prev

    init = end_state
    ts = jnp.arange(Tmax - 2, -1, -1)
    _, states_rev = jax.lax.scan(back, init, ts)
    states = jnp.concatenate(
        [states_rev[::-1], jnp.asarray([end_state])])
    return states


def force_align(ctc_probs, y, blank_id: int = 0) -> List[int]:
    """CTC forced alignment -> frame-level token ids (incl. blanks).

    ref: ctc_utils.py:106-119 (torchaudio backend)."""
    logp = jnp.asarray(ctc_probs)
    y = np.asarray(y)
    lattice = insert_blank(y, blank_id)
    states = _viterbi_align(logp, jnp.asarray(lattice),
                            jnp.asarray(logp.shape[0]),
                            jnp.asarray(len(lattice)))
    states = np.asarray(states)
    return [int(lattice[s]) for s in states]


def get_blank_id(configs, symbol_table):
    """ref: ctc_utils.py:122-136."""
    if 'ctc_conf' not in configs:
        configs['ctc_conf'] = {}
    if '<blank>' in symbol_table:
        if 'ctc_blank_id' in configs['ctc_conf']:
            assert (configs['ctc_conf']['ctc_blank_id'] ==
                    symbol_table['<blank>'])
        else:
            configs['ctc_conf']['ctc_blank_id'] = symbol_table['<blank>']
    else:
        assert 'ctc_blank_id' in configs['ctc_conf'], \
            "PLZ set ctc_blank_id in yaml"
    return configs, configs['ctc_conf']['ctc_blank_id']
