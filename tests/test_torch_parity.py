"""Checkpoint conversion invariants.

Layer/loss/decode golden parity against the REAL reference package lives
in tests/test_reference_parity.py (it builds the actual
/root/reference wenet torch models).  This module keeps the pure
round-trip invariant of our torch<->flax state-dict mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np

IDIM, D, H, FF, K_CNN = 80, 32, 2, 64, 7


def test_torch_export_roundtrip():
    """flax -> torch state dict -> flax must be the identity (the
    migration path back to the reference's runtimes)."""
    from wenet_tpu.utils.checkpoint import (convert_to_torch_state_dict,
                                            convert_torch_state_dict)
    from wenet_tpu.utils.init_model import init_model, init_variables
    configs = {
        'input_dim': IDIM, 'output_dim': 11,
        'encoder': 'conformer',
        'encoder_conf': {'output_size': D, 'attention_heads': H,
                         'linear_units': FF, 'num_blocks': 2,
                         'cnn_module_kernel': K_CNN,
                         'cnn_module_norm': 'batch_norm'},
        'decoder': 'bitransformer',
        'decoder_conf': {'attention_heads': H, 'linear_units': FF,
                         'num_blocks': 1, 'r_num_blocks': 1},
        'model_conf': {'ctc_weight': 0.3},
    }
    model, configs = init_model(None, configs)
    rng = np.random.RandomState(7)
    variables, _ = init_variables(model, configs)
    # randomize so transposition bugs can't hide behind zeros
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    variables = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.randn(*l.shape), l.dtype)
                  if hasattr(l, 'shape') and l.ndim > 0 else l
                  for l in leaves])
    sd = convert_to_torch_state_dict(variables)
    assert len(sd) > 50, f'suspiciously small export: {len(sd)}'
    restored = convert_torch_state_dict(sd, variables, strict=True)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_leaves(restored)
    for (kp, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-6, err_msg=str(kp))
