"""Checkpoint weight averaging. ref: wenet/bin/average_model.py:29-110."""

import argparse
import glob
import os

import jax
import numpy as np
import yaml


def get_args():
    parser = argparse.ArgumentParser(description='average model')
    parser.add_argument('--dst_model', required=True)
    parser.add_argument('--src_path', required=True,
                        help='src model dir containing epoch_*/step_*')
    parser.add_argument('--val_best', action='store_true')
    parser.add_argument('--num', default=5, type=int)
    parser.add_argument('--min_epoch', default=0, type=int)
    parser.add_argument('--max_epoch', default=65536, type=int)
    return parser.parse_args()


def list_checkpoints(src_path, val_best, num, min_epoch, max_epoch):
    cands = []
    for d in glob.glob(os.path.join(src_path, '*')):
        name = os.path.basename(d)
        # the 'final' symlink aliases the last epoch dir — including
        # it would average those weights twice (ref average_model.py
        # excludes final*/avg*)
        if name.startswith('final') or name.startswith('avg'):
            continue
        info = os.path.join(d, 'infos.yaml')
        if not os.path.isdir(d) or not os.path.exists(info):
            continue
        with open(info) as f:
            meta = yaml.safe_load(f) or {}
        epoch = meta.get('epoch', -1)
        if not (min_epoch <= epoch <= max_epoch):
            continue
        cands.append((meta.get('cv_loss', float('inf')), epoch, d))
    if val_best:
        cands.sort(key=lambda x: x[0])
    else:
        cands.sort(key=lambda x: -x[1])
    return [c[2] for c in cands[:num]]


def average(paths):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    acc = None
    for p in paths:
        tree = ckptr.restore(os.path.abspath(p))
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else np.asarray(x), tree)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x)
                if np.issubdtype(a.dtype, np.floating) else a, acc, tree)
    n = len(paths)
    return jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32)
        if np.issubdtype(a.dtype, np.floating) else a, acc)


def main():
    args = get_args()
    paths = list_checkpoints(args.src_path, args.val_best, args.num,
                             args.min_epoch, args.max_epoch)
    assert paths, 'no checkpoints found'
    print('averaging:', paths)
    avg = average(paths)
    from wenet_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(avg, args.dst_model,
                    {'averaged_from': [os.path.basename(p)
                                       for p in paths]})


if __name__ == '__main__':
    main()
