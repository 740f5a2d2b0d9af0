#!/usr/bin/env python3
"""Multi-host training launcher over ssh.

Analog of ref tools/ssh_launcher.py (torchrun rendezvous spawner), for
the jax.distributed world: reads a hostfile (one host per line), starts
`wenet_tpu.bin.train` on every host with JAX_COORDINATOR /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set (consumed by
wenet_tpu/bin/train.py to call jax.distributed.initialize).
"""

import argparse
import shlex
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--hostfile', required=True)
    p.add_argument('--coordinator_port', type=int, default=9999)
    p.add_argument('--workdir', default='.')
    p.add_argument('cmd', nargs=argparse.REMAINDER,
                   help='training command, e.g. python -m '
                        'wenet_tpu.bin.train --config ...')
    args = p.parse_args()
    with open(args.hostfile, encoding='utf-8') as f:
        hosts = [line.strip() for line in f if line.strip()]
    assert hosts, 'empty hostfile'
    coord = f'{hosts[0]}:{args.coordinator_port}'
    cmd = ' '.join(shlex.quote(c) for c in args.cmd)
    procs = []
    for rank, host in enumerate(hosts):
        env = (f'JAX_COORDINATOR={coord} '
               f'JAX_NUM_PROCESSES={len(hosts)} '
               f'JAX_PROCESS_ID={rank}')
        remote = f'cd {shlex.quote(args.workdir)} && {env} {cmd}'
        procs.append(subprocess.Popen(['ssh', host, remote]))
    rc = 0
    for prc in procs:
        rc |= prc.wait()
    sys.exit(rc)


if __name__ == '__main__':
    main()
