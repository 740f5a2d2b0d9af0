"""Iterator datapipes: composable generator stages.

TPU-native rebuild of ref wenet/dataset/datapipes.py:34-470 (torch
IterDataPipes).  Plain-python generators + a thread prefetcher — no
torch dependency; sharding partitions by (host, worker) like the
reference's rank/worker sharding (datapipes.py:279-303).
"""

import io
import json
import logging
import queue
import random
import tarfile
import threading
from typing import Callable, Iterable, Iterator, List, Optional

logger = logging.getLogger(__name__)


class DataPipe:
    """Lazily re-iterable pipeline stage."""

    def __init__(self, source: Iterable):
        self.source = source

    def __iter__(self):
        return iter(self.source)

    # -- combinators ---------------------------------------------------
    def map(self, fn: Callable, *args, **kwargs) -> 'DataPipe':
        return _Gen(lambda: (fn(x, *args, **kwargs) for x in self))

    def map_ignore_error(self, fn: Callable, *args,
                         log_error: bool = True, **kwargs) -> 'DataPipe':
        """ref: datapipes.py:34-60."""

        def gen():
            for x in self:
                try:
                    yield fn(x, *args, **kwargs)
                except Exception as ex:  # noqa: BLE001
                    if log_error:
                        logger.warning('skip sample: %s', ex)

        return _Gen(gen)

    def filter(self, fn: Callable, *args, **kwargs) -> 'DataPipe':
        return _Gen(lambda: (x for x in self if fn(x, *args, **kwargs)))

    def shuffle(self, buffer_size: int = 10000,
                seed: Optional[int] = None) -> 'DataPipe':

        def gen():
            rng = random.Random(seed)
            buf: List = []
            for x in self:
                buf.append(x)
                if len(buf) >= buffer_size:
                    rng.shuffle(buf)
                    while len(buf) > buffer_size // 2:
                        yield buf.pop()
            rng.shuffle(buf)
            yield from buf

        return _Gen(gen)

    def sort(self, buffer_size: int = 500,
             key_func: Optional[Callable] = None) -> 'DataPipe':
        """ref: datapipes.py:151-182."""

        def gen():
            buf: List = []
            for x in self:
                buf.append(x)
                if len(buf) >= buffer_size:
                    buf.sort(key=key_func)
                    yield from buf
                    buf = []
            buf.sort(key=key_func)
            yield from buf

        return _Gen(gen)

    def batch(self, batch_size: int, drop_last: bool = False,
              wrapper: Optional[Callable] = None) -> 'DataPipe':

        def gen():
            buf: List = []
            for x in self:
                buf.append(x)
                if len(buf) == batch_size:
                    yield wrapper(buf) if wrapper else buf
                    buf = []
            if buf and not drop_last:
                yield wrapper(buf) if wrapper else buf

        return _Gen(gen)

    def dynamic_batch(self, window_class: Callable,
                      wrapper: Optional[Callable] = None) -> 'DataPipe':
        """ref: datapipes.py:185-212 (window decides batch boundaries)."""

        def gen():
            buf: List = []
            for x in self:
                if window_class(x, len(buf)) and buf:
                    yield wrapper(buf) if wrapper else buf
                    buf = [x]
                else:
                    buf.append(x)
            if buf:
                yield wrapper(buf) if wrapper else buf

        return _Gen(gen)

    def bucket_by_sequence_length(self, elem_length_fn: Callable,
                                  bucket_boundaries: List[int],
                                  bucket_batch_sizes: List[int]
                                  ) -> 'DataPipe':
        """ref: datapipes.py:63-100: per-bucket accumulation."""
        assert len(bucket_batch_sizes) == len(bucket_boundaries) + 1

        def bucket_id(L):
            for i, b in enumerate(bucket_boundaries):
                if L <= b:
                    return i
            return len(bucket_boundaries)

        def gen():
            buckets: List[List] = [[] for _ in bucket_batch_sizes]
            for x in self:
                i = bucket_id(elem_length_fn(x))
                buckets[i].append(x)
                if len(buckets[i]) >= bucket_batch_sizes[i]:
                    yield buckets[i]
                    buckets[i] = []
            for b in buckets:
                if b:
                    yield b

        return _Gen(gen)

    def prefetch(self, buffer_size: int = 2) -> 'DataPipe':
        """Thread-backed prefetcher. ref: datapipes.py:215-256."""
        outer = self

        def gen():
            q: queue.Queue = queue.Queue(maxsize=max(buffer_size, 1))
            DONE = object()
            err: List = []
            stop = threading.Event()

            def worker():
                try:
                    for x in outer:
                        # bounded put so an abandoned consumer (e.g.
                        # the wenet_join epoch break) can't pin this
                        # thread — and the whole upstream shuffle/sort
                        # buffers — forever
                        while not stop.is_set():
                            try:
                                q.put(x, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
                except Exception as e:  # noqa: BLE001
                    err.append(e)
                finally:
                    # DONE must be DELIVERED (a dropped sentinel hangs
                    # the consumer at end of stream) — same bounded
                    # put as items so an abandoned consumer still
                    # releases us via the stop flag
                    while not stop.is_set():
                        try:
                            q.put(DONE, timeout=0.5)
                            break
                        except queue.Full:
                            continue

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            try:
                while True:
                    x = q.get()
                    if x is DONE:
                        break
                    yield x
                if err:
                    raise err[0]
            finally:
                # consumer done or abandoned: release the worker
                stop.set()
                while True:
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break

        return _Gen(gen)

    def repeat(self, count: int = -1) -> 'DataPipe':

        def gen():
            n = 0
            while count < 0 or n < count:
                yield from self
                n += 1

        return _Gen(gen)

    def shard(self, num_shards: int, shard_id: int,
              partition: bool = True) -> 'DataPipe':
        """Round-robin element sharding; CV (partition=False) replicates.

        ref: datapipes.py:279-303."""
        if not partition or num_shards <= 1:
            return self

        def gen():
            for i, x in enumerate(self):
                if i % num_shards == shard_id:
                    yield x

        return _Gen(gen)


class _Gen(DataPipe):

    def __init__(self, gen_fn: Callable[[], Iterator]):
        self.gen_fn = gen_fn

    def __iter__(self):
        return self.gen_fn()


def text_line_source(data_list_files: List[str]) -> DataPipe:
    """ref: datapipes.py:347-363."""

    def gen():
        for path in data_list_files:
            with open(path, encoding='utf8') as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield {'file_name': path, 'line': line}

    return _Gen(gen)


def parse_json_line(sample: dict) -> dict:
    """ref: processor.py:66-71."""
    obj = json.loads(sample['line'])
    obj.setdefault('file_name', sample.get('file_name'))
    return obj


def _open_shard_stream(url: str):
    """Local path, file://, http(s):// (stdlib urllib), or any other
    scheme via a `wget -q -O -` pipe (HDFS/OSS/S3 gateways, matching
    ref wenet/dataset/processor.py:73-93 parse_url).  Returns
    (stream, process-or-None)."""
    from urllib.parse import urlparse
    pr = urlparse(url)
    if pr.scheme in ('', 'file'):
        return open(pr.path if pr.scheme == 'file' else url, 'rb'), None
    if pr.scheme in ('http', 'https'):
        import urllib.request
        # timeout so one hung server can't stall the input pipeline
        # (and every host at the wenet_join barrier) forever
        return urllib.request.urlopen(url, timeout=120), None
    import subprocess
    proc = subprocess.Popen(['wget', '-q', '-T', '120', '-O', '-', url],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)
    return proc.stdout, proc


def tar_source(shard_list: Iterable[dict]) -> DataPipe:
    """UIO tar-shard reader: open each shard (local path or URL line),
    stream-decode the tar and group members by key prefix.
    ref: datapipes.py:365-427."""

    def gen():
        for sample in shard_list:
            url = sample['line'] if isinstance(sample, dict) else sample
            proc = None
            try:
                stream, proc = _open_shard_stream(url)
            except Exception as ex:  # noqa: BLE001
                logger.warning('failed to open shard %s: %s', url, ex)
                continue
            try:
                # streaming mode ('r|*'): works over non-seekable
                # sources (http/pipe) and reads local files
                # sequentially, which is all the loop below needs
                with tarfile.open(fileobj=stream, mode='r|*') as tar:
                    prev_prefix = None
                    example = {}
                    valid = True
                    for member in tar:
                        name = member.name
                        pos = name.rfind('.')
                        if pos <= 0:
                            continue
                        prefix, postfix = name[:pos], name[pos + 1:]
                        if prev_prefix is not None and \
                                prefix != prev_prefix:
                            example['key'] = prev_prefix
                            if valid:
                                yield example
                            example = {}
                            valid = True
                        try:
                            fobj = tar.extractfile(member)
                            data = fobj.read() if fobj else b''
                            if postfix == 'txt':
                                example['txt'] = \
                                    data.decode('utf8').strip()
                            elif postfix in ('wav', 'flac', 'mp3'):
                                example['wav_bytes'] = data
                                example['wav_format'] = postfix
                            else:
                                example[postfix] = data
                        except Exception as ex:  # noqa: BLE001
                            # one corrupt member invalidates only this
                            # sample, not the rest of the shard
                            # (ref datapipes.py:404-415)
                            valid = False
                            logger.warning('bad tar member %s in %s: %s',
                                           name, url, ex)
                        prev_prefix = prefix
                    if prev_prefix is not None:
                        example['key'] = prev_prefix
                        if valid:
                            yield example
            except Exception as ex:  # noqa: BLE001
                logger.warning('error reading shard %s: %s', url, ex)
            finally:
                stream.close()
                if proc is not None:
                    # stream IS proc.stdout and was just closed —
                    # communicate() would raise 'read of closed file';
                    # just reap the child
                    proc.wait()

    return _Gen(gen)
