"""HTTP ASR server: POST a wav, get the transcript JSON.

Analog of ref runtime/core/http/{http_server.cc, http_server_main.cc}
(one-shot request/response decoding, same result payload shape as the
websocket protocol's final_result).  Stdlib http.server — no extra deps.
"""

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger(__name__)


def make_handler(decoder_factory):
    local = threading.local()

    class Handler(BaseHTTPRequestHandler):

        def _decoder(self):
            if getattr(local, 'decoder', None) is None:
                local.decoder = decoder_factory()
            return local.decoder

        def do_POST(self):
            length = int(self.headers.get('Content-Length', 0))
            body = self.rfile.read(length)
            from wenet_tpu.dataset.audio import read_wav
            try:
                pcm, rate = read_wav(bytes(body))
                pcm = pcm[0]  # (C, S) -> first channel
            except Exception:  # raw 16k s16le fallback
                pcm = np.frombuffer(body, '<i2').astype(np.float32) \
                    / 32768.0
                rate = 16000
            dec = self._decoder()
            dec.reset()
            dec.accept_waveform(pcm)
            dec.set_input_finished()
            dec.decode()
            dec.rescoring()
            nbest = [{'sentence': r.sentence, 'score': r.score}
                     for r in dec.result]
            payload = json.dumps({'status': 'ok',
                                  'type': 'final_result',
                                  'nbest': nbest}, ensure_ascii=False)
            data = payload.encode('utf-8')
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *fmt_args):
            logger.info(fmt, *fmt_args)

    return Handler


def make_server(decoder_factory, port: int):
    return ThreadingHTTPServer(('', port), make_handler(decoder_factory))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--model_dir', required=True)
    p.add_argument('--port', type=int, default=10088)
    p.add_argument('--chunk_size', type=int, default=16)
    p.add_argument('--beam_size', type=int, default=10)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from wenet_tpu.utils.common import enable_compile_cache
    enable_compile_cache()
    from wenet_tpu.bin.decoder_main import build_decoder
    import types
    dargs = types.SimpleNamespace(
        model_dir=args.model_dir, chunk_size=args.chunk_size,
        num_left_chunks=-1, beam_size=args.beam_size,
        reverse_weight=0.0, lm_path='', lm_weight=0.5, fst_path='',
        dict_path='', no_lowercase=False)
    # load the model ONCE; per-connection factories construct only the
    # cheap AsrDecoder sharing the device-resident variables (the grpc/
    # websocket servers use the same split — reloading the checkpoint
    # per POST costs seconds)
    proto = build_decoder(dargs)

    def factory():
        from wenet_tpu.runtime.asr_decoder import AsrDecoder
        return AsrDecoder(proto.model, proto.variables, proto.tokenizer,
                          proto.opts, proto.feature_pipeline.config,
                          post_processor=proto.post_processor)

    server = make_server(factory, args.port)
    logger.info('http server listening on :%d', args.port)
    server.serve_forever()


if __name__ == '__main__':
    main()
