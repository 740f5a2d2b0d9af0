"""gRPC bi-di streaming ASR service, wire-compatible with the reference.

ref: runtime/core/grpc/{grpc_server.cc, wenet.proto}.  The service stub
is registered with a generic handler (no grpc_python_plugin in the
image); messages come from the protoc-generated wenet_pb2.
"""

import logging
from concurrent import futures
from typing import Iterator

import numpy as np

from wenet_tpu.runtime.asr_decoder import AsrDecoder, DecodeState
from wenet_tpu.runtime.grpc import wenet_pb2

logger = logging.getLogger(__name__)


def _result_to_nbest(results, n):
    out = []
    for r in results[:n]:
        ob = wenet_pb2.Response.OneBest(sentence=r.sentence)
        for w in r.word_pieces:
            ob.wordpieces.append(
                wenet_pb2.Response.OnePiece(word=w.word, start=w.start,
                                            end=w.end))
        out.append(ob)
    return out


class AsrServicer:
    """Implements wenet.ASR/Recognize. ref: grpc_server.cc."""

    def __init__(self, decoder_factory):
        self.decoder_factory = decoder_factory

    def Recognize(self, request_iterator: Iterator, context):
        decoder = None
        nbest = 1
        continuous = False
        finalized = False
        for req in request_iterator:
            if req.WhichOneof('RequestPayload') == 'decode_config':
                nbest = max(req.decode_config.nbest_config, 1)
                continuous = req.decode_config.continuous_decoding_config
                decoder = self.decoder_factory()
                yield wenet_pb2.Response(
                    status=wenet_pb2.Response.ok,
                    type=wenet_pb2.Response.server_ready)
                continue
            assert decoder is not None, 'decode_config must come first'
            pcm = np.frombuffer(req.audio_data, '<i2')
            decoder.accept_waveform(pcm)
            state = decoder.decode()
            if state == DecodeState.END_POINT:
                decoder.rescoring()
                yield wenet_pb2.Response(
                    status=wenet_pb2.Response.ok,
                    type=wenet_pb2.Response.final_result,
                    nbest=_result_to_nbest(decoder.result, nbest))
                if continuous:
                    decoder.reset_continuous_decoding()
                else:
                    # non-continuous endpoint already finalized this
                    # utterance — don't rescore/emit a second final in
                    # the tail block below
                    finalized = True
                    break
            elif decoder.result:
                yield wenet_pb2.Response(
                    status=wenet_pb2.Response.ok,
                    type=wenet_pb2.Response.partial_result,
                    nbest=_result_to_nbest(decoder.result, nbest))
        if decoder is not None and not finalized:
            decoder.set_input_finished()
            decoder.decode()
            decoder.rescoring()
            yield wenet_pb2.Response(
                status=wenet_pb2.Response.ok,
                type=wenet_pb2.Response.final_result,
                nbest=_result_to_nbest(decoder.result, nbest))
        yield wenet_pb2.Response(status=wenet_pb2.Response.ok,
                                 type=wenet_pb2.Response.speech_end)


def make_server(decoder_factory, port: int, workers: int = 4):
    import grpc
    servicer = AsrServicer(decoder_factory)
    rpc_method_handlers = {
        'Recognize': grpc.stream_stream_rpc_method_handler(
            servicer.Recognize,
            request_deserializer=wenet_pb2.Request.FromString,
            response_serializer=wenet_pb2.Response.SerializeToString,
        ),
    }
    handler = grpc.method_handlers_generic_handler(
        'wenet.ASR', rpc_method_handlers)
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=workers))
    server.add_generic_rpc_handlers((handler,))
    server.add_insecure_port(f'[::]:{port}')
    return server


def recognize_stream(channel, pcm_chunks, nbest: int = 1,
                     continuous: bool = False):
    """Minimal client helper over a grpc channel."""
    import grpc
    stub = channel.stream_stream(
        '/wenet.ASR/Recognize',
        request_serializer=wenet_pb2.Request.SerializeToString,
        response_deserializer=wenet_pb2.Response.FromString)

    def gen():
        yield wenet_pb2.Request(
            decode_config=wenet_pb2.Request.DecodeConfig(
                nbest_config=nbest,
                continuous_decoding_config=continuous))
        for chunk in pcm_chunks:
            yield wenet_pb2.Request(audio_data=chunk)

    return list(stub(gen()))
