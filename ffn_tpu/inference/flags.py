"""absl flags -> InferenceRequest/InferenceOptions protos.

Parity with the reference's ffn/inference/inference_flags.py:24-43.
"""

from __future__ import annotations

from absl import flags
from google.protobuf import text_format

from ffn_tpu.proto import inference_pb2

flags.DEFINE_string(
    "inference_request", None,
    "InferenceRequest as a text proto, or @<path> to read it from a file.")
flags.DEFINE_string(
    "inference_options", None,
    "InferenceOptions as a text proto, or @<path>.")

FLAGS = flags.FLAGS


def _load(value: str) -> str:
    if value.startswith("@"):
        with open(value[1:]) as f:
            return f.read()
    return value


def request_from_flags() -> inference_pb2.InferenceRequest:
    request = inference_pb2.InferenceRequest()
    if FLAGS.inference_request:
        text_format.Parse(_load(FLAGS.inference_request), request)
    return request


def options_from_flags() -> inference_pb2.InferenceOptions:
    options = inference_pb2.InferenceOptions()
    if FLAGS.inference_options:
        text_format.Parse(_load(FLAGS.inference_options), options)
    return options
