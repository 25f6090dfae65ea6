"""Generated protobuf modules for ffn_tpu.

Sources: the .proto files in this directory (authored from the schema of the
reference's generated pb2 modules; the reference does not ship .proto files).
Regenerate with:

  protoc --python_out=. ffn_tpu/proto/*.proto  (from the repo root)
"""

from ffn_tpu.proto import vector_pb2
from ffn_tpu.proto import bounding_box_pb2
from ffn_tpu.proto import inference_pb2
from ffn_tpu.proto import consensus_pb2
from ffn_tpu.proto import resegmentation_pb2

__all__ = [
    "vector_pb2",
    "bounding_box_pb2",
    "inference_pb2",
    "consensus_pb2",
    "resegmentation_pb2",
]
