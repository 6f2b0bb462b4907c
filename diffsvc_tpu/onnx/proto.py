"""Protobuf bindings for the ONNX wire format.

``onnx.proto`` here is a hand-transcribed subset of the public ONNX schema
(original field numbers, so files are byte-compatible with real ONNX
consumers); ``onnx_pb2.py`` is its protoc output, checked in so importing
does not require protoc.  Schema compatibility is proven by
tests/test_onnx_export.py, which parses a torch.onnx-produced file with
these bindings.
"""

from .onnx_pb2 import (  # noqa: F401
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    OperatorSetIdProto,
    StringStringEntryProto,
    TensorProto,
    TensorShapeProto,
    TypeProto,
    ValueInfoProto,
)

# TensorProto.DataType values (ONNX spec).
FLOAT = 1
UINT8 = 2
INT8 = 3
INT16 = 5
INT32 = 6
INT64 = 7
BOOL = 9
FLOAT16 = 10
DOUBLE = 11
UINT32 = 12
UINT64 = 13
BFLOAT16 = 16
