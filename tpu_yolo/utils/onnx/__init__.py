"""First-party ONNX export (no `onnx` pip package required).

The reference ships a checked opset-12 ONNX artifact
(reference utils/util.py:47-73). This package reproduces that
interchange capability from a JAX-native direction: the inference
jaxpr is converted node-by-node to an ONNX graph (export.py) and
serialized with a minimal protobuf wire-format writer (wire.py).
Because the build environment has neither `onnx` nor `onnxruntime`,
validation is also first-party: parse.py re-reads the emitted bytes
and interp.py executes the parsed graph in numpy, so tests check
file-bytes -> parse -> execute against the JAX forward numerically
(tests/test_onnx_export.py). On a machine with onnxruntime, the same
file loads directly.
"""
from tpu_yolo.utils.onnx.export import export_onnx  # noqa: F401
