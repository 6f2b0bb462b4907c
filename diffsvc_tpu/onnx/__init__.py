"""Real ONNX artifact emission + in-repo validation runtime.

Closes the one "partial" in the component inventory: the reference ships
split ``.onnx`` graphs for the community VST/inference ecosystem
(reference onnx_export.py + modules/diff/diffusion_V2.py:252-352,
torch.onnx opset 16).  This package produces the same four artifacts
(``{proj}_encoder.onnx``, ``{proj}_denoise.onnx``, ``{proj}_pred.onnx``,
``{proj}_after.onnx``) straight from the JAX models:

- ``proto``    — protobuf bindings for a hand-transcribed, wire-compatible
                 subset of the public ONNX schema (no ``onnx`` pip package
                 in this environment).
- ``builder``  — low-level GraphProto/ModelProto assembly.
- ``convert``  — jaxpr -> ONNX graph converter (constant folding, scan
                 unrolling, call inlining, dynamic time axes).
- ``runtime``  — numpy evaluator for the emitted op subset, used to
                 validate artifacts numerically in-environment (onnxruntime
                 is not installable here; external consumers use the real
                 thing).
- ``svc_export`` — the four reference-layout artifact builders.
"""

from . import proto  # noqa: F401
from .convert import export_onnx  # noqa: F401
from .runtime import OnnxRunner  # noqa: F401
